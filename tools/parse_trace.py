"""Parse a captured /tmp/jax_trace xplane into a top-HLO-op table.

Uses xprof's hlo_stats converter (gviz JSON). Run tools/trace_step.py first,
then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/parse_trace.py
(the wheel's generated protos predate protobuf 4).
"""
import glob, gzip, json, sys

xplanes = glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True)
assert xplanes, "no xplane captured"
from xprof.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
if isinstance(data, bytes):
    try:
        data = gzip.decompress(data).decode()
    except OSError:
        data = data.decode()
tab = json.loads(data)
cols = [c["id"] for c in tab["cols"]]
rows = [dict(zip(cols, [c["v"] if c else None for c in r["c"]])) for r in tab["rows"]]
rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
total = sum(r.get("total_self_time") or 0 for r in rows)
print(f"total device self time: {total/1e3:.3f} ms")
print(f"{'self_ms':>9} {'pct':>6} {'#':>6}  [category] op")
agg = {}
for r in rows:
    cat = r.get("category") or "?"
    agg[cat] = agg.get(cat, 0) + (r.get("total_self_time") or 0)
for cat, t in sorted(agg.items(), key=lambda kv: -kv[1]):
    print(f"  BY-CAT {t/1e3:9.3f} ms {100*t/max(total,1e-9):5.1f}%  {cat}")
for r in rows[:38]:
    t = (r["total_self_time"]) / 1e3
    n = r.get("occurrences", "?")
    name = (r.get("hlo_op_expression") or r.get("hlo_op_name") or "")[:120]
    print(f"{t:9.3f} {100*t*1e3/max(total,1e-9):6.1f} {n:>6}  [{r.get('category')}] {name}")
