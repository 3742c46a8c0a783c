"""Pre-snapshot gate: bench + default test suite + on-chip Pallas parity.

Round 2 and round 3 both shipped end-of-round snapshots with a red bench;
this makes "green before snapshot" one command. Run before any end-of-round
commit and paste the three outcome lines into the commit message.

  python tools/preflight.py            # all three gates
  python tools/preflight.py --quick    # bench only
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, timeout):
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=timeout)
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-1:] or [""]
        msg = tail[0][:140]
    except subprocess.TimeoutExpired:
        ok, msg = False, f"timeout after {timeout}s"
    print(f"[preflight] {name}: {'GREEN' if ok else 'RED'} "
          f"({time.time()-t0:.0f}s) {msg}")
    return ok


def main():
    quick = "--quick" in sys.argv
    results = [run("bench", [sys.executable, "bench.py"], 1200)]
    if not quick:
        results.append(run(
            "pytest", [sys.executable, "-m", "pytest", "tests/", "-q",
                       "-x", "-p", "no:cacheprovider"], 2400))
        results.append(run(
            "tpu-parity", [sys.executable, "tools/tpu_parity.py"], 1200))
    print("[preflight] ALL GREEN" if all(results) else "[preflight] RED")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
