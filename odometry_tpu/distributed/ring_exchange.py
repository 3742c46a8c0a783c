"""Pallas remote-DMA ring exchange of keyframe blocks (SURVEY §2, optional).

The collectives-based distribution layer (sweep.py / ba_dist.py) covers the
production paths; this module provides the ICI-native alternative the survey
sketched: each device holds a shard of keyframe state (poses, point blocks),
and a **ring all-gather written as a Pallas kernel** moves neighbor shards
chip-to-chip with ``pltpu.make_async_remote_copy``, riding each ICI link
directly instead of bouncing through XLA's generic all-gather.

The communication buffer uses one slot per ring step (num_devices slots)
rather than the usual double buffer: with two alternating slots, a fast
device can start overwriting its right neighbor's slot for step k+1 while
the neighbor has not yet finished SENDING from that same slot at step k —
nothing in the send/recv semaphore pairs synchronizes a sender with its
*receiver's* progress (measured: the double-buffered version corrupts
~1 in 3 runs under the interpret machinery's random interleavings). With a
slot per step every remote write targets a location that is written exactly
once and read only after its own recv semaphore, so no write-after-read
hazard exists at the cost of (num_devices x chunk) VMEM — fine for keyframe
blocks. (A production double-buffer would add a reverse "slot free"
semaphore signal from receiver to sender.)

On CPU (tests, the driver's virtual mesh) the kernel runs under the Pallas
TPU **interpret machinery** (`pltpu.InterpretParams`), which simulates the
inter-device semaphores + remote copies faithfully — so the schedule's
correctness is CI-tested without a pod.

Shapes: per-device block (chunk, D). TPU tiling wants chunk % 8 == 0 and
D % 128 == 0; the public wrapper pads and unpads automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odometry_tpu.utils.platform import on_tpu


def _ring_kernel(local_ref, out_ref, comm_ref, send_sem, recv_sem, *, axis,
                 chunk, num):
    me = jax.lax.axis_index(axis)
    # Own shard lands at its global slot; comm slot 0 seeds the ring.
    out_ref[pl.ds(me * chunk, chunk), :] = local_ref[...]
    comm_ref[0] = local_ref[...]
    dst = jax.lax.rem(me + 1, num)

    for step in range(num - 1):  # num is static; unrolled
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[step],
            dst_ref=comm_ref.at[step + 1],
            send_sem=send_sem.at[step],
            recv_sem=recv_sem.at[step],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        # After step+1 hops the chunk that arrives originated step+1 back.
        src_dev = jax.lax.rem(me - step - 1 + num, num)
        out_ref[pl.ds(src_dev * chunk, chunk), :] = comm_ref[step + 1]


def _ring_all_gather_padded(x, *, axis, num_devices, collective_id):
    chunk, D = x.shape
    kernel = functools.partial(_ring_kernel, axis=axis, chunk=chunk,
                               num=num_devices)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_devices * chunk, D), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((num_devices, chunk, D), x.dtype),
            pltpu.SemaphoreType.DMA((num_devices,)),
            pltpu.SemaphoreType.DMA((num_devices,)),
        ],
        interpret=None if on_tpu() else pltpu.InterpretParams(),
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
    )(x)


def ring_all_gather(
    x: jax.Array,
    mesh: Mesh,
    axis: str = "map",
    *,
    collective_id: int = 7,
) -> jax.Array:
    """All-gather `x` (sharded on its leading dim over `axis`) via the ring.

    x: (num_devices * chunk, ...) global array (or anything shardable as
    P(axis, None...)). Returns the fully-replicated gather, identical to
    ``jax.lax.all_gather(..., tiled=True)`` — verified against it in
    tests/test_ring_exchange.py.
    """
    num = mesh.shape[axis]
    lead = x.shape[0]
    if lead % num != 0:
        raise ValueError(f"leading dim {lead} not divisible by mesh axis {num}")
    chunk = lead // num
    inner = x.shape[1:]
    D = int(np.prod(inner, dtype=np.int64)) if inner else 1
    # Pad to TPU tile quanta (sublane 8 x lane 128 for f32).
    chunk_p = -(-chunk // 8) * 8
    D_p = -(-D // 128) * 128

    def local(xs):
        xs2 = xs.reshape(chunk, D)
        xs2 = jnp.pad(xs2, ((0, chunk_p - chunk), (0, D_p - D)))
        out = _ring_all_gather_padded(
            xs2, axis=axis, num_devices=num, collective_id=collective_id
        )
        out = out.reshape(num, chunk_p, D_p)[:, :chunk, :D]
        return out.reshape((num * chunk,) + inner)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),), out_specs=P(None),
        check_vma=False,
    )
    return f(x)


def gather_keyframe_poses(pose_shards: jax.Array, mesh: Mesh, axis: str = "map"):
    """Every device's keyframe pose block, replicated everywhere — the
    neighbor-exchange primitive a sharded pose graph / BA window consumes.

    pose_shards: (K_total, 4, 4) sharded over `axis` on the keyframe dim.
    """
    return ring_all_gather(pose_shards, mesh, axis)
