"""Pallas remote-DMA ring all-gather vs lax.all_gather on the virtual mesh.

The interpret machinery (pltpu.InterpretParams) simulates the inter-device
semaphores and remote copies, so the double-buffered ring schedule itself is
what's under test — slot indexing, hop-origin bookkeeping, semaphore pairing.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from odometry_tpu.distributed.ring_exchange import gather_keyframe_poses, ring_all_gather


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return Mesh(np.array(devs[:8]), ("map",))


def _xla_all_gather(x, mesh, axis="map"):
    f = shard_map(
        lambda s: jax.lax.all_gather(s, axis, tiled=True),
        mesh=mesh, in_specs=(P(axis),), out_specs=P(None), check_vma=False,
    )
    return f(x)


def test_ring_matches_xla_all_gather(mesh8, rng):
    x = jnp.asarray(rng.standard_normal((8 * 4, 128)), jnp.float32)
    out = jax.jit(lambda a: ring_all_gather(a, mesh8))(x)
    ref = jax.jit(lambda a: _xla_all_gather(a, mesh8))(x)
    assert out.shape == ref.shape
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_ring_pads_irregular_shapes(mesh8, rng):
    # chunk=3 (not a multiple of 8), trailing dims (4, 4) -> D=16 (not 128).
    x = jnp.asarray(rng.standard_normal((8 * 3, 4, 4)), jnp.float32)
    out = jax.jit(lambda a: gather_keyframe_poses(a, mesh8))(x)
    assert out.shape == x.shape
    assert np.allclose(np.asarray(out), np.asarray(x))


def test_ring_rejects_indivisible(mesh8):
    with pytest.raises(ValueError):
        ring_all_gather(jnp.zeros((9, 128)), mesh8)
