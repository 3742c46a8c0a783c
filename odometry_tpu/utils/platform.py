"""Platform helpers: TPU detection and Pallas interpret-mode gating."""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Pallas TPU kernels must run in interpret mode off-TPU (tests on CPU)."""
    return not on_tpu()
