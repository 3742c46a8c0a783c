from odometry_tpu.utils.platform import on_tpu, pallas_interpret

__all__ = ["on_tpu", "pallas_interpret"]
