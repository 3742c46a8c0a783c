from odometry_tpu.camera.pinhole import (
    Pinhole,
    level_intrinsics,
    intrinsic_pyramid,
    backproject,
    project,
    warp_points,
)

__all__ = [
    "Pinhole",
    "level_intrinsics",
    "intrinsic_pyramid",
    "backproject",
    "project",
    "warp_points",
]
