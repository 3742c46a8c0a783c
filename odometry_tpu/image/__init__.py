from odometry_tpu.image.pyramid import (
    gaussian_blur3,
    pyr_down,
    median_blur3,
    gaussian_image_pyramid,
    depth_pyramid,
    central_gradients,
    gradient_magnitude,
)
from odometry_tpu.image.sampling import (
    gather_2d,
    clip_gather_2d,
    sample_floor,
    sample_bilinear,
    remap_bilinear,
)

__all__ = [
    "gaussian_blur3",
    "pyr_down",
    "median_blur3",
    "gaussian_image_pyramid",
    "depth_pyramid",
    "central_gradients",
    "gradient_magnitude",
    "gather_2d",
    "clip_gather_2d",
    "sample_floor",
    "sample_bilinear",
    "remap_bilinear",
]
