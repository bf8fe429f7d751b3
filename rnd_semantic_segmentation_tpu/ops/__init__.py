from .resize import (
    interp_matrix,
    resize_bilinear,
    resize_nearest,
    scaled_size,
    upsample2x_bilinear,
)
from .pool import adaptive_avg_pool_1x1, avg_pool, max_pool

__all__ = [
    "interp_matrix",
    "resize_bilinear",
    "resize_nearest",
    "scaled_size",
    "upsample2x_bilinear",
    "adaptive_avg_pool_1x1",
    "avg_pool",
    "max_pool",
]
