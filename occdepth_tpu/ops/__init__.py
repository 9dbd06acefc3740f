from occdepth_tpu.ops.resize import resize_bilinear, resize_nearest
from occdepth_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "grid_sample_2d",
    "grid_sample_3d",
]
