from occdepth_tpu.geometry.projection import (
    PIXEL_PATTERNS,
    rigid_transform,
    vox2pix,
    voxel_centroids,
)
from occdepth_tpu.geometry.depth_bins import bin_depths
from occdepth_tpu.geometry.relations import compute_cp_mega_matrix
from occdepth_tpu.geometry.frustums_mask import (
    compute_frustum_class_dists,
    compute_local_frustums,
)
from occdepth_tpu.geometry.frustum import FrustumGridSpec, frustum_grid

__all__ = [
    "PIXEL_PATTERNS",
    "rigid_transform",
    "vox2pix",
    "voxel_centroids",
    "bin_depths",
    "compute_cp_mega_matrix",
    "compute_local_frustums",
    "compute_frustum_class_dists",
    "FrustumGridSpec",
    "frustum_grid",
]
