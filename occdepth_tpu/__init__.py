"""occdepth_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 3D Semantic Scene Completion framework.

Re-implements the full capability surface of megvii-research/OccDepth
(camera-only 3D semantic scene completion: monocular / stereo / RGB-D input
-> dense semantic voxel grid) as an idiomatic TPU framework:

* functional flax models with static shapes (no ragged per-sample lists),
* FLoSP / Stereo-SFA lifting as fused gathers (XLA + Pallas kernels),
* OAD depth branch with a frustum->voxel trilinear resample,
* data-parallel training over a `jax.sharding.Mesh` (GSPMD handles the
  gradient all-reduce and cross-replica BatchNorm statistics),
* on-device SSC metrics, orbax checkpointing, and offline preprocessing
  CLIs with native C++ hot loops.

Reference layer map: see SURVEY.md at the repo root. File:line citations in
docstrings point into /root/reference (the PyTorch reference implementation)
so behaviour parity can be audited.
"""

__version__ = "0.1.0"
