"""Typed experiment configuration.

Mirrors the reference's flat ~40-key Hydra YAML schema
(reference: occdepth/config/semantic_kitti/*.yaml, occdepth/scripts/train.py:33-62)
as a frozen dataclass so configs are hashable and can parameterise jitted
functions as static arguments.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class FlospDepthConfig:
    """Per-dataset OAD depth-branch constants.

    Reference: occdepth/models/flosp_depth/flosp_depth_conf_kitti.py:1-13 and
    flosp_depth_conf_nyu.py:1-13 (LID depth bins + voxel bounds).
    """

    x_bound: Tuple[float, float, float]
    y_bound: Tuple[float, float, float]
    z_bound: Tuple[float, float, float]
    d_bound: Tuple[float, float, float]
    final_dim: Tuple[int, int]
    downsample_factor: int = 8
    mid_channels: int = 128
    disc_mode: str = "LID"
    agg_voxel_mode: str = "mean"

    @property
    def depth_channels(self) -> int:
        return int((self.d_bound[1] - self.d_bound[0]) / self.d_bound[2])


FLOSP_DEPTH_KITTI = FlospDepthConfig(
    x_bound=(0.0, 51.2, 0.2),
    y_bound=(-25.6, 25.6, 0.2),
    z_bound=(-2.0, 4.4, 0.2),
    d_bound=(2.0, 54.0, 0.5),
    final_dim=(370, 1220),
)

FLOSP_DEPTH_NYU = FlospDepthConfig(
    x_bound=(0.0, 4.8, 0.08),
    y_bound=(-2.4, 2.4, 0.08),
    z_bound=(0.0, 2.88, 0.08),
    d_bound=(0.0, 10.0, 0.08),
    final_dim=(480, 640),
)


@dataclasses.dataclass(frozen=True)
class OccDepthConfig:
    """Flat experiment config mirroring the reference YAML schema."""

    # dataset
    dataset: str = "kitti"  # "kitti" | "NYU" | "tartanair"
    n_relations: int = 4
    enable_log: bool = True
    data_root: str = ""
    data_preprocess_root: str = ""
    data_stereo_depth_root: str = ""
    data_lidar_depth_root: str = ""
    logdir: str = "logdir"

    # training
    max_epochs: int = 30
    # Lightning Trainer(log_every_n_steps=10) (scripts/train.py:184,200);
    # =1 gives the per-step loss trajectory the resume-determinism check
    # compares bitwise
    log_every_n_steps: int = 10
    gradient_clip_val: float = 35.0
    use_stereo_depth_gt: bool = False
    use_lidar_depth_gt: bool = False
    use_depth_gt: bool = False
    depth_loss_weight: float = 1.0
    deterministic: bool = False
    use_strong_img_aug: bool = False
    sem_step_decay_loss: bool = False
    share_2d_backbone_gradient: bool = True
    fp_loss: bool = True
    frustum_size: int = 8
    batch_size_per_gpu: int = 1
    n_gpus: int = 1  # kept for schema parity; on TPU = number of data shards
    num_workers_per_gpu: int = 0
    # Lightning Trainer(accumulate_grad_batches=...): average grads over K
    # microbatches before one optimizer step (the reference exposes the
    # knob through Lightning; configs ship with 1)
    accumulate_grad_batches: int = 1
    # TPU multi-slice data parallelism: >1 builds a ("dcn", "data") hybrid
    # mesh — in-slice gradient reductions ride ICI, the cross-slice hop
    # rides DCN (no reference equivalent; NCCL DDP is single-tier)
    n_slices: int = 1
    exp_prefix: str = "exp"
    run: int = 1
    lr: float = 2e-4
    weight_decay: float = 1e-4

    # losses
    context_prior: bool = True
    relation_loss: bool = True
    CE_ssc_loss: bool = True
    sem_scal_loss: bool = True
    geo_scal_loss: bool = True

    # projection
    project_1_2: bool = True
    project_1_4: bool = True
    project_1_8: bool = True
    pattern_id: int = 0

    ckpt: str = ""

    # multi-view
    multi_view_mode: bool = True

    # network
    full_scene_size: Tuple[int, int, int] = (256, 256, 32)
    project_scale: int = 2
    feature: int = 32
    feature_2d_oc: int = 32
    n_classes: int = 20
    backbone_2d_name: str = "tf_efficientnet_b3_ns"
    return_up_feats: int = 1
    cascade_cls: bool = True
    occluded_cls: bool = False

    # 2d->3d transformation
    trans_2d_to_3d: str = "flosp_depth"  # "flosp" | "flosp_depth"

    # TPU-specific knobs (no reference counterpart)
    compute_dtype: str = "bfloat16"  # dtype for conv/matmul compute
    param_dtype: str = "float32"
    # Pallas kernels for CRP matmul + stereo fusion; measured ~8 ms slower
    # than XLA's fused lowering for these shapes on v5e, so off by default
    # (kept as a tested capability / for other shapes).
    use_pallas: bool = False
    # Per-(batch,view)-map unrolled gathers in SFA / flosp_depth: fastest
    # on a single chip (below the XLA TPU gather size cliff) but slices the
    # batch dim, which under a data-sharded mesh makes GSPMD emit hundreds
    # of collective-permutes.  Multi-device paths (trainer, dryrun, DP
    # tests) set False -> batch-dim-preserving take_along_axis gathers.
    unroll_gathers: bool = True
    # 2D-decoder 3x3 conv path: "auto" (shifted-matmul/Pallas on TPU,
    # XLA conv elsewhere — see ops/conv2d_shift.py), or force one of
    # "xla" | "shift" | "pallas".
    decoder_conv_impl: str = "auto"
    # Encoder depthwise-conv filter-gradient path: "pallas" forces the
    # fused one-pass Pallas VJP for stride-1 odd-kernel blocks (halves the
    # isolated dw-grad cost but measured SLOWER end-to-end: 221 vs 197
    # ms/step — the pallas_call boundaries cost more fusion freedom than
    # the kernel saves; ops/dw_conv.py, docs/DESIGN.md round 4).  "xla"
    # keeps the default VJP; "auto" currently resolves to "xla" everywhere
    # per that measurement.
    dw_conv_grad: str = "xla"
    # Full-grid layout-pin experiment (ops/layout_pin.py): "off" | "xminor"
    # | "cminor" pin the 3D decoder's three stage seams; "xminor-all" |
    # "cminor-all" additionally pin the head-chain interiors (granular-pin
    # experiment).  TPU-only modes used by scripts/bench_layout_pin.py to
    # test whether pinning full-grid layouts fixes the batched-eval layout
    # pathology at the root (VERDICT r3 #1a / r4 #7).
    layout_pin: str = "off"
    # Bench-only experiment (bench_train --view-vmap): vmap the 2D backbone
    # over views in training instead of sequential per-view calls.  Changes
    # the batch_stats pytree (leading view axis) — not checkpoint-
    # compatible.  Selects models/experimental.py::OccDepthViewVmap in
    # training/step.create_model; rejected (272 vs 197 ms/step, round 4).
    view_vmap: bool = False
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axis_names: Tuple[str, ...] = ("data",)
    remat_backbone: bool = False  # jax.checkpoint the per-view 2D backbone
    # jax.checkpoint the SSC/occluded heads in training: the head chain
    # stores ~10 full-scene-grid activations for its backward (~67 MB
    # each at the flagship KITTI grid); remat recomputes them instead —
    # a traffic-for-FLOPs trade on a ~93% HBM-bound step (measured in
    # docs/DESIGN.md round 5).  Exact same math and parameter pytree.
    remat_heads: bool = False
    # jax.checkpoint the LOSS assembly in training: the losses materialize
    # fp32 softmax/log-softmax/one-hot grids ((B,X,Y,Z,C) at fp32) and
    # fp-loss chunk masks that XLA stores for the backward; remat
    # recomputes them from the bf16 logits instead.  Gradient-exact
    # (identical math re-run); measured in docs/DESIGN.md round 5.
    remat_loss: bool = False
    # Perf-attribution knob (bench_knockout only): scales whose SFA lift
    # reads a stop_gradient'd copy of the 2D feature map — isolates the
    # in-context cost of the gather backwards (table scatter-adds + the
    # per-scale resize-conv backward coupling) without changing the forward.
    sfa_bwd_stop_scales: Tuple[int, ...] = ()
    # Scheduling-tuning knob: wrap the 2D-backbone outputs and the lifted
    # 3D volume in lax.optimization_barrier (differentiable identity that
    # stops cross-stage fusion/reordering).  Equivalent graphs swing
    # +-40 ms from XLA scheduling alone (docs/DESIGN.md); this pins the
    # stage boundaries so the scheduler works stage-local.
    stage_barriers: bool = False
    # Single-device batch>=2 eval: unroll the 3D decoder (and, via
    # eval_apply, the whole forward) per sample to dodge XLA's batched
    # full-grid layout pathology (docs/DESIGN.md finding #7).  Off = the
    # single batched code path (for layout experiments / future compilers).
    eval_unroll: bool = True

    # Overrides for reduced-size test/debug scenes (None = dataset defaults)
    scene_size_m: Optional[Tuple[float, float, float]] = None
    voxel_size_m: Optional[float] = None
    img_shape_hw: Optional[Tuple[int, int]] = None
    flosp_depth_override: Optional[FlospDepthConfig] = None

    # ------------------------------------------------------------------
    @property
    def project_res(self) -> Tuple[int, ...]:
        """2D scales projected by FLoSP (reference: scripts/train.py:124-131)."""
        res = [1]
        if self.project_1_2:
            res.append(2)
        if self.project_1_4:
            res.append(4)
        if self.project_1_8:
            res.append(8)
        return tuple(res)

    @property
    def output_scale(self) -> int:
        """Scale of the SSC output grid (reference: kitti_dataset.py:80)."""
        return -(-self.project_scale // 2)  # ceil(project_scale / 2)

    @property
    def with_depth_gt(self) -> bool:
        return self.use_stereo_depth_gt or self.use_lidar_depth_gt or self.use_depth_gt

    @property
    def n_views(self) -> int:
        """Number of camera views fed to the 2D backbone (kitti and
        tartanair are stereo; NYU is single RGB-D)."""
        if self.dataset == "NYU":
            return 1
        return 2 if self.multi_view_mode else 1

    @property
    def n_lift_views(self) -> int:
        """Views entering SFA lifting (NYU adds a virtual right view)."""
        if self.dataset == "NYU" and self.use_depth_gt:
            return 2
        return self.n_views

    @property
    def flosp_depth_conf(self) -> FlospDepthConfig:
        if self.flosp_depth_override is not None:
            return self.flosp_depth_override
        return FLOSP_DEPTH_NYU if self.dataset == "NYU" else FLOSP_DEPTH_KITTI

    @property
    def scene_size_meters(self) -> Tuple[float, float, float]:
        if self.scene_size_m is not None:
            return self.scene_size_m
        if self.dataset == "NYU":
            return (4.8, 4.8, 2.88)
        if self.dataset == "tartanair":
            return (12.0, 4.8, 12.0)
        return (51.2, 51.2, 6.4)

    @property
    def voxel_size_meters(self) -> float:
        if self.voxel_size_m is not None:
            return self.voxel_size_m
        if self.dataset == "NYU":
            return 0.08
        if self.dataset == "tartanair":
            return 0.1
        return 0.2

    @property
    def img_shape(self) -> Tuple[int, int]:
        """(H, W) of the network input image."""
        if self.img_shape_hw is not None:
            return self.img_shape_hw
        if self.dataset == "NYU":
            return (480, 640)
        if self.dataset == "tartanair":
            return (480, 640)
        return (370, 1220)

    def scene_dims(self, scale: int = 1) -> Tuple[int, int, int]:
        s = self.full_scene_size
        return (s[0] // scale, s[1] // scale, s[2] // scale)


def _coerce(value: Any, field_type: Any) -> Any:
    """Coerce a YAML value to the dataclass field's type.

    YAML 1.1 parses dot-less scientific notation ('2e-4') as a *string*,
    so numeric fields must be coerced explicitly or they reach optax/jax
    as strings (found by driving train.py with the shipped configs).
    """
    # `from __future__ import annotations` makes field.type a string
    if field_type in (float, "float"):
        return float(value)
    if field_type in (int, "int"):
        return int(value)
    if field_type in (bool, "bool") and isinstance(value, str):
        return value.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(value, list):
        return tuple(value)
    return value


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> OccDepthConfig:
    """Load a YAML config file plus CLI-style overrides into OccDepthConfig.

    Equivalent role to the reference's hydra `@main(config_name=$DATA_CONFIG)`
    (occdepth/scripts/train.py:33-36), without the env-var indirection.
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    fields = {f.name: f for f in dataclasses.fields(OccDepthConfig)}
    if overrides:
        # CLI overrides are typed by a human mid-command: a typo'd key
        # must error (hydra rejects unknown overrides too), unlike file
        # keys below, which stay tolerant for schema evolution
        unknown = sorted(set(overrides) - set(fields))
        if unknown:
            raise ValueError(
                f"unknown config override key(s): {', '.join(unknown)}"
            )
        raw.update(overrides)
    kwargs = {}
    for key, value in raw.items():
        if key not in fields:
            continue  # tolerate unknown file keys, like hydra's flat schema
        kwargs[key] = _coerce(value, fields[key].type)
    return OccDepthConfig(**kwargs)


def parse_overrides(args) -> Dict[str, Any]:
    """Parse `key=value` CLI overrides (hydra-style, scripts/train.py CLI)."""
    out: Dict[str, Any] = {}
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"override must be key=value, got {arg!r}")
        key, value = arg.split("=", 1)
        out[key] = yaml.safe_load(value)
    return out


def default_config_path(name: str) -> str:
    """Resolve a shipped config by name, e.g. 'semantic_kitti/base'."""
    root = os.path.join(os.path.dirname(__file__), "configs")
    return os.path.join(root, name + ".yaml")
