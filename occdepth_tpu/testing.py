"""Reduced-size configs for tests, compile checks, and multi-chip dry runs."""
from __future__ import annotations

import dataclasses

from occdepth_tpu.config import FlospDepthConfig, OccDepthConfig

TINY_IMG_KITTI = (64, 96)
TINY_IMG_NYU = (64, 80)


def tiny_kitti_config(**overrides) -> OccDepthConfig:
    """KITTI stereo flosp_depth + CRP + cascade at toy sizes."""
    fd = FlospDepthConfig(
        x_bound=(0.0, 6.4, 0.2),
        y_bound=(-3.2, 3.2, 0.2),
        z_bound=(-1.6, 1.6, 0.2),
        d_bound=(2.0, 10.0, 0.5),
        final_dim=TINY_IMG_KITTI,
        mid_channels=16,
    )
    base = dict(
        dataset="kitti",
        full_scene_size=(32, 32, 16),
        project_scale=2,
        scene_size_m=(6.4, 6.4, 3.2),
        voxel_size_m=0.2,
        img_shape_hw=TINY_IMG_KITTI,
        feature=16,
        feature_2d_oc=16,
        n_classes=20,
        frustum_size=2,
        use_stereo_depth_gt=True,
        multi_view_mode=True,
        cascade_cls=True,
        context_prior=True,
        trans_2d_to_3d="flosp_depth",
        flosp_depth_override=fd,
        compute_dtype="float32",
        backbone_2d_name="tf_efficientnet_b3_ns",
    )
    base.update(overrides)
    return OccDepthConfig(**base)


def tiny_tartanair_config(**overrides) -> OccDepthConfig:
    """TartanAir stereo flosp + CRP + cascade at toy sizes."""
    base = dict(
        dataset="tartanair",
        full_scene_size=(16, 8, 16),
        project_scale=1,
        scene_size_m=(4.8, 2.4, 4.8),
        voxel_size_m=0.3,
        img_shape_hw=TINY_IMG_KITTI,
        feature=16,
        feature_2d_oc=16,
        n_classes=14,
        frustum_size=2,
        multi_view_mode=True,
        cascade_cls=True,
        context_prior=True,
        trans_2d_to_3d="flosp",
        project_1_8=False,
        compute_dtype="float32",
    )
    base.update(overrides)
    return OccDepthConfig(**base)


def tiny_nyu_config(**overrides) -> OccDepthConfig:
    """NYU RGB-D flosp (virtual stereo) + CRP + cascade at toy sizes."""
    base = dict(
        dataset="NYU",
        full_scene_size=(16, 8, 16),  # (X, Z_up, Y) like (60, 36, 60)
        project_scale=1,
        scene_size_m=(4.8, 4.8, 2.4),
        voxel_size_m=0.3,
        img_shape_hw=TINY_IMG_NYU,
        feature=16,
        feature_2d_oc=16,
        n_classes=12,
        n_relations=4,
        frustum_size=2,
        use_depth_gt=True,
        multi_view_mode=False,
        cascade_cls=True,
        context_prior=True,
        trans_2d_to_3d="flosp",
        project_1_8=False,
        compute_dtype="float32",
    )
    base.update(overrides)
    return OccDepthConfig(**base)


def make_tartanair_tree(base: str) -> None:
    """Build the 4-train/4-val synthetic TartanAir toy tree under `base`.

    Used by the resume-determinism check, convergence smokes, and the
    verify workflow (mirrors tests/test_occluded_tartanair.py's fixture);
    lives in the package so a clean checkout can run those checks.
    Writes `{base}/ta` (images + poses) and `{base}/ta_pre` (voxel pkls).
    """
    import os
    import pickle

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(42)
    X, Y, Z = 16, 8, 16
    voxel = 0.3
    root = os.path.join(base, "ta")
    pre = os.path.join(base, "ta_pre")
    pose_line = "0.5 -0.2 0.1 0 0 0 1\n"
    for seq in ("P000", "P005"):
        seq_dir = os.path.join(root, "office", "Easy", seq)
        os.makedirs(os.path.join(seq_dir, "image_left"), exist_ok=True)
        os.makedirs(os.path.join(seq_dir, "image_right"), exist_ok=True)
        with open(os.path.join(seq_dir, "pose_left.txt"), "w") as f:
            f.write(pose_line * 3)
        with open(os.path.join(seq_dir, "pose_right.txt"), "w") as f:
            f.write("0.5 0.05 0.1 0 0 0 1\n" * 3)
        vox_dir = os.path.join(
            pre, "labels", "office", "Easy", seq, "voxels_left"
        )
        os.makedirs(vox_dir, exist_ok=True)
        for frame in ("000000", "000001"):
            for side in ("left", "right"):
                img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(seq_dir, f"image_{side}",
                                 f"{frame}_{side}.png")
                )
            T = np.eye(4)
            T[:3, :3] = np.array(
                [[0, -1, 0], [0, 0, -1], [1, 0, 0]], float
            )
            T[:3, 3] = [0.0, Y * voxel / 2, -0.3]
            data = {
                "target_1_1": rng.choice(
                    [0, 1, 5, 255], size=(X, Y, Z)
                ).astype(np.uint8),
                "target_1_4": rng.choice(
                    [0, 1, 5, 255], size=(X // 4, Y // 4, Z // 4)
                ).astype(np.uint8),
                "vox_origin": np.array([-2.4, -1.2, -2.4], np.float32),
                "T_velo_2_cam": T.astype(np.float32),
            }
            with open(os.path.join(vox_dir, f"{frame}.pkl"), "wb") as f:
                pickle.dump(data, f)


def make_kitti_tree(base: str, n_frames: int = 2,
                    hw: tuple = (370, 1220)) -> None:
    """Build a synthetic full-resolution SemanticKITTI tree under `base`.

    Mirrors tests/test_data_pipeline.py's fixture at the reference's real
    shapes (370x1220 stereo pairs, 256x256x32 voxel grids; preprocessed
    labels + stereo-depth maps); sequences 00 and 08 get `n_frames` frames
    each and the remaining train-split sequences (01-07, 09, 10) are
    symlinks of 00, so one epoch is 10*n_frames train samples.  Used by
    the convergence check (scripts/check_convergence.py), bench_loader,
    and the verify workflow; lives in the package so a clean checkout can
    run them.  Writes `{base}/kitti`, `{base}/pre`, `{base}/stereo_depth`.
    """
    import os

    import numpy as np
    from PIL import Image

    from occdepth_tpu.native_ext import pack_bits

    rng = np.random.RandomState(3)
    root = os.path.join(base, "kitti")
    pre = os.path.join(base, "pre")
    depth_root = os.path.join(base, "stereo_depth")
    H, W = hw
    frames = [f"{5 * i:06d}" for i in range(n_frames)]

    for seq_name in ("00", "08"):
        seq = os.path.join(root, "dataset", "sequences", seq_name)
        for d in ("voxels", "image_2", "image_3"):
            os.makedirs(os.path.join(seq, d), exist_ok=True)
        labels = os.path.join(pre, "labels", seq_name)
        os.makedirs(labels, exist_ok=True)
        ddir = os.path.join(
            depth_root, "dataset", "sequences", seq_name, "depth"
        )
        os.makedirs(ddir, exist_ok=True)
        with open(os.path.join(seq, "calib.txt"), "w") as f:
            P2 = "7.07 0 60.18 0 0 7.07 18.31 0 0 0 1 0"
            P3 = "7.07 0 60.18 -3.8 0 7.07 18.31 0 0 0 1 0"
            Tr = "0 -1 0 0 0 0 -1 0 1 0 0 -0.27"
            f.write(f"P2: {P2}\nP3: {P3}\nTr: {Tr}\n\n")
        for frame in frames:
            open(os.path.join(seq, "voxels", f"{frame}.bin"), "wb").write(
                pack_bits(
                    (rng.rand(256 * 256 * 32) > 0.5).astype(np.uint8)
                ).tobytes()
            )
            open(
                os.path.join(seq, "voxels", f"{frame}.occluded"), "wb"
            ).write(
                pack_bits(
                    (rng.rand(256 * 256 * 32) > 0.7).astype(np.uint8)
                ).tobytes()
            )
            img = (rng.rand(H + 6, W + 20, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(seq, "image_2", f"{frame}.png"))
            Image.fromarray(img).save(
                os.path.join(seq, "image_3", f"{frame}.png"))
            t11 = rng.choice(
                [0, 1, 5, 255], size=(256, 256, 32)
            ).astype(np.uint8)
            np.save(os.path.join(labels, f"{frame}_1_1.npy"), t11)
            np.save(
                os.path.join(labels, f"{frame}_1_8.npy"), t11[::8, ::8, ::8]
            )
            depth = (rng.rand(H, W) * 256 * 30).astype(np.uint16)
            Image.fromarray(depth).save(os.path.join(ddir, f"{frame}.png"))

    # train split is sequences 00-07, 09, 10 — symlink them to 00
    for seq_name in ("01", "02", "03", "04", "05", "06", "07", "09", "10"):
        for parent in (
            os.path.join(root, "dataset", "sequences"),
            os.path.join(pre, "labels"),
            os.path.join(depth_root, "dataset", "sequences"),
        ):
            dst = os.path.join(parent, seq_name)
            if not os.path.exists(dst):
                os.symlink("00", dst)


def synthetic_state(cfg: OccDepthConfig, batch, tx):
    """TrainState with host-materialized parameters — no init compile.

    ``init_state`` jits ``model.init``, a full-model XLA compile that costs
    ~40-140 s on a 1-core host; correctness *gates* (dryrun_multichip) only
    need a state with the right pytree structure and non-degenerate values.
    ``jax.eval_shape`` traces init without compiling or executing it, and
    the leaves are then materialized on host: kernels from a deterministic
    per-leaf normal(0, 0.05), `scale`-named leaves 1, everything else 0
    (biases, BN running stats; running stats are only written, never read,
    by a train-mode step).
    """
    import jax
    import numpy as np

    from occdepth_tpu.training.step import TrainState, create_model

    model = create_model(cfg)
    shapes = jax.eval_shape(
        lambda r, b: model.init(r, b, train=False), jax.random.PRNGKey(0),
        batch,
    )

    idx = [0]

    def materialize(path, leaf):
        idx[0] += 1
        names = [getattr(p, "key", "") for p in path]
        if "scale" in names:
            arr = np.ones(leaf.shape, np.float32)
        elif any(n in ("kernel", "embedding") for n in names):
            rng = np.random.RandomState(idx[0])
            arr = 0.05 * rng.randn(*leaf.shape).astype(np.float32)
        else:
            arr = np.zeros(leaf.shape, np.float32)
        return arr.astype(leaf.dtype)

    variables = jax.tree_util.tree_map_with_path(materialize, shapes)
    params = variables["params"]
    import jax.numpy as jnp

    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
