"""ServingPipeline: uint8 ingestion + batching + pipelining correctness."""
import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.data.augment import normalize_rgb
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.serving import ServingPipeline
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.step import make_forward


def test_serving_pipeline_matches_direct_forward():
    cfg = tiny_kitti_config()
    from occdepth_tpu.models import OccDepthModel

    model = OccDepthModel(cfg=cfg)
    template = make_synthetic_batch(cfg, batch_size=1, with_labels=False,
                                    seed=7)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), template, train=False
    )

    H, W = cfg.img_shape
    V = 2 if cfg.multi_view_mode else 1
    rs = np.random.RandomState(5)
    n_frames = 5  # batch_size=2 -> two full batches + padded tail
    frames_u8 = [
        rs.randint(0, 256, size=(V, H, W, 3)).astype(np.uint8)
        for _ in range(n_frames)
    ]

    pipe = ServingPipeline(cfg, variables, template, batch_size=2,
                           max_in_flight=2)
    pipe.warmup()
    preds = list(pipe.run(iter(frames_u8)))
    assert len(preds) == n_frames
    assert all(p.dtype == np.uint8 for p in preds)
    assert preds[0].shape == tuple(cfg.full_scene_size)

    # reference path: host normalize_rgb (the dataset's math) + fp32 batch
    forward = make_forward(cfg)
    for i, frame in enumerate(frames_u8):
        img = np.stack([
            normalize_rgb(frame[v].astype(np.float32) / 255.0)
            for v in range(V)
        ])[None]
        batch = dict(template)
        batch["img"] = img
        out = forward(variables, batch)
        y_ref = np.asarray(jnp.argmax(out["ssc_logit"], axis=-1))[0]
        # identical math (fp32 normalize on device vs host); allow a
        # handful of argmax tie flips from op-ordering noise
        mismatch = (preds[i].astype(np.int32) != y_ref).sum()
        assert mismatch <= y_ref.size * 0.001, (i, mismatch)


def test_serving_pipeline_order_preserved():
    """Results come back in submission order even with deep pipelining."""
    cfg = tiny_kitti_config()
    from occdepth_tpu.models import OccDepthModel

    model = OccDepthModel(cfg=cfg)
    template = make_synthetic_batch(cfg, batch_size=1, with_labels=False,
                                    seed=9)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), template, train=False
    )
    H, W = cfg.img_shape
    V = 2 if cfg.multi_view_mode else 1
    rs = np.random.RandomState(6)
    frames = [rs.randint(0, 256, size=(V, H, W, 3)).astype(np.uint8)
              for _ in range(4)]
    pipe = ServingPipeline(cfg, variables, template, batch_size=1,
                           max_in_flight=3)
    out_once = list(pipe.run(frames))
    out_twice = list(pipe.run(frames))  # pipeline is reusable
    assert len(out_once) == len(out_twice) == 4
    for a, b in zip(out_once, out_twice):
        np.testing.assert_array_equal(a, b)
