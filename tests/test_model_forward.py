"""End-to-end forward smoke tests on tiny configs (reference-style smoke
blocks, SURVEY.md §4: models/OccDepth.py:603-694 with data.pkl fixtures —
here the fixture is a synthetic geometric batch)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.testing import tiny_kitti_config, tiny_nyu_config


@pytest.fixture(scope="module")
def kitti_setup():
    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=1)
    model = OccDepthModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, batch, model, variables


def test_kitti_forward_shapes(kitti_setup):
    cfg, batch, model, variables = kitti_setup
    out = model.apply(variables, batch, train=False)
    X, Y, Z = cfg.full_scene_size
    assert out["ssc_logit"].shape == (1, X, Y, Z, cfg.n_classes)
    assert out["occ_logit"].shape == (1, X, Y, Z, 2)
    assert "P_logits" in out
    n8 = (X // cfg.project_scale // 4) * (Y // cfg.project_scale // 4) * (
        Z // cfg.project_scale // 4
    )
    m8 = n8 // 8
    assert out["P_logits"].shape == (1, cfg.n_relations, m8, n8)
    assert "depth_pred" in out
    assert np.isfinite(np.asarray(out["ssc_logit"])).all()
    # projection must actually see the scene
    assert batch["fov_mask"].sum() > 100


def test_kitti_train_mode_updates_batch_stats(kitti_setup):
    cfg, batch, model, variables = kitti_setup
    out, mutated = model.apply(
        variables, batch, train=True, mutable=["batch_stats"]
    )
    # at least one BN mean must move away from init zero
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_nyu_forward_shapes():
    cfg = tiny_nyu_config()
    batch = make_synthetic_batch(cfg, batch_size=2)
    model = OccDepthModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    out = model.apply(variables, batch, train=False)
    X, Y, Z = cfg.full_scene_size
    assert out["ssc_logit"].shape == (2, X, Y, Z, cfg.n_classes)
    assert out["occ_logit"].shape == (2, X, Y, Z, 2)
    assert np.isfinite(np.asarray(out["ssc_logit"])).all()


def test_eval_batch_unroll_matches_batched(monkeypatch):
    """The single-device eval-time per-sample 3D-decoder unroll
    (models/occdepth.py — works around an XLA layout pathology at
    batch >= 2) must reproduce the batched outputs exactly."""
    import jax
    import numpy as np

    from occdepth_tpu.data.batch import make_synthetic_batch
    from occdepth_tpu.models import OccDepthModel
    from occdepth_tpu.testing import tiny_kitti_config

    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=2, seed=31)
    model = OccDepthModel(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(4), batch, train=False
    )
    batched = model.apply(variables, batch, train=False)
    monkeypatch.setattr(jax, "device_count", lambda backend=None: 1)
    unrolled = model.apply(variables, batch, train=False)
    assert set(batched) == set(unrolled)
    for k in batched:
        np.testing.assert_allclose(
            np.asarray(unrolled[k]), np.asarray(batched[k]),
            atol=1e-5, rtol=1e-5, err_msg=k,
        )


def test_stage_barriers_is_identity(kitti_setup):
    """cfg.stage_barriers wraps stage boundaries in
    lax.optimization_barrier — a scheduling hint that must be a pure
    identity for both outputs and gradients (docs/DESIGN.md round-3
    composition-tax experiments)."""
    import dataclasses

    cfg, batch, model, variables = kitti_setup
    model_b = OccDepthModel(cfg=dataclasses.replace(cfg, stage_barriers=True))

    base = model.apply(variables, batch, train=False)
    barred = model_b.apply(variables, batch, train=False)
    assert set(base) == set(barred)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(barred[k]), np.asarray(base[k]),
            atol=1e-5, rtol=1e-5, err_msg=k,
        )

    def loss(m):
        def f(params):
            out = m.apply(
                {**variables, "params": params}, batch, train=True,
                mutable=["batch_stats"],
            )[0]
            return jnp.sum(out["ssc_logit"].astype(jnp.float32) ** 2)
        return f

    g0 = jax.grad(loss(model))(variables["params"])
    g1 = jax.grad(loss(model_b))(variables["params"])
    for (p0, l0), (p1, l1) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda t: str(t[0])),
    ):
        assert str(p0) == str(p1)
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l0), atol=1e-4, rtol=1e-4,
            err_msg=str(p0),
        )
