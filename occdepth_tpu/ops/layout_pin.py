"""Explicit XLA layout pinning for full-grid 3D tensors (experiment knob).

docs/DESIGN.md finding #7: single-device eval at batch >= 2 flips XLA's
layout assignment on the (B, X, Y, Z, C~16..32) full-grid tensors into
multi-GB lane-padded copies around the 3D decoder's transpose-conv and head
stages (the batch-1 step gets compact spatial-on-lanes layouts).  The
shipped workaround unrolls eval per sample (cfg.eval_unroll).

`jax.experimental.layout.with_layout_constraint` lets us pin intermediate
layouts INSIDE jit instead — if pinning the stage boundaries to the known-
good batch-1 layout fixes batched eval at the root, the unroll scar tissue
collapses to one code path (VERDICT r3 next-#1a).  Modes:

  * "off"     — no constraint (shipping default),
  * "xminor"  — major_to_minor (B, Y, Z, C, X): the batch-1 train step's
                measured assignment (X on the 128-lane axis, C on
                sublanes — scripts/profile_copies.py),
  * "cminor"  — major_to_minor (B, X, Y, Z, C): the naive row-major
                channels-minor layout (C on lanes, 4-8x tile padding at
                C=16..32 — the hypothesized pathology, pinned to test it).

Layout constraints are a TPU-compiler feature; on CPU test backends the
constraint primitive may be unsupported, so modes other than "off" are for
TPU benches (scripts/bench_layout_pin.py) and are never default.
"""
from __future__ import annotations

import jax.numpy as jnp

_MODES = ("off", "xminor", "cminor", "xminor-all", "cminor-all")


def base_mode(mode: str) -> str:
    """'xminor-all' -> 'xminor' (the '-all' suffix selects WHERE pins go —
    interior head/ASPP tensors too, not just the three stage seams — the
    granular-pin experiment of VERDICT r4 next-#7)."""
    if mode in (None, "off"):
        return "off"
    if mode not in _MODES:
        raise ValueError(f"layout_pin mode {mode!r} not in {_MODES}")
    return mode.split("-", 1)[0]


def granular(mode: str) -> bool:
    """True when interior (head-chain) pins are requested ('-all' modes)."""
    return bool(mode) and mode.endswith("-all")


def pin_grid(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Pin a (B, X, Y, Z, C) tensor's layout; identity when mode='off'."""
    if mode in (None, "off") or x.ndim != 5:
        return x
    from jax.experimental.layout import Layout, with_layout_constraint

    m = base_mode(mode)
    if m == "xminor":
        m2m = (0, 2, 3, 4, 1)
    elif m == "cminor":
        m2m = (0, 1, 2, 3, 4)
    else:
        raise ValueError(f"layout_pin mode {mode!r} not in {_MODES}")
    return with_layout_constraint(x, Layout(major_to_minor=m2m))
