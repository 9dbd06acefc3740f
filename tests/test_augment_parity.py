"""Strong-aug semantic parity audit vs the reference's torchvision pipeline.

The reference augments with torchvision (kitti_dataset.py:101-121,374-407):
ColorJitter(0.4,0.4,0.4) on the PIL uint8 image, then (normalized, p=0.3
each) GaussianBlur(3, sigma~U[0.1,2]) and RandomGrayscale(p=0.1) +
RandomErasing(scale=(0.01,0.02), ratio=(0.3,3), value=0).  torchvision is
not installed here, so these tests check `data/augment.py` against
independent re-derivations of the torchvision/PIL semantics (formulas from
PIL.ImageEnhance and torchvision.transforms.functional), and pin the
documented divergences (PARITY.md "Augmentation"): our jitter runs in
float on [0,1] arrays while the reference's PIL path rounds to uint8 after
every enhance op (<= ~4/255 accumulated), and PIL's L weights are
0.299/0.587/0.114 (we match PIL; tensor-mode torchvision uses 0.2989).
"""
from __future__ import annotations

import numpy as np
import pytest

from occdepth_tpu.data.augment import (
    color_jitter,
    gaussian_blur,
    strong_img_aug,
)


def _pil_L(img_u8: np.ndarray) -> np.ndarray:
    """PIL convert('L'): round((299 R + 587 G + 114 B) / 1000) on uint8."""
    f = img_u8.astype(np.float64)
    return np.floor(
        (19595 * f[..., 0] + 38470 * f[..., 1] + 7471 * f[..., 2] + 0x8000)
        / 65536.0
    )


def _pil_blend(degenerate: np.ndarray, img: np.ndarray, f: float) -> np.ndarray:
    """Image.blend(degenerate, img, f) = degenerate + f*(img-degenerate),
    rounded to uint8."""
    out = degenerate + f * (img.astype(np.float64) - degenerate)
    return np.clip(np.round(out), 0, 255)


def _pil_color_jitter(img_u8: np.ndarray, ops) -> np.ndarray:
    """PIL ImageEnhance semantics for the given (kind, factor) sequence,
    with uint8 rounding after each op — what torchvision ColorJitter does
    to the PIL image in the reference's __getitem__."""
    out = img_u8.astype(np.float64)
    for kind, f in ops:
        if kind == "b":  # ImageEnhance.Brightness: blend with black
            out = _pil_blend(np.zeros_like(out), out, f)
        elif kind == "c":  # Contrast: blend with int-rounded mean of L
            mean = np.floor(_pil_L(out).mean() + 0.5)
            out = _pil_blend(np.full_like(out, mean), out, f)
        else:  # Color (saturation): blend with L expanded to RGB
            gray = _pil_L(out)[..., None] * np.ones((1, 1, 3))
            out = _pil_blend(gray, out, f)
    return out


def _replay_jitter_draws(seed: int):
    """Replicate color_jitter's internal RNG consumption to recover the
    (kind, factor) op sequence it will apply for a given RandomState."""
    rng = np.random.RandomState(seed)
    ops = [
        ("b", rng.uniform(0.6, 1.4)),
        ("c", rng.uniform(0.6, 1.4)),
        ("s", rng.uniform(0.6, 1.4)),
    ]
    rng.shuffle(ops)
    return ops


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 17])
def test_color_jitter_matches_pil_semantics_within_rounding(rng, seed):
    """Same factors + order: our float jitter vs the PIL uint8 pipeline
    agree to the accumulated uint8 rounding bound (~4/255)."""
    img_u8 = rng.randint(0, 256, size=(40, 56, 3)).astype(np.uint8)
    ops = _replay_jitter_draws(seed)
    ours = color_jitter(
        img_u8.astype(np.float32) / 255.0, np.random.RandomState(seed)
    )
    theirs = _pil_color_jitter(img_u8, ops) / 255.0
    # Per-op rounding is <=0.5/255, amplified by later factors <=1.4 and
    # the contrast mean rounding (<=0.5/255 on the blend base).
    assert np.abs(ours - theirs).max() <= 4.5 / 255.0


def test_color_jitter_factor_distribution():
    """Factors are U[max(0,1-f), 1+f] in a uniformly random op order —
    torchvision ColorJitter.get_params' law for (0.4,0.4,0.4)."""
    orders = set()
    firsts = []
    for seed in range(400):
        ops = _replay_jitter_draws(seed)
        orders.add("".join(k for k, _ in ops))
        for _, f in ops:
            assert 0.6 <= f <= 1.4
        firsts.append(ops[0][1])
    assert orders == {"bcs", "bsc", "cbs", "csb", "sbc", "scb"}
    # crude uniformity check on the factor law
    assert abs(np.mean(firsts) - 1.0) < 0.02


def test_gaussian_blur_matches_direct_convolution(rng):
    """Separable passes == dense 2D Gaussian conv with reflect padding
    (torchvision functional.gaussian_blur semantics, kernel_size=3)."""
    img = rng.rand(31, 47, 3).astype(np.float32)
    seed = 5
    out = gaussian_blur(img, np.random.RandomState(seed))
    s = np.random.RandomState(seed).uniform(0.1, 2.0)
    xs = np.arange(-1, 2, dtype=np.float64)
    k1 = np.exp(-0.5 * (xs / s) ** 2)
    k1 /= k1.sum()
    k2 = np.outer(k1, k1)
    pad = np.pad(img.astype(np.float64), ((1, 1), (1, 1), (0, 0)), "reflect")
    ref = np.zeros_like(img, np.float64)
    for di in range(3):
        for dj in range(3):
            ref += k2[di, dj] * pad[di:di + 31, dj:dj + 47]
    assert np.abs(out - ref).max() < 1e-5


def test_strong_aug_erasing_geometry_and_rates():
    """RandomErasing box law: area ~ U[0.01,0.02]*HW, aspect ~ logU[0.3,3],
    value 0, p=0.5; RandomGrayscale p=0.1.  Checks every erased region is
    one zero rectangle within the (rounding-slack) area/ratio bounds and
    the empirical rates match the torchvision probabilities."""
    H, W = 48, 64
    n_gray = n_erase = 0
    n_trials = 300
    for seed in range(n_trials):
        rng = np.random.RandomState(seed)
        img = (0.5 + 0.4 * np.random.RandomState(10_000 + seed).rand(H, W, 3)
               ).astype(np.float32)
        out = strong_img_aug(img, rng)
        zero = np.all(out == 0.0, axis=-1)
        if np.all(out[~zero] == img[~zero]):
            pass  # no grayscale this draw
        else:
            n_gray += 1
        if zero.any():
            n_erase += 1
            rows = np.flatnonzero(zero.any(axis=1))
            cols = np.flatnonzero(zero.any(axis=0))
            h = rows[-1] - rows[0] + 1
            w = cols[-1] - cols[0] + 1
            # contiguous rectangle, fully zero
            assert zero.sum() == h * w
            area = h * w / (H * W)
            # rounding slack: h,w are rounded sqrt values
            assert 0.005 <= area <= 0.03, area
            assert 0.2 <= h / w <= 4.5, (h, w)
    # binomial 3-sigma bands around p=0.5 (erase attempt near-surely
    # succeeds at these sizes) and p=0.1 (grayscale)
    assert abs(n_erase / n_trials - 0.5) < 0.09
    assert abs(n_gray / n_trials - 0.1) < 0.06


def test_grayscale_weights_are_pil_convention():
    """We use 0.299/0.587/0.114 (PIL); torchvision tensor-mode uses
    0.2989 for R — divergence <= 1e-4 of the red channel, documented in
    PARITY.md."""
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 0] = 1.0  # pure red
    # find a seed whose first draw triggers grayscale
    for seed in range(100):
        r = np.random.RandomState(seed)
        if r.rand() < 0.1:
            out = strong_img_aug(img, np.random.RandomState(seed))
            assert np.allclose(out[..., 0], 0.299)
            return
    pytest.fail("no grayscale-triggering seed found")
