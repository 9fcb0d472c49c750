"""Golden tests for image ops against independent (torch/skimage-free) refs."""

import numpy as np
import jax.numpy as jnp
import pytest

from healthivert_tpu.ops import image as I


def _np_sobel(x):
    """Naive numpy Sobel magnitude with replicate padding (reference semantics)."""
    gx_k = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float64)
    gy_k = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=np.float64)
    xp = np.pad(x, 1, mode="edge")
    h, w = x.shape
    gx = np.zeros_like(x, dtype=np.float64)
    gy = np.zeros_like(x, dtype=np.float64)
    for i in range(h):
        for j in range(w):
            win = xp[i : i + 3, j : j + 3]
            # torch conv2d cross-correlates (no kernel flip)
            gx[i, j] = np.sum(win * gx_k)
            gy[i, j] = np.sum(win * gy_k)
    mag = np.sqrt(gx**2 + gy**2)
    return np.minimum(mag, 1.0)


def test_sobel_matches_naive(rng):
    x = rng.random((12, 16)).astype(np.float32)
    got = np.asarray(I.sobel_edges(jnp.asarray(x)[None, :, :, None]))[0, :, :, 0]
    want = _np_sobel(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dice_coeff_known_value():
    pred = jnp.zeros((1, 4, 4))
    gt = jnp.zeros((1, 4, 4))
    pred = pred.at[0, :2].set(1.0)  # 8 px
    gt = gt.at[0, 1:3].set(1.0)  # 8 px, overlap 4
    d = float(I.dice_coeff(pred, gt))
    assert abs(d - (2 * 4 + 1e-5) / (8 + 8 + 1e-5)) < 1e-6


def test_dice_iou_degenerate_empty():
    z = jnp.zeros((2, 8, 8))
    assert float(I.dice_coeff(z, z)) == pytest.approx(1.0)
    assert float(I.dice_score(z, z)) == pytest.approx(1.0)
    assert float(I.iou_score(z, z)) == pytest.approx(1.0)


def test_psnr_identical_and_known(rng):
    a = rng.random((16, 16)).astype(np.float32)
    assert float(I.psnr(jnp.asarray(a), jnp.asarray(a))) > 100
    b = a + 0.1
    want = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    assert float(I.psnr(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(want, rel=1e-4)


def _np_ssim(a, b, data_range=1.0, win=7):
    """Direct port of the SSIM formula with uniform window (skimage defaults)."""
    from numpy.lib.stride_tricks import sliding_window_view

    def f(x):
        return sliding_window_view(x, (win, win)).mean(axis=(-1, -2))

    cov_norm = win * win / (win * win - 1)
    ux, uy = f(a), f(b)
    vx = cov_norm * (f(a * a) - ux * ux)
    vy = cov_norm * (f(b * b) - uy * uy)
    vxy = cov_norm * (f(a * b) - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_ssim_matches_reference_formula(rng):
    a = rng.random((32, 32)).astype(np.float64)
    b = np.clip(a + 0.05 * rng.standard_normal((32, 32)), 0, 1)
    got = float(I.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _np_ssim(a, b)
    assert got == pytest.approx(want, abs=2e-5)
    assert float(I.ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-6)


def test_resize_nearest_matches_torch_semantics(rng):
    import torch
    import torch.nn.functional as F

    x = rng.random((2, 16, 12, 3)).astype(np.float32)
    for oh, ow in [(32, 24), (8, 6), (4, 3)]:
        got = np.asarray(I.resize_nearest(jnp.asarray(x), oh, ow))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.interpolate(xt, size=(oh, ow), mode="nearest").permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want)
