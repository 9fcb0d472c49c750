"""External anchors for ops/image.ssim + psnr.

skimage (the library the reference's eval stack calls —
/root/reference/evaluation/generation_eval_sagittal.py:4-5, train.py:122-126)
is not installed in this image, so round 1/2 could only match our kernels "to
skimage's documented algorithm by construction". These tests pin them to TWO
independent re-implementations written from skimage's published algorithm:

1. a float64 numpy version built on cumsum sliding-window sums (nothing
   shared with ops/image's shift-and-add uniform filter), and
2. a torch version built on conv2d with a ones kernel (independent filter
   machinery again),

plus hard numeric golden constants so a silent simultaneous drift of all
implementations still fails loudly.
"""

import numpy as np
import pytest

from healthivert_tpu.ops import image as I


def _window_sums(x: np.ndarray, size: int) -> np.ndarray:
    """VALID sliding-window sums via 2D cumsum (float64)."""
    c = np.cumsum(np.cumsum(x, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    return (
        c[size:, size:] - c[:-size, size:] - c[size:, :-size] + c[:-size, :-size]
    )


def ssim_numpy(a, b, data_range, win_size=7):
    """skimage.metrics.structural_similarity (gaussian_weights=False
    defaults): uniform win_size window, K1=.01/K2=.03, sample covariance
    (N/(N-1)), mean over the valid region."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    nw = win_size * win_size
    cov_norm = nw / (nw - 1.0)
    ux = _window_sums(a, win_size) / nw
    uy = _window_sums(b, win_size) / nw
    uxx = _window_sums(a * a, win_size) / nw
    uyy = _window_sums(b * b, win_size) / nw
    uxy = _window_sums(a * b, win_size) / nw
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    return float(s.mean())


def ssim_torch(a, b, data_range, win_size=7):
    import torch
    import torch.nn.functional as F

    ta = torch.from_numpy(np.asarray(a, np.float64))[None, None]
    tb = torch.from_numpy(np.asarray(b, np.float64))[None, None]
    k = torch.ones((1, 1, win_size, win_size), dtype=torch.float64) / (
        win_size * win_size
    )
    filt = lambda x: F.conv2d(x, k)  # VALID
    ux, uy = filt(ta), filt(tb)
    uxx, uyy, uxy = filt(ta * ta), filt(tb * tb), filt(ta * tb)
    nw = win_size * win_size
    cov_norm = nw / (nw - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    return float(s.mean())


def psnr_numpy(a, b, data_range):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return float(10.0 * np.log10(data_range**2 / mse))


def _fixture(h=96, w=80, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.random((h, w)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, (h, w)), 0, 1).astype(np.float32)
    return a, b


@pytest.mark.parametrize("data_range", [1.0, 2.0])
def test_ssim_matches_independent_impls(data_range):
    a, b = _fixture()
    ours = float(I.ssim(a, b, data_range=data_range))
    ref_np = ssim_numpy(a, b, data_range)
    ref_t = ssim_torch(a, b, data_range)
    assert ref_np == pytest.approx(ref_t, abs=1e-10)  # the two anchors agree
    assert ours == pytest.approx(ref_np, abs=2e-5)  # ours is f32


def test_ssim_golden_constant():
    """Hard regression anchor (float64 value of the numpy/torch anchors on
    the fixed seed-7 fixture, computed 2026-08; identical to 1e-10 between
    the two independent implementations)."""
    a, b = _fixture()
    golden = ssim_numpy(a, b, 1.0)
    assert golden == pytest.approx(GOLDEN_SSIM, abs=1e-9)
    assert float(I.ssim(a, b, data_range=1.0)) == pytest.approx(GOLDEN_SSIM, abs=2e-5)


def test_psnr_matches_independent_impl():
    a, b = _fixture()
    for dr in (1.0, 1.7):
        ours = float(I.psnr(a, b, data_range=dr))
        assert ours == pytest.approx(psnr_numpy(a, b, dr), abs=1e-4)
    golden = psnr_numpy(a, b, 1.0)
    assert golden == pytest.approx(GOLDEN_PSNR, abs=1e-6)


def test_ssim_identical_images_is_one():
    a, _ = _fixture()
    assert float(I.ssim(a, a, data_range=1.0)) == pytest.approx(1.0, abs=1e-6)


def test_psnr_ssim_batch_rows_independent_of_batch_size():
    """psnr_ssim_batch rows must be BIT-identical at any batch size (vmap
    rows are independent): evaluation/generation.py relies on this to mix
    unpadded single-slice dispatches with pow2-bucketed volume batches while
    staying exact vs the reference's per-slice formulation."""
    rng = np.random.default_rng(3)
    a = rng.random((8, 64, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    dr = np.linspace(0.5, 2.0, 8).astype(np.float32)
    p8, s8 = I.psnr_ssim_batch(a, b, dr)
    for i in range(8):
        p1, s1 = I.psnr_ssim_batch(a[i : i + 1], b[i : i + 1], dr[i : i + 1])
        assert float(p1[0]) == float(p8[i])
        assert float(s1[0]) == float(s8[i])
    # and the unbatched scalar kernels agree to f32 rounding
    for i in range(8):
        assert float(I.psnr(a[i], b[i], float(dr[i]))) == pytest.approx(float(p8[i]), abs=1e-5)
        assert float(I.ssim(a[i], b[i], float(dr[i]))) == pytest.approx(float(s8[i]), abs=1e-5)


# golden constants — float64 values of the independent implementations
GOLDEN_SSIM = 0.9646804281469996
GOLDEN_PSNR = 22.363501141916593
