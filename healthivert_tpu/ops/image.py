"""Pure-JAX image math: Sobel edge magnitude, Dice/IoU, PSNR/SSIM.

TPU-native replacements for the reference's torch/skimage ops:
- Sobel edge-enhancing module (EEM): /root/reference/models/edge_operator.py:29-49
- diceCoeff: /root/reference/models/pix2pix_model.py:13-39
- dice/iou training metrics: /root/reference/train.py:37-48
- skimage ssim/psnr used by the eval stack (generation_eval_*.py)

All functions take NHWC tensors with static shapes so they fuse under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Filter taps realized by sobel_edges' shift-and-add formulation. Host
# constants on purpose: a module-level jnp.array would initialize the JAX
# backend at import time, adding a device round-trip to every CLI start
# (and hanging outright if the TPU tunnel is down).
SOBEL_GX = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
SOBEL_GY = np.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def _edge_pad(x: jnp.ndarray) -> jnp.ndarray:
    """Replication-pad H and W by 1 (reference uses nn.ReplicationPad2d(1))."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def sobel_edges(x: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude clipped to 1, per reference Sobel module.

    x: (B, H, W, 1) in [0, 1]. Returns (B, H, W, 1).
    Matches /root/reference/models/edge_operator.py:41-49: replicate-pad,
    two fixed 3x3 filters, sqrt(gx^2+gy^2), clamp max to 1.
    """
    xp = _edge_pad(x)
    # Shift-and-add formulation of the two fixed 3x3 filters: exact f32 math
    # on the VPU, no conv dispatch for a 2-channel fixed kernel.
    tl, tc, tr = xp[:, :-2, :-2], xp[:, :-2, 1:-1], xp[:, :-2, 2:]
    ml, mr = xp[:, 1:-1, :-2], xp[:, 1:-1, 2:]
    bl, bc, br = xp[:, 2:, :-2], xp[:, 2:, 1:-1], xp[:, 2:, 2:]
    gx = (tr - tl) + 2.0 * (mr - ml) + (br - bl)
    gy = (tl + 2.0 * tc + tr) - (bl + 2.0 * bc + br)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.minimum(mag, 1.0)


def dice_coeff(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Soft Dice, batch-averaged, matching reference diceCoeff(activation='none').

    pred/gt: (B, ...). dice = (2*tp + eps) / (sum(pred) + sum(gt) + eps),
    averaged over the batch (pix2pix_model.py:30-39).
    """
    n = pred.shape[0]
    p = pred.reshape(n, -1)
    g = gt.reshape(n, -1)
    tp = jnp.sum(g * p, axis=1)
    fp = jnp.sum(p, axis=1)
    fn = jnp.sum(g, axis=1)
    return jnp.mean((2.0 * tp + eps) / (fp + fn + eps))


def dice_score(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Hard Dice over flattened binary masks (train.py:37-41)."""
    inter = jnp.sum(pred * target)
    return (2.0 * inter + eps) / (jnp.sum(pred) + jnp.sum(target) + eps)


def iou_score(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Hard IoU over flattened binary masks (train.py:43-48)."""
    inter = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target) - inter
    return (inter + eps) / (union + eps)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak SNR, matching skimage.metrics.peak_signal_noise_ratio."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10((data_range * data_range) / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter with a size x size window, VALID, on (H, W) arrays.

    Separable shift-and-add (exact f32 adds, no conv dispatch).
    """
    h, w = x.shape
    y = sum(x[d : h - size + 1 + d, :] for d in range(size))
    y = sum(y[:, d : w - size + 1 + d] for d in range(size))
    return y / (size * size)


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
) -> jnp.ndarray:
    """Structural similarity of two 2D images (H, W).

    Matches skimage.metrics.structural_similarity defaults: uniform 7x7
    window, K1=0.01, K2=0.03, sample covariance normalization (N/(N-1)),
    mean over the valid (cropped) region — the function the reference eval
    stack calls (evaluation/generation_eval_sagittal.py, train.py:122-126).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    k1, k2 = 0.01, 0.03
    nw = win_size * win_size
    cov_norm = nw / (nw - 1.0)

    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2.0 * ux * uy + c1) * (2.0 * vxy + c2)
    den = (ux * ux + uy * uy + c1) * (vx + vy + c2)
    return jnp.mean(num / den)


@functools.partial(jax.jit, static_argnames=("win_size", "with_ssim"))
def psnr_ssim_batch(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: jnp.ndarray,
    win_size: int = 7,
    with_ssim: bool = True,
) -> tuple:
    """Per-slice PSNR and SSIM over a stack of 2D images in ONE dispatch.

    a, b: (N, H, W); data_range: (N,). Returns ((N,) psnr, (N,) ssim), the
    SSIM half None when with_ssim=False (images smaller than the window).
    vmaps the scalar kernels above, so each row's math is identical to the
    single-image functions; exists because per-slice dispatch+fetch costs
    dominate the generation-quality eval on the tunneled TPU backend
    (~0.5-1 s RTT each; reference calls skimage per slice,
    evaluation/generation_eval_sagittal.py:70-94).
    """
    p = jax.vmap(psnr)(a, b, data_range)
    if not with_ssim:
        return p, None
    s = jax.vmap(lambda x, y, d: ssim(x, y, d, win_size=win_size))(a, b, data_range)
    return p, s


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize on NHWC, matching torch F.interpolate(nearest):
    src = floor(dst * in/out).

    Integer up-factors use broadcast+reshape (pixel repetition) and integer
    down-factors use strided slicing — both exactly match the floor rule and
    avoid gather relayouts on large feature maps. Non-integer ratios fall
    back to gathers.
    """
    b, h, w, c = x.shape
    if out_h % h == 0 and out_w % w == 0:
        rh, rw = out_h // h, out_w // w
        if (rh, rw) == (1, 1):
            return x
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, rh, w, rw, c))
        return y.reshape(b, out_h, out_w, c)
    if h % out_h == 0 and w % out_w == 0:
        return x[:, :: h // out_h, :: w // out_w, :]
    ih = (jnp.arange(out_h) * h // out_h).astype(jnp.int32)
    iw = (jnp.arange(out_w) * w // out_w).astype(jnp.int32)
    return x[:, ih][:, :, iw]
