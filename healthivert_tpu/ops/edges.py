"""Edge operators beyond Sobel: Prewitt and a differentiable Canny.

Parity with /root/reference/models/edge_operator.py:51-245. These ship with
the reference but are unused by its training path (the EEM loss uses Sobel);
they are part of the component inventory and useful for experiments.

The Canny is fully vectorized: the reference's per-sample gather loop
(edge_operator.py:199-221) becomes one take_along_axis over the 8-direction
filtered stack.
"""

from __future__ import annotations

import jax.numpy as jnp

from .image import _edge_pad


def _shift_sum(xp, weights):
    """3x3 fixed filter via shifted adds on an edge-padded NHWC tensor."""
    h, w = xp.shape[1] - 2, xp.shape[2] - 2
    out = 0.0
    for dy in range(3):
        for dx in range(3):
            c = weights[dy][dx]
            if c:
                out = out + c * xp[:, dy : dy + h, dx : dx + w, :]
    return out


def prewitt_edges(x: jnp.ndarray) -> jnp.ndarray:
    """Prewitt gradient magnitude clipped to 1 (edge_operator.py:51-70)."""
    xp = _edge_pad(x)
    gx = _shift_sum(xp, [[-1, 0, 1], [-1, 0, 1], [-1, 0, 1]])
    gy = _shift_sum(xp, [[1, 1, 1], [0, 0, 0], [-1, -1, -1]])
    return jnp.minimum(jnp.sqrt(gx * gx + gy * gy), 1.0)


def _gaussian_kernel(size=5, std=1.0):
    x = jnp.arange(size) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / std) ** 2)
    return k / k.sum()


# 8 directional neighbor offsets (dy, dx) in orientation order 0,45,...,315,
# matching the reference's hand-flipped filters (edge_operator.py:107-140):
# direction d compares against the neighbor the filter subtracts.
_DIRS = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def canny_edges(x: jnp.ndarray, threshold: float = 2.0) -> jnp.ndarray:
    """Differentiable Canny on (B, H, W, 1) images.

    Gaussian 5x5 blur -> Sobel gradients -> orientation quantized to 45deg ->
    non-max suppression against both directional neighbors -> threshold ->
    clamp to 1 (edge_operator.py:147-245; grayscale input replicates to the
    reference's 3-channel sum, i.e. gradients scale by 3).
    """
    b, h, w, c = x.shape
    assert c == 1
    g = _gaussian_kernel()
    # separable blur, zero padding like nn.Conv2d default
    xpad = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))
    xb = sum(g[i] * xpad[:, :, i : i + w, :] for i in range(5))
    xpad = jnp.pad(xb, ((0, 0), (2, 2), (0, 0), (0, 0)))
    xb = sum(g[i] * xpad[:, i : i + h, :, :] for i in range(5))

    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # reference sobel_filter: [[1,0,-1],[2,0,-2],[1,0,-1]] (x), transpose (y)
    gx = _shift_sum(xp, [[1, 0, -1], [2, 0, -2], [1, 0, -1]])
    gy = _shift_sum(xp, [[1, 2, 1], [0, 0, 0], [-1, -2, -1]])
    # reference replicates grayscale to RGB and sums three identical mags
    grad_mag = 3.0 * jnp.sqrt(gx * gx + gy * gy)
    orient = jnp.arctan2(3.0 * gy, 3.0 * gx) * (180.0 / 3.14159) + 180.0
    d_pos = (jnp.round(orient / 45.0) % 8).astype(jnp.int32)
    d_neg = (d_pos + 4) % 8

    mp = jnp.pad(grad_mag, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [mp[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :] for dy, dx in _DIRS],
        axis=-1,
    )  # (B, H, W, 1, 8): directional differences grad - neighbor
    diffs = grad_mag[..., None] - neigh
    pos = jnp.take_along_axis(diffs, d_pos[..., None], axis=-1)[..., 0]
    neg = jnp.take_along_axis(diffs, d_neg[..., None], axis=-1)[..., 0]
    is_max = jnp.minimum(pos, neg) > 0.0

    thin = jnp.where(is_max, grad_mag, 0.0)
    thin = jnp.where(thin < threshold, 0.0, thin)
    return jnp.minimum(thin, 1.0)
