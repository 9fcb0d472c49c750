"""Vertebra mask-band geometry and SHRM paste-back, as pure jittable functions.

The reference implements this geometry twice with host-side numpy slicing and
per-sample Python loops (.item() device syncs in the hot loop):
- dataset mask band + context shifting: /root/reference/data/aligned_dataset.py:213-245
- inference band building: /root/reference/eval_3d_sagittal_twostage.py:56-82
- SHRM paste-back: /root/reference/models/pix2pix_model.py:207-252 and
  eval_3d_sagittal_twostage.py:108-130

Here every function is static-shape: row ranges become iota masks and gathers,
so the whole thing lives inside the jitted step (vmap over the batch). Images
are (H, W) or (H, W, C) with H = the vertical (row) axis the bands live on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def band_bounds(x1, x2, height_rows: int, band: int = 40):
    """Compute the fixed-height mask band [min_x, max_x) around a vertebra.

    Mirrors aligned_dataset.py:215-227: center the `band`-row window on the
    vertebra center (x1+x2)//2, clamped to the image.
    """
    mask_x = (x1 + x2) // 2
    half = band // 2
    min_x = jnp.where(
        mask_x <= half,
        0,
        jnp.where(height_rows - mask_x <= band / 2, height_rows - band, mask_x - half),
    )
    max_x = min_x + band
    return min_x.astype(jnp.int32), max_x.astype(jnp.int32)


def band_mask(min_x, max_x, height_rows: int, width: int, inclusive_end: bool = False):
    """Binary (H, W) mask with rows [min_x, max_x) set to 1.

    inclusive_end=True reproduces the inference driver's off-by-one band
    (eval_3d_sagittal_twostage.py:75 uses [min_x, max_x+1)).
    """
    r = jnp.arange(height_rows)[:, None]
    hi = max_x + 1 if inclusive_end else max_x
    return ((r >= min_x) & (r < hi)).astype(jnp.float32) * jnp.ones((1, width), jnp.float32)


def shift_context(img: jnp.ndarray, x1, x2, min_x, max_x) -> jnp.ndarray:
    """Build the masked context image: vertebra rows removed, flanks shifted
    inward to abut the band (aligned_dataset.py:233-245).

    rows [0, min_x)      <- img[x1-min_x : x1)
    rows [max_x, H)      <- img[x2 : x2 + H - max_x)
    rows [min_x, max_x)  <- 0
    """
    h = img.shape[0]
    r = jnp.arange(h)
    upper = r < min_x
    lower = r >= max_x
    idx = jnp.where(upper, r + (x1 - min_x), jnp.where(lower, x2 + r - max_x, 0))
    idx = jnp.clip(idx, 0, h - 1)
    gathered = jnp.take(img, idx, axis=0)
    keep = (upper | lower).astype(img.dtype)
    return gathered * keep.reshape((h,) + (1,) * (img.ndim - 1))


def shrm_paste(
    fake_raw: jnp.ndarray,
    real: jnp.ndarray,
    pred_h,
    real_height,
    x1,
    x2,
) -> jnp.ndarray:
    """Reassemble a full slice from the synthesized band + real context rows.

    Static-shape version of the reference per-sample loop
    (pix2pix_model.py:207-227): the predicted height h = max(ceil(pred_h),
    real_height) widens the band symmetrically; rows above come from
    real[r + (h-real)//2], rows below from real[x2 + r - x_bottom].

    fake_raw/real: (H, W) or (H, W, C); pred_h scalar (already in rows);
    real_height = x2 - x1.
    """
    h = fake_raw.shape[0]
    height = jnp.maximum(jnp.ceil(pred_h).astype(jnp.int32), real_height)
    hd2 = (height - real_height) // 2
    x_upper = x1 - hd2
    x_bottom = x_upper + height

    r = jnp.arange(h)
    upper = r < x_upper
    lower = r >= x_bottom
    mid = ~(upper | lower)
    idx = jnp.where(upper, r + hd2, jnp.where(lower, x2 + r - x_bottom, 0))
    idx = jnp.clip(idx, 0, h - 1)
    real_rows = jnp.take(real, idx, axis=0)
    midk = mid.reshape((h,) + (1,) * (fake_raw.ndim - 1))
    ctxk = (upper | lower).reshape((h,) + (1,) * (fake_raw.ndim - 1))
    return jnp.where(midk, fake_raw, 0) + jnp.where(ctxk, real_rows, 0)


# Batched variants over leading batch axis (all bound args per-sample scalars).
shift_context_batch = jax.vmap(shift_context, in_axes=(0, 0, 0, 0, 0))
shrm_paste_batch = jax.vmap(shrm_paste, in_axes=(0, 0, 0, 0, 0, 0))


def band_crop(img: jnp.ndarray, mask: jnp.ndarray, rows: int = 48,
              cols: int = 128) -> jnp.ndarray:
    """Static-shape crop of `img` guaranteed to contain the full support of
    ``mask * img * local_crop_mask``: D3's input.

    D3's local input (reference pix2pix_model.py:254-260) is nonzero only on
    the band-mask rows (a fixed maxheight=40-row band, ≤41 rows inclusive —
    data/sampler.band_and_shift) intersected with the 70 center columns —
    yet the reference convolves the full 256² of mostly zeros through an
    ndf=64 PatchGAN. This crops a (rows, cols) window: row start tracks the
    mask's first nonzero row (data-dependent VALUE, static SHAPE — a
    dynamic_slice, so XLA still sees fixed shapes); columns are the static
    centered window. With rows=48 ≥ 41+3 margin and cols=128 ⊇ [c-35, c+35)
    every nonzero pixel survives, so D3 (and the G gradient through it)
    sees all the content at ~1/10.7 the conv FLOPs.

    img/mask: (H, W, C). Differentiable in img (dynamic_slice VJP).
    """
    h, w = img.shape[0], img.shape[1]
    row_any = jnp.any(mask > 0, axis=(1, 2))
    first = jnp.argmax(row_any)  # 0 if empty mask: harmless (crop of zeros)
    r0 = jnp.clip(first - 3, 0, h - rows)
    c0 = (w - cols) // 2
    return jax.lax.dynamic_slice(img, (r0, c0, 0), (rows, cols, img.shape[2]))


band_crop_batch = jax.vmap(band_crop, in_axes=(0, 0, None, None))


def local_crop_mask(height_rows: int, width: int, half_width: int = 35) -> jnp.ndarray:
    """Central-column mask used by discriminator D3's local crop
    (pix2pix_model.py:254-258): columns [W//2-35, W//2+35) set to 1.
    """
    c = jnp.arange(width)[None, :]
    center = width // 2
    m = ((c >= center - half_width) & (c < center + half_width)).astype(jnp.float32)
    return m * jnp.ones((height_rows, 1), jnp.float32)
