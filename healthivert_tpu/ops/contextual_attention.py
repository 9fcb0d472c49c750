"""Batched contextual attention (patch-match inpainting attention) for TPU.

The reference computes this with a Python loop over the batch, building
1024-filter convs per sample plus two 3x3 "fuse" convs over a 1024x1024
score image and a conv_transpose paste
(/root/reference/models/inpaint_networks.py:235-410, inpaint_tools.py:26-54).

TPU-native formulation — everything batched, MXU-shaped, no per-sample loop:

  similarity:  unfold(f_down) @ normalized-patches(b_down)^T
               -> one (B, P, k2C) x (B, k2C, L) batched matmul
  fuse:        the 3x3 identity-kernel conv over the flattened (L, P) score
               image == 3 diagonal shifted adds (VPU); the second pass is the
               same after a (h<->w) block transpose
  softmax:     mask-gated, scale=10, over the L patch axis
  paste:       probs^T @ raw-patches -> (B, P, 16C) batched matmul, then a
               static 16-offset overlap-add (the stride-2 4x4 transposed conv)

Per-sample mask gating: the reference applies sample 0's patch mask to the
whole batch (inpaint_networks.py:314 `m = m[0]`); we gate each sample with
its own mask, which is what the math intends (identical at batch size 1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import resize_nearest


class AttentionOut(NamedTuple):
    y: jnp.ndarray  # (B, H, W, C) pasted features
    offsets: jnp.ndarray  # (B, H/rate, W/rate, 2) argmax patch coords (h, w)


def _same_pad_hw(x, k, s):
    """Symmetric SAME padding on H, W (matches inpaint_tools.same_padding)."""
    h, w = x.shape[1], x.shape[2]
    oh = -(-h // s)
    ow = -(-w // s)
    ph = max(0, (oh - 1) * s + k - h)
    pw = max(0, (ow - 1) * s + k - w)
    return jnp.pad(
        x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    )


def extract_patches(x, k, s):
    """(B, H, W, C) -> (B, L, k, k, C) patches with SAME padding, row-major.

    Built by concatenating the k^2 shifted slices along the channel axis —
    a pure reshape away from the (ky, kx, c) patch layout, with NO transpose
    relayout (the stack+6D-transpose formulation measured 6x slower on TPU).
    """
    xp = _same_pad_hw(x, k, s)
    b, hp, wp, c = xp.shape
    oh = -(-x.shape[1] // s)
    ow = -(-x.shape[2] // s)
    cols = [
        xp[:, dy : dy + (oh - 1) * s + 1 : s, dx : dx + (ow - 1) * s + 1 : s, :]
        for dy in range(k)
        for dx in range(k)
    ]
    out = jnp.concatenate(cols, axis=-1)  # (B, oh, ow, k*k*C), (ky, kx, c) order
    return out.reshape(b, oh * ow, k, k, c)


def _fuse_diag(y):
    """3x3 identity-kernel conv over (B, N, M) treated as an image:
    out[i, j] = y[i-1, j-1] + y[i, j] + y[i+1, j+1] (zero-padded edges)."""
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1)))
    return yp[:, :-2, :-2] + yp[:, 1:-1, 1:-1] + yp[:, 2:, 2:]


def _perm(x, n, axis, direction):
    """Gather x[sigma(i)] along axis, where sigma walks +-1 in the w-major
    transposed flatten of an (n, n) grid (exact equivalent of the reference's
    reshape/transpose around the second fuse conv; verified in tests)."""
    m = x.shape[axis]
    z = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    if direction > 0:
        main = jax.lax.slice_in_dim(x, n, m, axis=axis)
        wrap = jax.lax.slice_in_dim(x, 1, n, axis=axis)
        return jax.lax.concatenate([main, wrap, z], axis)
    wrap = jax.lax.slice_in_dim(x, m - n, m - 1, axis=axis)
    main = jax.lax.slice_in_dim(x, 0, m - n, axis=axis)
    return jax.lax.concatenate([z, wrap, main], axis)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ksize", "stride", "rate", "fuse_k", "softmax_scale", "fuse",
        "compute_offsets", "use_pallas", "score_dtype",
    ),
)
def contextual_attention(
    f: jnp.ndarray,
    b: jnp.ndarray,
    mask: jnp.ndarray,
    ksize: int = 3,
    stride: int = 1,
    rate: int = 2,
    fuse_k: int = 3,
    softmax_scale: float = 10.0,
    fuse: bool = True,
    compute_offsets: bool = False,
    use_pallas: bool = False,
    score_dtype=None,
) -> AttentionOut:
    """f, b: (B, H, W, C) NHWC features (foreground to fill / background to
    borrow from; the network passes f == b). mask: (B, Hm, Wm, 1) with 1 in
    the hole; downscaled here by 1/(4*rate) like the reference.
    """
    del fuse_k  # fixed 3 via _fuse_diag, as the reference always uses
    bs, h, w, c = f.shape
    kernel = 2 * rate

    # raw patches for reconstruction, from full-res background
    raw = extract_patches(b, kernel, rate * stride)  # (B, L, 4, 4, C)
    num_l = raw.shape[1]

    # downscale for matching
    fd = resize_nearest(f, h // rate, w // rate)
    bd = resize_nearest(b, h // rate, w // rate)
    hd, wd = fd.shape[1], fd.shape[2]
    num_p = hd * wd

    wpat = extract_patches(bd, ksize, stride)  # (B, L, 3, 3, C)
    norm = jnp.sqrt(jnp.sum(wpat * wpat, axis=(2, 3, 4), keepdims=True))
    wnorm = wpat / jnp.maximum(norm, 1e-4)

    # mask -> patch-availability gate mm: 1 where the 3x3 patch is hole-free
    md = resize_nearest(mask, mask.shape[1] // (4 * rate), mask.shape[2] // (4 * rate))
    mpat = extract_patches(md, ksize, stride)  # (B, L, 3, 3, 1)
    mm = (jnp.mean(mpat, axis=(2, 3, 4)) == 0.0).astype(f.dtype)  # (B, L)

    if use_pallas and fuse:
        # kernel v2: scores + fuse + softmax + paste + fold, all VMEM-resident,
        # computed directly from the feature maps (no patch tensors at all).
        # Differentiable: custom VJP with an analytic XLA backward.
        if compute_offsets:
            # inference/debug path (test.py gallery, reference
            # inpaint_networks.py:368-374): the kernel's emitted probs
            # residual feeds the argmax — no XLA-formulation fallback needed
            from .attention_pallas import attention_v2

            y, _s, probs, _n = attention_v2(
                fd, bd, b, mm.astype(jnp.float32), hd, wd, softmax_scale,
                emit_residuals=True,
            )
            off = jnp.argmax(probs, axis=1).astype(jnp.int32)  # (B, P)
            offsets = jnp.stack([off // wd, off % wd], axis=-1).reshape(
                bs, hd, wd, 2
            )
        else:
            from .attention_pallas import attention_v2_diff

            y = attention_v2_diff(
                fd, bd, b, mm.astype(jnp.float32), hd, wd, softmax_scale
            )
            offsets = jnp.zeros((bs, hd, wd, 2), jnp.int32)
        return AttentionOut(y.astype(f.dtype), offsets)

    # similarity scores as one batched matmul: (B, P, k2C) x (B, k2C, L)
    fpat = extract_patches(fd, ksize, stride).reshape(bs, num_p, -1)

    sdt = score_dtype or jnp.float32
    scores = jnp.einsum(
        "bpk,blk->blp",
        fpat,
        wnorm.reshape(bs, num_l, -1),
        preferred_element_type=jnp.float32,
    ).astype(sdt)  # (B, L, P)

    if fuse:
        scores = _fuse_diag(scores)
        # second fuse pass (diagonal conv in the block-transposed flatten)
        # expressed as permuted shifts in the original flatten — avoids two
        # (B, hd, wd, hd, wd) transpose copies (see attention_pallas._perm_*)
        scores = (
            scores
            + _perm(_perm(scores, wd, 1, +1), wd, 2, +1)
            + _perm(_perm(scores, wd, 1, -1), wd, 2, -1)
        )

    gate = mm[:, :, None].astype(sdt)
    probs = jax.nn.softmax(scores * gate * softmax_scale, axis=1) * gate  # (B, L, P)

    if compute_offsets:
        off = jnp.argmax(probs, axis=1).astype(jnp.int32)  # (B, P)
        offsets = jnp.stack([off // wd, off % wd], axis=-1).reshape(bs, hd, wd, 2)
    else:
        offsets = jnp.zeros((bs, hd, wd, 2), jnp.int32)

    # paste: (B, P, L) x (B, L, 16C) then overlap-add (stride-2 4x4 deconv)
    vals = jnp.einsum(
        "blp,blk->bpk",
        probs,
        raw.reshape(bs, num_l, -1),
        preferred_element_type=jnp.float32,
    ).reshape(bs, hd, wd, kernel, kernel, c)

    y = _fold_overlap_add(vals, h, w, rate * stride, kernel)
    return AttentionOut(y.astype(f.dtype), offsets)


def _fold_overlap_add(vals, h, w, s, k):
    """Overlap-add of (B, hd, wd, k, k, C) patch values on a stride-s grid
    with padding 1 (the conv_transpose2d(stride=s, padding=1) of the
    reference), divided by 4.

    For the hot s=2/k=4 case the strided scatter (16 .at[::2].add passes,
    measured 7 ms at B=64) is replaced by a phase decomposition: each output
    parity (r, t) is a plain sum of 4 shifted planes, then the four phases
    interleave with one reshape.
    """
    bs, hd, wd, _, _, c = vals.shape
    if s == 2 and k == 4:
        phases = []
        for r in range(2):
            row_ph = []
            for t in range(2):
                q = jnp.zeros((bs, hd + 1, wd + 1, c), vals.dtype)
                for a in range(2):  # dy = r + 2a contributes at i = p + a
                    for b_ in range(2):
                        v = vals[:, :, :, r + 2 * a, t + 2 * b_, :]
                        q = q.at[:, a : a + hd, b_ : b_ + wd, :].add(v)
                row_ph.append(q)
            phases.append(row_ph)
        # interleave: out_padded[2i+r, 2j+t] = phases[r][t][i, j]
        stacked = jnp.stack(
            [jnp.stack([phases[0][0], phases[0][1]], axis=3),
             jnp.stack([phases[1][0], phases[1][1]], axis=3)],
            axis=2,
        )  # (B, hd+1, 2, wd+1, 2, C)
        out = stacked.reshape(bs, 2 * (hd + 1), 2 * (wd + 1), c)
        return out[:, 1 : 1 + h, 1 : 1 + w, :] / 4.0

    pad = 1
    out = jnp.zeros((bs, h + 2 * pad, w + 2 * pad, c), vals.dtype)
    for dy in range(k):
        for dx in range(k):
            out = out.at[:, dy : dy + (hd - 1) * s + 1 : s, dx : dx + (wd - 1) * s + 1 : s, :].add(
                vals[:, :, :, dy, dx, :]
            )
    return out[:, pad : pad + h, pad : pad + w, :] / 4.0
