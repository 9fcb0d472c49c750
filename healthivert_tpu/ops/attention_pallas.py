"""Pallas TPU kernel for the contextual-attention score pipeline.

The XLA path (ops.contextual_attention) materializes the (B, L, P) f32 score
tensor in HBM for every stage (matmul, two fuse passes, softmax, paste) —
~270 MB per pass at B=64, measured 3-6 ms per stage. This kernel keeps the
whole per-sample pipeline VMEM-resident: one program per batch item, row
tiles of 128, manual HBM->VMEM DMA for the inputs so nothing is double
buffered:

    S  = Wn @ F^T                  (MXU, bf16 in / f32 accum, row-tiled)
    B2 = fuse1(S)                  (diagonal shifted adds, halo'd row tiles)
    S  = fuse2(B2)                 (permuted +-wd shifts of the transposed
                                    flatten, expressed as static concats)
    S  = exp(S * g * scale - max)  (two-pass column softmax, in place)
    out= (S / sum * g)^T @ raw     (MXU, output tiles DMA'd to HBM)

VMEM high-water ~13.5 MB for the sagittal shape (L = P = 1024, K = 576,
RC = 1024). Numerics match the XLA path (same fuse flatten quirks as the
reference convs). The v2 kernel (attention_v2_diff) is DIFFERENTIABLE:
the forward optionally emits its s / probs / nrm VMEM intermediates as
residuals (emit_residuals=True), and the custom VJP's backward is a SECOND
Pallas kernel (_attention_v2_bwd_kernel) — the full adjoint (paste
adjoints, softmax backward, the two self-adjoint fuse sweeps in reverse
order, norm + score backward, 50 offset matmuls total) VMEM-resident per
sample. Measured v5e bf16: attention fwd+bwd 5.6 ms @bs16 / 13.6 ms @bs64
vs the XLA formulation's 10.6 / 44.4 (experiments/bwd_prof.py). An XLA
fallback backward (_att_bwd_xla) is kept and pinned equal by
tests/test_attention_pallas.py. v1 (attention_scores_paste) remains
forward-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(t, shift, axis, interpret):
    """Circular shift: out[i] = t[i - shift] (jnp.roll semantics)."""
    if interpret:
        return jnp.roll(t, shift, axis)
    return pltpu.roll(t, shift % t.shape[axis], axis)  # pltpu requires shift >= 0


def _cols(t):
    return jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)


def _roll_any(t, shift, axis, interpret):
    """_roll for any dtype: Mosaic's rotate only handles 32-bit vectors, so
    narrow dtypes round-trip through f32 (exact for bf16)."""
    if t.dtype.itemsize == 4:
        return _roll(t, shift, axis, interpret)
    return _roll(t.astype(jnp.float32), shift, axis, interpret).astype(t.dtype)


def _col_shift(t, k, interpret):
    """out[:, j] = t[:, j + k] with zero fill (lane shift via roll + mask)."""
    m = t.shape[1]
    rolled = _roll(t, -k, 1, interpret)
    c = _cols(t)
    if k >= 0:
        return jnp.where(c < m - k, rolled, 0.0)
    return jnp.where(c >= -k, rolled, 0.0)


def _col_perm_plus(t, n, interpret):
    """out[:, c] = t[:, sigma_plus(c)]: t[c+n] below the wrap, t[c+n-m+1] in
    the wrap region [m-n, m-1), zero at c = m-1 — the exact +1 step of the
    transposed flatten (contextual_attention._perm direction>0).

    Regression note: the wrap roll was -(n-1) until round 2, off by two from
    sigma_plus. The error only reaches soft (non-one-hot) attention queries
    in the BOTTOM row of the query grid, which no centered hole band ever
    produced — caught by the backward-kernel adjoint derivation and pinned
    by test_pallas_bottom_band."""
    m = t.shape[1]
    c = _cols(t)
    main = _roll(t, -n, 1, interpret)
    wrap = _roll(t, -(n + 1), 1, interpret)
    return jnp.where(c < m - n, main, jnp.where(c < m - 1, wrap, 0.0))


def _col_perm_minus(t, n, interpret):
    """out[:, c] = t[:, sigma_minus(c)]: zero at c = 0, t[c+m-n-1] in the
    wrap region [1, n), t[c-n] for c >= n."""
    m = t.shape[1]
    c = _cols(t)
    main = _roll(t, n, 1, interpret)
    wrap = _roll(t, n + 1, 1, interpret)
    return jnp.where(c >= n, main, jnp.where(c >= 1, wrap, 0.0))


def _attention_kernel(hd, wd, scale, r_tile, interpret,
                      f_hbm, w_hbm, raw_hbm, mm_ref, out_hbm,
                      f_s, w_s, raw_s, s_ref, b_ref, out_t, sems):
    b = pl.program_id(0)
    num_l = hd * wd
    nt = num_l // r_tile

    cp_f = pltpu.make_async_copy(f_hbm.at[b], f_s, sems.at[0])
    cp_w = pltpu.make_async_copy(w_hbm.at[b], w_s, sems.at[1])
    cp_r = pltpu.make_async_copy(raw_hbm.at[b], raw_s, sems.at[2])
    cp_f.start(); cp_w.start(); cp_r.start()
    cp_f.wait(); cp_w.wait()

    # --- scores: S[t] = W[t] @ F^T (contract K), row-tiled ---
    for t in range(nt):
        r0 = t * r_tile
        s_ref[r0 : r0 + r_tile, :] = jax.lax.dot_general(
            w_s[r0 : r0 + r_tile, :], f_s[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # --- fuse1: B2[i, j] = S[i-1, j-1] + S[i, j] + S[i+1, j+1] ---
    for t in range(nt):
        r0 = t * r_tile
        cur = s_ref[r0 : r0 + r_tile, :]
        up = (  # rows r0-1 .. r0+r_tile-2
            jax.lax.concatenate(
                [jnp.zeros_like(cur[:1]), s_ref[0 : r_tile - 1, :]], 0)
            if t == 0 else s_ref[r0 - 1 : r0 + r_tile - 1, :]
        )
        dn = (  # rows r0+1 .. r0+r_tile
            jax.lax.concatenate(
                [s_ref[r0 + 1 : num_l, :], jnp.zeros_like(cur[:1])], 0)
            if t == nt - 1 else s_ref[r0 + 1 : r0 + r_tile + 1, :]
        )
        up_sh = _col_shift(up, -1, interpret)  # (i-1, j-1)
        dn_sh = _col_shift(dn, +1, interpret)  # (i+1, j+1)
        b_ref[r0 : r0 + r_tile, :] = cur + up_sh + dn_sh

    # --- fuse2: permuted +-wd diagonal adds in the transposed flatten ---
    for t in range(nt):
        r0 = t * r_tile
        cur = b_ref[r0 : r0 + r_tile, :]
        # plus rows: sigma_plus over [r0, r0+r_tile)
        if r0 + r_tile + wd <= num_l:
            plus = b_ref[r0 + wd : r0 + wd + r_tile, :]
        else:
            n_main = num_l - wd - r0  # rows with src r+wd in range
            parts = []
            if n_main > 0:
                parts.append(b_ref[r0 + wd : num_l, :])
            parts.append(b_ref[1:wd, :])  # wrap rows for r in [L-wd, L-1)
            parts.append(jnp.zeros_like(cur[:1]))  # r = L-1 invalid
            plus = jax.lax.concatenate(parts, 0)
        # minus rows: sigma_minus over [r0, r0+r_tile)
        if r0 >= wd:
            minus = b_ref[r0 - wd : r0 - wd + r_tile, :]
        else:
            parts = [jnp.zeros_like(cur[:1])]  # r = 0 invalid
            parts.append(b_ref[num_l - wd : num_l - 1, :])  # wrap r in [1, wd)
            parts.append(b_ref[0 : r_tile - wd, :])
            minus = jax.lax.concatenate(parts, 0)
        s_ref[r0 : r0 + r_tile, :] = (
            cur
            + _col_perm_plus(plus, wd, interpret)
            + _col_perm_minus(minus, wd, interpret)
        )

    # --- masked scaled softmax over rows (L), in place ---
    g_rows = mm_ref[0]  # (L, 1)
    m = jnp.full((1, num_l), -jnp.inf, jnp.float32)
    for t in range(nt):
        r0 = t * r_tile
        logits = s_ref[r0 : r0 + r_tile, :] * g_rows[r0 : r0 + r_tile] * scale
        m = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))
    ssum = jnp.zeros((1, num_l), jnp.float32)
    for t in range(nt):
        r0 = t * r_tile
        logits = s_ref[r0 : r0 + r_tile, :] * g_rows[r0 : r0 + r_tile] * scale
        e = jnp.exp(logits - m)
        ssum = ssum + jnp.sum(e, axis=0, keepdims=True)
        s_ref[r0 : r0 + r_tile, :] = e

    # --- paste: out[p] = sum_l probs[l, p] * raw[l, :] , p-tiled ---
    cp_r.wait()
    inv = 1.0 / ssum  # (1, P)
    for t in range(nt):
        p0 = t * r_tile
        probs = s_ref[:, p0 : p0 + r_tile] * inv[:, p0 : p0 + r_tile] * g_rows
        out_t[:] = jax.lax.dot_general(
            probs, raw_s[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_t.dtype)
        cp_o = pltpu.make_async_copy(out_t, out_hbm.at[b, p0 : p0 + r_tile, :], sems.at[4])
        cp_o.start()
        cp_o.wait()


@functools.partial(jax.jit, static_argnames=("hd", "wd", "scale", "interpret"))
def attention_scores_paste(
    fpat: jnp.ndarray,  # (B, P, K) unfolded foreground patches
    wnorm: jnp.ndarray,  # (B, L, K) normalized background patches
    raw: jnp.ndarray,  # (B, L, RC) raw patches for reconstruction
    mm: jnp.ndarray,  # (B, L) availability gate
    hd: int,
    wd: int,
    scale: float = 10.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns patch values (B, P, RC) = softmax-fused attention @ raw."""
    b, num_p, k = fpat.shape
    num_l = wnorm.shape[1]
    rc = raw.shape[-1]
    assert num_l == num_p == hd * wd
    # manual DMA requires 128-aligned lane dims: zero-pad K (contraction
    # over padded zeros is a no-op)
    k_pad = (-k) % 128
    if k_pad:
        fpat = jnp.pad(fpat, ((0, 0), (0, 0), (0, k_pad)))
        wnorm = jnp.pad(wnorm, ((0, 0), (0, 0), (0, k_pad)))
        k = k + k_pad
    r_tile = 128 if num_l % 128 == 0 else num_l
    kernel = functools.partial(_attention_kernel, hd, wd, scale, r_tile, interpret)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            any_spec, any_spec, any_spec,
            pl.BlockSpec((1, num_l, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((b, num_p, rc), fpat.dtype),
        scratch_shapes=[
            pltpu.VMEM((num_p, k), fpat.dtype),  # f_s
            pltpu.VMEM((num_l, k), wnorm.dtype),  # w_s
            pltpu.VMEM((num_l, rc), raw.dtype),  # raw_s
            pltpu.VMEM((num_l, num_p), jnp.float32),  # s_ref
            pltpu.VMEM((num_l, num_p), jnp.float32),  # b_ref
            pltpu.VMEM((r_tile, rc), fpat.dtype),  # out tile staging
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # statics ~14 MB + tile transients: raise the default 16 MB
            # scoped cap (v5e VMEM is larger; the compiler validates)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(fpat, wnorm, raw, mm[..., None].astype(jnp.float32))


# --------------------------------------------------------------------------
# Kernel v2: scores and paste computed directly from feature maps.
#
# v1 consumes pre-extracted patch tensors (B, L, k2C) built in XLA — their
# construction (strided slice concats) and the output fold measured ~10 ms
# at B=64. v2 moves both into the kernel: scores accumulate over the 9
# (dy, dx) window offsets as shifted (L, C) x (C, P) matmuls, and the paste
# accumulates the 16 raw-patch offsets into 2x2 output phase planes
# (the stride-2 deconv's parity decomposition) — no patch tensor and no
# fold ever exist. Shifts act on the two leading (sublane) grid dims; the
# channel lane dim is never shifted.
# --------------------------------------------------------------------------


def _shift2d(v, sy, sx):
    """out[i, j, :] = v[i + sy, j + sx, :], zero-filled at the borders."""
    for axis, s in ((0, sy), (1, sx)):
        if s == 0:
            continue
        n = v.shape[axis]
        if s > 0:
            main = jax.lax.slice_in_dim(v, s, n, axis=axis)
            pad = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, s, axis=axis))
            v = jax.lax.concatenate([main, pad], axis)
        else:
            main = jax.lax.slice_in_dim(v, 0, n + s, axis=axis)
            pad = jnp.zeros_like(jax.lax.slice_in_dim(v, n + s, n, axis=axis))
            v = jax.lax.concatenate([pad, main], axis)
    return v


def _pack2(v, o1, o2, num_l, c, c_real, interpret):
    """Offset-pair lane packing: v shifted by (dy, dx) offset o1, flattened
    to (num_l, c), plus v shifted by o2 rolled into the zero pad lanes
    [c_real, 2*c_real) — ONE MXU operand carrying two offsets. K-contracting
    a pair against a pair sums both offsets' products (the accumulation);
    N-side, the two results land in disjoint lane halves (see _unpack_hi).
    Requires 2*c_real <= c (the `packed` predicate at every call site)."""
    x = _shift2d(v, o1[0], o1[1]).reshape(num_l, c)
    return x + _roll_any(
        _shift2d(v, o2[0], o2[1]).reshape(num_l, c), c_real, 1, interpret
    )


def _unpack_hi(x, c, c_real, interpret):
    """Inverse of _pack2's lane roll for N-packed matmul results: brings the
    second offset's slab [c_real, 2*c_real) down to the real lanes
    [0, c_real). Lanes >= c_real become garbage that the caller's final
    channel slice discards."""
    return _roll(x, c - c_real, 1, interpret)


def _attention_v2_kernel(hd, wd, scale, r_tile, interpret, emit_res, c_real,
                         fd_ref, bd_ref, bph_ref, mm_ref, out_ref,
                         *rest):
    if emit_res:
        # training variant: also emit s (post-norm pre-fuse scores), the
        # gated softmax probs, and the raw patch norms — the custom-VJP
        # backward consumes them instead of recomputing (bwd_stage_prof.py:
        # the score einsum + fuse + softmax recompute cost ~17 ms at B=64)
        s_out, p_out, n_out = rest[:3]
        rest = rest[3:]
    s_ref, b_ref = rest
    # every operand rides Mosaic's automatic double-buffered block pipeline
    # (fetches/stores overlap adjacent programs' compute); the original
    # manual ANY-space DMAs serialized 7 start/wait pairs per program and
    # cost ~1.4 ms of pure latency at bs256 (experiments/attn_ablate.py:
    # full 16.2 -> auto 14.8 ms, bit-exact)
    num_l = hd * wd
    nt = num_l // r_tile

    fdv = fd_ref[0]  # (hd, wd, C)
    bdv = bd_ref[0]

    # --- scores: S[l, p] = sum_o <bd[l+o-1], fd[p+o-1]>, offset-accumulated.
    # The channel (lane) dim is zero-padded to 128 for the DMAs, so a plain
    # per-offset matmul burns half the MXU K tile on structural zeros; when
    # the real channels fit in half the lanes, TWO offsets pack into one
    # matmul (the second rolled into the zero lanes — the contraction then
    # sums both offsets' products, which is exactly the accumulation). 9
    # matmuls become 5. ---
    c = fdv.shape[-1]
    packed = 2 * c_real <= c
    s_acc = jnp.zeros((num_l, num_l), jnp.float32)
    nrm2 = jnp.zeros((hd, wd, 1), jnp.float32)
    bd2 = jnp.sum(bdv.astype(jnp.float32) * bdv.astype(jnp.float32), axis=-1, keepdims=True)
    offs = [(dy - 1, dx - 1) for dy in range(3) for dx in range(3)]
    for o in offs:
        nrm2 = nrm2 + _shift2d(bd2, o[0], o[1])
    groups = (
        [offs[i : i + 2] for i in range(0, 8, 2)] + [offs[8:]]
        if packed else [[o] for o in offs]
    )
    for g in groups:
        if len(g) == 2:
            f_o = _pack2(fdv, g[0], g[1], num_l, c, c_real, interpret)
            b_o = _pack2(bdv, g[0], g[1], num_l, c, c_real, interpret)
        else:
            f_o = _shift2d(fdv, g[0][0], g[0][1]).reshape(num_l, c)
            b_o = _shift2d(bdv, g[0][0], g[0][1]).reshape(num_l, c)
        s_acc = s_acc + jax.lax.dot_general(
            b_o, f_o,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # per-l patch-norm row scale (v1's wnorm = w / max(||w||, 1e-4))
    nrm_raw = jnp.sqrt(nrm2.reshape(num_l, 1))
    nrm = jnp.maximum(nrm_raw, 1e-4)
    s_ref[:] = s_acc / nrm
    if emit_res:
        s_out[0] = s_ref[:]
        n_out[0] = nrm_raw

    # --- fuse1 (diagonal +-1) ---
    for t in range(nt):
        r0 = t * r_tile
        cur = s_ref[r0 : r0 + r_tile, :]
        up = (
            jax.lax.concatenate([jnp.zeros_like(cur[:1]), s_ref[0 : r_tile - 1, :]], 0)
            if t == 0 else s_ref[r0 - 1 : r0 + r_tile - 1, :]
        )
        dn = (
            jax.lax.concatenate([s_ref[r0 + 1 : num_l, :], jnp.zeros_like(cur[:1])], 0)
            if t == nt - 1 else s_ref[r0 + 1 : r0 + r_tile + 1, :]
        )
        b_ref[r0 : r0 + r_tile, :] = (
            cur + _col_shift(up, -1, interpret) + _col_shift(dn, +1, interpret)
        )

    # --- fuse2 (permuted +-wd in the transposed flatten) ---
    # the per-column logits max rides along in the same sweep (the tile is
    # already in registers), saving a full s_ref read pass
    g_rows = mm_ref[0]  # (L, 1)
    m = jnp.full((1, num_l), -jnp.inf, jnp.float32)
    for t in range(nt):
        r0 = t * r_tile
        cur = b_ref[r0 : r0 + r_tile, :]
        if r0 + r_tile + wd <= num_l:
            plus = b_ref[r0 + wd : r0 + wd + r_tile, :]
        else:
            parts = []
            if num_l - wd - r0 > 0:
                parts.append(b_ref[r0 + wd : num_l, :])
            parts.append(b_ref[1:wd, :])
            parts.append(jnp.zeros_like(cur[:1]))
            plus = jax.lax.concatenate(parts, 0)
        if r0 >= wd:
            minus = b_ref[r0 - wd : r0 - wd + r_tile, :]
        else:
            parts = [jnp.zeros_like(cur[:1])]
            parts.append(b_ref[num_l - wd : num_l - 1, :])
            parts.append(b_ref[0 : r_tile - wd, :])
            minus = jax.lax.concatenate(parts, 0)
        fused = (
            cur
            + _col_perm_plus(plus, wd, interpret)
            + _col_perm_minus(minus, wd, interpret)
        )
        s_ref[r0 : r0 + r_tile, :] = fused
        logits = fused * g_rows[r0 : r0 + r_tile] * scale
        m = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))

    # --- masked scaled softmax over rows (max already collected above) ---
    # NOTE: the 1/sum factor cannot be folded into the paste outputs — inv is
    # a (1, L) lane vector and Mosaic can't reshape it to the (hd, wd, 1)
    # query grid in-kernel (remote compile rejects the lane->sublane move)
    ssum = jnp.zeros((1, num_l), jnp.float32)
    for t in range(nt):
        r0 = t * r_tile
        logits = s_ref[r0 : r0 + r_tile, :] * g_rows[r0 : r0 + r_tile] * scale
        e = jnp.exp(logits - m)
        ssum = ssum + jnp.sum(e, axis=0, keepdims=True)
        s_ref[r0 : r0 + r_tile, :] = e
    inv = 1.0 / ssum
    for t in range(nt):
        r0 = t * r_tile
        s_ref[r0 : r0 + r_tile, :] = (
            s_ref[r0 : r0 + r_tile, :] * inv * g_rows[r0 : r0 + r_tile]
        )
    if emit_res:
        p_out[0] = s_ref[:]

    # --- paste into 2x2 output phases (the whole block stores once per
    # program, overlapped by the pipeline). Same pair packing as the scores
    # (N side this time): the two column offsets of a row share one matmul,
    # their results landing in disjoint lane halves (garbage stays in the
    # pad lanes the wrapper slices off). 16 matmuls become 8. ---
    for r in range(2):
        a_vals = [0, 1] if r == 0 else [-1, 0]
        for s_ in range(2):
            bb_vals = [0, 1] if s_ == 0 else [-1, 0]
            acc = jnp.zeros((hd, wd, c), jnp.float32)
            for a in a_vals:
                if packed:
                    pair = _pack2(
                        bph_ref[0, r, s_], (a, bb_vals[0]), (a, bb_vals[1]),
                        num_l, c, c_real, interpret,
                    )
                    out_o = jax.lax.dot_general(
                        s_ref[:], pair,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (P, C): lanes [0, c_real) = bb_vals[0]'s result,
                    #            lanes [c_real, 2c_real) = bb_vals[1]'s
                    acc = acc + _shift2d(out_o.reshape(hd, wd, c), -a, -bb_vals[0])
                    acc = acc + _shift2d(
                        _unpack_hi(out_o, c, c_real, interpret).reshape(hd, wd, c),
                        -a, -bb_vals[1],
                    )
                else:
                    for bb in bb_vals:
                        raw_o = _shift2d(bph_ref[0, r, s_], a, bb).reshape(num_l, c)
                        out_o = jax.lax.dot_general(
                            s_ref[:], raw_o,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (P, C)
                        acc = acc + _shift2d(out_o.reshape(hd, wd, c), -a, -bb)
            out_ref[0, r, s_] = (acc / 4.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("hd", "wd", "scale", "interpret", "emit_residuals")
)
def attention_v2(
    fd: jnp.ndarray,  # (B, hd, wd, C) downscaled foreground features
    bd: jnp.ndarray,  # (B, hd, wd, C) downscaled background features
    b_full: jnp.ndarray,  # (B, 2hd, 2wd, C) full-res background
    mm: jnp.ndarray,  # (B, L) availability gate
    hd: int,
    wd: int,
    scale: float = 10.0,
    interpret: bool = False,
    emit_residuals: bool = False,
):
    """Returns the pasted attention output y (B, 2hd, 2wd, C); with
    emit_residuals also (s, probs, nrm_raw) for the custom-VJP backward."""
    bs, _, _, c_in = fd.shape
    num_l = hd * wd
    r_tile = 128 if num_l % 128 == 0 else num_l
    # manual DMA needs a 128-aligned lane (channel) dim; zero channels are
    # inert through both matmuls and sliced off at the end
    c_pad = (-c_in) % 128
    if c_pad:
        fd = jnp.pad(fd, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
        bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
        b_full = jnp.pad(b_full, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
    c = c_in + c_pad
    # 2x2 phase split of the full-res background: phases[r, s][i, j] = b[2i+r, 2j+s]
    bph = b_full.reshape(bs, hd, 2, wd, 2, c).transpose(0, 2, 4, 1, 3, 5)
    kernel = functools.partial(
        _attention_v2_kernel, hd, wd, scale, r_tile, interpret, emit_residuals,
        c_in,
    )
    out_shape = [jax.ShapeDtypeStruct((bs, 2, 2, hd, wd, c), fd.dtype)]
    out_specs = [
        pl.BlockSpec((1, 2, 2, hd, wd, c), lambda i: (i, 0, 0, 0, 0, 0))
    ]
    if emit_residuals:
        big = pl.BlockSpec(
            (1, num_l, num_l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape += [
            jax.ShapeDtypeStruct((bs, num_l, num_l), jnp.float32),  # s
            jax.ShapeDtypeStruct((bs, num_l, num_l), jnp.float32),  # probs
            jax.ShapeDtypeStruct((bs, num_l, 1), jnp.float32),  # nrm_raw
        ]
        out_specs += [
            big, big,
            pl.BlockSpec((1, num_l, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(bs,),
        in_specs=[
            pl.BlockSpec((1, hd, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hd, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, 2, hd, wd, c), lambda i: (i, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, num_l, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((num_l, num_l), jnp.float32),
            pltpu.VMEM((num_l, num_l), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(fd, bd, bph, mm[..., None].astype(jnp.float32))
    out = outs[0]
    # interleave phases: y[2i+r, 2j+s] = out[r, s, i, j]
    y = out.transpose(0, 3, 1, 4, 2, 5).reshape(bs, 2 * hd, 2 * wd, c)
    y = y[..., :c_in]
    if emit_residuals:
        return y, outs[1], outs[2], outs[3]
    return y


# --------------------------------------------------------------------------
# Differentiable wrapper: v2 kernel forward + analytic XLA backward.
#
# The fuse operator is self-adjoint in each pass (it contains both +- shifts
# and the two permutations are mutually transposed), so F^T = fuse1 o fuse2
# (order reversed). The softmax gate g zeroes every gated row's contribution,
# letting the saved gated probabilities P stand in for the raw softmax q in
# the backward (rows with g=0 have dq = 0 and dS is re-gated by g).
# --------------------------------------------------------------------------


def _patches_l(x, k):
    """(B, H, W, C) -> (B, H*W, k*k*C) stride-1 SAME patches (ky,kx,c order)."""
    from .contextual_attention import extract_patches

    b = x.shape[0]
    return extract_patches(x, k, 1).reshape(b, x.shape[1] * x.shape[2], -1)


def _patches_l_adjoint(dpat, h, w, c, k):
    """Adjoint of _patches_l: overlap-add the k*k shifted gradient planes."""
    b = dpat.shape[0]
    d = dpat.reshape(b, h, w, k, k, c)
    pad = (k - 1) // 2
    out = jnp.zeros((b, h + 2 * pad + (k - 1) % 2, w + 2 * pad + (k - 1) % 2, c), dpat.dtype)
    for dy in range(k):
        for dx in range(k):
            out = out.at[:, dy : dy + h, dx : dx + w, :].add(d[:, :, :, dy, dx, :])
    return out[:, pad : pad + h, pad : pad + w, :]


def _fuse_ops(wd):
    from .contextual_attention import _fuse_diag, _perm

    def fuse_fwd(s):  # fuse2(fuse1(s)) over (B, L, P)
        s = _fuse_diag(s)
        return s + _perm(_perm(s, wd, 1, +1), wd, 2, +1) + _perm(_perm(s, wd, 1, -1), wd, 2, -1)

    def fuse_adj(s):  # fuse1(fuse2(s)) — the transpose
        s = s + _perm(_perm(s, wd, 1, +1), wd, 2, +1) + _perm(_perm(s, wd, 1, -1), wd, 2, -1)
        return _fuse_diag(s)

    return fuse_fwd, fuse_adj


def _attention_v2_bwd_kernel(hd, wd, scale, r_tile, interpret, c_real,
                             fd_ref, bd_ref, bph_ref, dyph_ref, p_ref,
                             s_in_ref, n_ref, mm_ref,
                             dfd_ref, dbd_ref, dbph_ref, a_ref, b_ref):
    """Adjoint of _attention_v2_kernel, VMEM-resident per sample.

    Consumes the forward's residuals (probs, s, nrm_raw) and dy's 2x2 phase
    planes; produces dfd, dbd and dbph (phase planes of db_full). Mirrors the
    forward's structure: 16 shifted matmuls for the paste adjoints, softmax
    backward on (L, P) in VMEM, the two fuse sweeps applied in reverse order
    (each sweep is self-adjoint), and 9+9 shifted matmuls for the score
    backward. Matmul operands stay in the input dtype (bf16 in training)."""
    num_l = hd * wd
    nt = num_l // r_tile
    f32 = jnp.float32
    fdv = fd_ref[0]  # (hd, wd, c) in the input dtype
    bdv = bd_ref[0]
    mt = fdv.dtype
    c = fdv.shape[-1]
    dn = (((1,), (1,)), ((), ()))  # contract last dims
    pv = p_ref[0]  # (L, P) f32 gated softmax probs
    probs_mt = pv.astype(mt)

    # --- paste adjoints: dprobs + dbph. Same offset-pair lane packing as
    # the forward (the channel lanes are zero-padded to 128): the two column
    # offsets of a row share one matmul — K-packed for dprobs (the pair
    # contraction IS the accumulation), N-packed for draw (results land in
    # disjoint lane halves; garbage stays in the discarded pad lanes).
    # 16+16 matmuls become 8+8. ---
    packed = 2 * c_real <= c
    dprobs = jnp.zeros((num_l, num_l), f32)
    for r in range(2):
        a_vals = [0, 1] if r == 0 else [-1, 0]
        for s_ in range(2):
            bb_vals = [0, 1] if s_ == 0 else [-1, 0]
            dacc = (dyph_ref[0, r, s_].astype(f32) / 4.0).astype(mt)
            dbp = jnp.zeros((hd, wd, c), f32)
            for a in a_vals:
                if packed:
                    dout_o = _pack2(
                        dacc, (a, bb_vals[0]), (a, bb_vals[1]),
                        num_l, c, c_real, interpret,
                    )
                    raw_o = _pack2(
                        bph_ref[0, r, s_], (a, bb_vals[0]), (a, bb_vals[1]),
                        num_l, c, c_real, interpret,
                    )
                    dprobs = dprobs + jax.lax.dot_general(
                        raw_o, dout_o, dimension_numbers=dn,
                        preferred_element_type=f32,
                    )
                    draw = jax.lax.dot_general(
                        probs_mt, dout_o,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )  # (L, c): lane halves = the two column offsets
                    dbp = dbp + _shift2d(draw.reshape(hd, wd, c), -a, -bb_vals[0])
                    dbp = dbp + _shift2d(
                        _unpack_hi(draw, c, c_real, interpret).reshape(hd, wd, c),
                        -a, -bb_vals[1],
                    )
                else:
                    for bb in bb_vals:
                        # fwd: acc += shift2d(out_o, -a, -bb); out_o = P^T raw_o
                        dout_o = _shift2d(dacc, a, bb).reshape(num_l, c)
                        raw_o = _shift2d(bph_ref[0, r, s_], a, bb).reshape(num_l, c)
                        dprobs = dprobs + jax.lax.dot_general(
                            raw_o, dout_o, dimension_numbers=dn,
                            preferred_element_type=f32,
                        )
                        draw = jax.lax.dot_general(
                            probs_mt, dout_o,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=f32,
                        )  # (L, c)
                        dbp = dbp + _shift2d(draw.reshape(hd, wd, c), -a, -bb)
            dbph_ref[0, r, s_] = dbp.astype(dbph_ref.dtype)

    # --- softmax (+row gate) backward, all VMEM-resident ---
    g_rows = mm_ref[0]  # (L, 1) f32
    dq = dprobs * g_rows
    tcol = jnp.sum(pv * dq, axis=0, keepdims=True)  # (1, P)
    a_ref[:] = pv * (dq - tcol) * g_rows * scale  # dfused

    # --- fuse adjoint: the two self-adjoint sweeps in reverse order ---
    # fuse2-type sweep (permuted +-wd), a_ref -> b_ref
    for t in range(nt):
        r0 = t * r_tile
        cur = a_ref[r0 : r0 + r_tile, :]
        if r0 + r_tile + wd <= num_l:
            plus = a_ref[r0 + wd : r0 + wd + r_tile, :]
        else:
            parts = []
            if num_l - wd - r0 > 0:
                parts.append(a_ref[r0 + wd : num_l, :])
            parts.append(a_ref[1:wd, :])
            parts.append(jnp.zeros_like(cur[:1]))
            plus = jax.lax.concatenate(parts, 0)
        if r0 >= wd:
            minus = a_ref[r0 - wd : r0 - wd + r_tile, :]
        else:
            parts = [jnp.zeros_like(cur[:1])]
            parts.append(a_ref[num_l - wd : num_l - 1, :])
            parts.append(a_ref[0 : r_tile - wd, :])
            minus = jax.lax.concatenate(parts, 0)
        b_ref[r0 : r0 + r_tile, :] = (
            cur
            + _col_perm_plus(plus, wd, interpret)
            + _col_perm_minus(minus, wd, interpret)
        )
    # fuse1-type sweep (diagonal +-1), b_ref -> a_ref
    for t in range(nt):
        r0 = t * r_tile
        cur = b_ref[r0 : r0 + r_tile, :]
        up = (
            jax.lax.concatenate([jnp.zeros_like(cur[:1]), b_ref[0 : r_tile - 1, :]], 0)
            if t == 0 else b_ref[r0 - 1 : r0 + r_tile - 1, :]
        )
        dnr = (
            jax.lax.concatenate([b_ref[r0 + 1 : num_l, :], jnp.zeros_like(cur[:1])], 0)
            if t == nt - 1 else b_ref[r0 + 1 : r0 + r_tile + 1, :]
        )
        a_ref[r0 : r0 + r_tile, :] = (
            cur + _col_shift(up, -1, interpret) + _col_shift(dnr, +1, interpret)
        )

    # --- norm backward + score backward (9+9 offset matmuls) ---
    nrm_raw = n_ref[0]  # (L, 1) f32
    nrm = jnp.maximum(nrm_raw, 1e-4)
    ds = a_ref[:]
    ds0_mt = (ds / nrm).astype(mt)
    dn_col = -jnp.sum(ds * s_in_ref[0], axis=1, keepdims=True) / nrm
    dnrm2 = jnp.where(nrm_raw > 1e-4, dn_col * 0.5 / jnp.maximum(nrm_raw, 1e-12), 0.0)
    dn_grid = dnrm2.reshape(hd, wd, 1)
    acc_n = jnp.zeros((hd, wd, 1), f32)
    for dy in range(3):
        for dx in range(3):
            acc_n = acc_n + _shift2d(dn_grid, -(dy - 1), -(dx - 1))
    dfd = jnp.zeros((hd, wd, c), f32)
    dbd = 2.0 * bdv.astype(f32) * acc_n
    # N-packed offset pairs, as the forward's score stage: 9+9 matmuls -> 5+5
    offs = [(dy - 1, dx - 1) for dy in range(3) for dx in range(3)]
    groups = (
        [offs[i : i + 2] for i in range(0, 8, 2)] + [offs[8:]]
        if packed else [[o] for o in offs]
    )
    for g in groups:
        if len(g) == 2:
            f_o = _pack2(fdv, g[0], g[1], num_l, c, c_real, interpret)
            b_o = _pack2(bdv, g[0], g[1], num_l, c, c_real, interpret)
        else:
            f_o = _shift2d(fdv, g[0][0], g[0][1]).reshape(num_l, c)
            b_o = _shift2d(bdv, g[0][0], g[0][1]).reshape(num_l, c)
        dF = jax.lax.dot_general(
            ds0_mt, b_o, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (P, c)
        dB = jax.lax.dot_general(
            ds0_mt, f_o, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (L, c)
        dfd = dfd + _shift2d(dF.reshape(hd, wd, c), -g[0][0], -g[0][1])
        dbd = dbd + _shift2d(dB.reshape(hd, wd, c), -g[0][0], -g[0][1])
        if len(g) == 2:
            dF2 = _unpack_hi(dF, c, c_real, interpret).reshape(hd, wd, c)
            dB2 = _unpack_hi(dB, c, c_real, interpret).reshape(hd, wd, c)
            dfd = dfd + _shift2d(dF2, -g[1][0], -g[1][1])
            dbd = dbd + _shift2d(dB2, -g[1][0], -g[1][1])
    dfd_ref[0] = dfd.astype(dfd_ref.dtype)
    dbd_ref[0] = dbd.astype(dbd_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("hd", "wd", "scale", "interpret")
)
def attention_v2_bwd(fd, bd, b_full, dy, probs, s, nrm_raw, mm, hd, wd,
                     scale=10.0, interpret=False):
    """Pallas backward: adjoint of attention_v2 from its saved residuals.
    Returns (dfd, dbd, db_full)."""
    bs, _, _, c_in = fd.shape
    num_l = hd * wd
    r_tile = 128 if num_l % 128 == 0 else num_l
    c_pad = (-c_in) % 128
    if c_pad:
        pad4 = ((0, 0), (0, 0), (0, 0), (0, c_pad))
        fd = jnp.pad(fd, pad4)
        bd = jnp.pad(bd, pad4)
        b_full = jnp.pad(b_full, pad4)
        dy = jnp.pad(dy, pad4)
    c = c_in + c_pad
    bph = b_full.reshape(bs, hd, 2, wd, 2, c).transpose(0, 2, 4, 1, 3, 5)
    dyph = dy.reshape(bs, hd, 2, wd, 2, c).transpose(0, 2, 4, 1, 3, 5)
    kernel = functools.partial(
        _attention_v2_bwd_kernel, hd, wd, scale, r_tile, interpret, c_in
    )
    big = pl.BlockSpec((1, num_l, num_l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    feat = pl.BlockSpec((1, hd, wd, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    ph = pl.BlockSpec((1, 2, 2, hd, wd, c), lambda i: (i, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, num_l, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dfd, dbd, dbph = pl.pallas_call(
        kernel,
        grid=(bs,),
        in_specs=[feat, feat, ph, ph, big, big, col, col],
        out_specs=[feat, feat, ph],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hd, wd, c), fd.dtype),
            jax.ShapeDtypeStruct((bs, hd, wd, c), bd.dtype),
            jax.ShapeDtypeStruct((bs, 2, 2, hd, wd, c), b_full.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_l, num_l), jnp.float32),
            pltpu.VMEM((num_l, num_l), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        fd, bd, bph, dyph, probs.astype(jnp.float32), s.astype(jnp.float32),
        nrm_raw.astype(jnp.float32), mm[..., None].astype(jnp.float32),
    )
    db_full = dbph.transpose(0, 3, 1, 4, 2, 5).reshape(bs, 2 * hd, 2 * wd, c)
    return dfd[..., :c_in], dbd[..., :c_in], db_full[..., :c_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def attention_v2_diff(fd, bd, b_full, mm, hd, wd, scale):
    """Differentiable fused attention: v2 kernel forward, analytic backward."""
    return attention_v2(fd, bd, b_full, mm, hd, wd, scale)


def _att_fwd(fd, bd, b_full, mm, hd, wd, scale):
    y, s, probs, nrm_raw = attention_v2(
        fd, bd, b_full, mm, hd, wd, scale, emit_residuals=True
    )
    return y, (fd, bd, b_full, mm, s, probs, nrm_raw)


def _att_bwd(hd, wd, scale, res, dy):
    """Backward dispatch: the Pallas adjoint kernel (VMEM-resident, always
    used in production — pallas attention itself is only enabled on TPU) or
    the XLA formulation (_att_bwd_xla). The flag exists for tests/debugging:
    tests flip it (with the kernel in interpret mode) to pin the two
    backward paths equal; there is no runtime backend dispatch."""
    if _USE_BWD_KERNEL:
        fd, bd, b_full, mm, s, probs, nrm_raw = res
        dfd, dbd, db_full = attention_v2_bwd(
            fd, bd, b_full, dy, probs, s, nrm_raw, mm, hd, wd, scale
        )
        return dfd, dbd, db_full, jnp.zeros_like(mm)
    return _att_bwd_xla(hd, wd, scale, res, dy)


_USE_BWD_KERNEL = True


def _att_bwd_xla(hd, wd, scale, res, dy):
    from .contextual_attention import extract_patches

    fd, bd, b_full, mm, s, probs, nrm_raw = res
    bs, _, _, c = fd.shape
    num_l = hd * wd
    f32 = jnp.float32
    # Matmul operands stay in the INPUT dtype (bf16 in training) so the MXU
    # runs its native bf16 x bf16 -> f32 mode. s / probs / nrm_raw are the
    # forward kernel's own VMEM intermediates written out as residuals —
    # recomputing them here (patch einsum + fuse sweeps + softmax) measured
    # ~17 ms at batch 64 (experiments/bwd_stage_prof.py).
    mt = fd.dtype

    fpat = _patches_l(fd, 3)  # (B, L, 9C) in mt
    wpat = _patches_l(bd, 3)
    wpat32 = wpat.astype(f32)
    nrm = jnp.maximum(nrm_raw, 1e-4)
    _, fuse_adj = _fuse_ops(wd)
    g = mm.astype(f32)[:, :, None]  # (B, L, 1)

    raw = extract_patches(b_full, 4, 2).reshape(bs, num_l, -1)  # (B, L, 16C) mt

    # paste/fold adjoints. The (B, L, P) chain dprobs -> dq -> dz -> dfused ->
    # ds stays in mt: at bf16 that halves the HBM traffic of the elementwise
    # fuse/softmax-backward sweeps (the backward's cost is bandwidth, not
    # flops — bwd_stage_prof.py); reductions accumulate in f32 via einsum.
    probs_mt = probs.astype(mt)
    dv = (extract_patches(dy, 4, 2).reshape(bs, num_l, -1) / 4.0).astype(mt)
    dprobs = jnp.einsum("blr,bpr->blp", raw, dv, preferred_element_type=mt)
    draw = jnp.einsum("blp,bpr->blr", probs_mt, dv, preferred_element_type=f32)
    from .contextual_attention import _fold_overlap_add

    db_full = _fold_overlap_add(
        draw.reshape(bs, hd, wd, 4, 4, c), 2 * hd, 2 * wd, 2, 4
    ) * 4.0

    # softmax (+gate) backward (softmax is over axis=1, the l rows)
    g_mt = g.astype(mt)
    dq = dprobs * g_mt
    colsum = jnp.einsum("blp,blp->bp", probs_mt, dq, preferred_element_type=f32)
    dz = probs_mt * (dq - colsum[:, None, :].astype(mt))
    dfused = dz * g_mt * jnp.asarray(scale, mt)
    ds = fuse_adj(dfused)  # mt

    # norm backward
    ds0 = ds * (1.0 / nrm).astype(mt)
    dn = (
        -jnp.einsum("blp,blp->bl", ds, s.astype(mt), preferred_element_type=f32)[
            ..., None
        ]
        / nrm
    )  # (B, L, 1)
    dnrm2 = jnp.where(nrm_raw > 1e-4, dn * 0.5 / jnp.maximum(nrm_raw, 1e-12), 0.0)
    dwpat_n = 2.0 * wpat32 * dnrm2

    # score matmul backward
    dfpat = jnp.einsum("blp,blk->bpk", ds0, wpat, preferred_element_type=f32)
    dwpat = jnp.einsum("blp,bpk->blk", ds0, fpat, preferred_element_type=f32) + dwpat_n

    dfd = _patches_l_adjoint(dfpat, hd, wd, c, 3)
    dbd = _patches_l_adjoint(dwpat, hd, wd, c, 3)
    return (dfd.astype(fd.dtype), dbd.astype(bd.dtype),
            db_full.astype(b_full.dtype), jnp.zeros_like(mm))


attention_v2_diff.defvjp(_att_fwd, _att_bwd)
