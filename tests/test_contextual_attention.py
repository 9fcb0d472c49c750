"""Contextual attention vs a naive from-the-math numpy implementation that
mirrors the reference algorithm (per-sample loops, explicit fuse convs)."""

import numpy as np
import jax.numpy as jnp

from healthivert_tpu.ops.contextual_attention import contextual_attention, extract_patches


def _np_nearest_down(x, factor):
    return x[:, ::factor, ::factor, :]


def _np_patches(x, k, s):
    """SAME-padded k x k patches, stride s, row-major; (B, L, k, k, C)."""
    b, h, w, c = x.shape
    oh, ow = -(-h // s), -(-w // s)
    ph = max(0, (oh - 1) * s + k - h)
    pw = max(0, (ow - 1) * s + k - w)
    xp = np.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
    out = np.zeros((b, oh * ow, k, k, c), x.dtype)
    for i in range(oh):
        for j in range(ow):
            out[:, i * ow + j] = xp[:, i * s : i * s + k, j * s : j * s + k, :]
    return out


def _np_fuse(y):
    """identity-kernel 3x3 conv on (N, M) image."""
    n, m = y.shape
    yp = np.pad(y, 1)
    return yp[:-2, :-2] + yp[1:-1, 1:-1] + yp[2:, 2:]


def _np_contextual_attention(f, b, mask, rate=2, scale=10.0):
    bs, h, w, c = f.shape
    k = 2 * rate
    raw = _np_patches(b, k, rate)  # (B, L, 4, 4, C)
    fd = _np_nearest_down(f, rate)
    bd = _np_nearest_down(b, rate)
    hd, wd = fd.shape[1:3]
    L = hd * wd
    wp = _np_patches(bd, 3, 1)
    md = _np_nearest_down(mask, 4 * rate)
    mp = _np_patches(md, 3, 1)
    mm = (mp.mean(axis=(2, 3, 4)) == 0).astype(np.float64)  # (B, L)

    ys = []
    for i in range(bs):
        wn = wp[i] / np.maximum(
            np.sqrt((wp[i] ** 2).sum(axis=(1, 2, 3), keepdims=True)), 1e-4
        )
        fpat = _np_patches(fd[i : i + 1], 3, 1)[0].reshape(L, -1)
        scores = wn.reshape(L, -1) @ fpat.T  # (L, P)
        # fuse pass 1
        scores = _np_fuse(scores)
        # block transpose, fuse pass 2, transpose back
        s5 = scores.reshape(hd, wd, hd, wd).transpose(1, 0, 3, 2).reshape(L, L)
        s5 = _np_fuse(s5)
        scores = s5.reshape(wd, hd, wd, hd).transpose(1, 0, 3, 2).reshape(L, L)
        g = mm[i][:, None]
        e = np.exp(scores * g * scale - (scores * g * scale).max(axis=0, keepdims=True))
        probs = e / e.sum(axis=0, keepdims=True) * g
        # paste: transposed conv stride=rate, padding=1, kernel raw patches, /4
        out = np.zeros((h + 2, w + 2, c))
        for l in range(L):
            ph_, pw_ = divmod(l, wd)
            pass  # raw patch l pastes at every p weighted by probs[l, p]
        vals = np.einsum("lp,lyxc->pyxc", probs, raw[i])  # (P, 4, 4, C)
        for p in range(L):
            py, px = divmod(p, wd)
            out[py * rate : py * rate + k, px * rate : px * rate + k] += vals[p]
        ys.append(out[1 : 1 + h, 1 : 1 + w] / 4.0)
    return np.stack(ys)


def test_extract_patches_matches_numpy(rng):
    x = rng.random((2, 8, 8, 3)).astype(np.float32)
    for k, s in [(3, 1), (4, 2)]:
        got = np.asarray(extract_patches(jnp.asarray(x), k, s))
        want = _np_patches(x, k, s)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_attention_matches_naive(rng):
    bs, h, w, c = 2, 16, 16, 4
    f = rng.standard_normal((bs, h, w, c)).astype(np.float32)
    mask = np.zeros((bs, h * 4, w * 4, 1), np.float32)
    mask[:, 20:44] = 1.0  # hole band
    got = contextual_attention(jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask))
    want = _np_contextual_attention(
        f.astype(np.float64), f.astype(np.float64), mask.astype(np.float64)
    )
    np.testing.assert_allclose(np.asarray(got.y), want, rtol=1e-4, atol=1e-4)


def test_attention_identity_property(rng):
    """With no mask and f==b, each position's best match is itself (after
    normalization the diagonal dominates), so output correlates with input."""
    f = rng.standard_normal((1, 16, 16, 8)).astype(np.float32) * 3
    mask = np.zeros((1, 64, 64, 1), np.float32)
    out = contextual_attention(jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask), compute_offsets=True)
    off = np.asarray(out.offsets)[0]  # (8, 8, 2)
    iy, ix = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    # most positions should attend to themselves
    self_frac = ((off[..., 0] == iy) & (off[..., 1] == ix)).mean()
    assert self_frac > 0.5, self_frac


def test_attention_differentiable(rng):
    import jax

    f = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    mask = jnp.zeros((1, 64, 64, 1))

    def loss(f):
        return contextual_attention(f, f, mask).y.sum()

    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
