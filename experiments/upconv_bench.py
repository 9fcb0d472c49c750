#!/usr/bin/env python
"""Measure the 'upsample-conv' rewrite: conv(concat([resize2x(z), cam]))
computed as one s2d-output conv from the HALF-RES input (phase-combined
taps on the z part — the nearest-upsample redundancy merges w taps landing
on the same source cell — plus standard s2d taps on the cam part).
FLOP-reducing AND tile-friendly; validated for parity, then timed."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.ops import s2d
from healthivert_tpu.ops.image import resize_nearest


def conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _up_taps(d, a):
    """w-tap indices u whose upsampled row 2i+d+u-1 falls in source cell i+a."""
    return [u for u in range(3) if (d + u - 1) // 2 == a]


def kernel_up_s2d(w, cz):
    """w: (3,3,C,F) conv on [resize2x(z) (cz ch), dense full-res rest].
    Returns (3,3, cz + 4*(C-cz), 4F): an s2d-output conv consuming
    [z half-res (cz ch), s2d(rest) (4*(C-cz) ch)], channel-major phases."""
    C, F = w.shape[2], w.shape[3]
    cr = C - cz
    out = np.zeros((3, 3, cz + 4 * cr, 4 * F), np.float32)
    wn = np.asarray(w, np.float32)
    for di in range(2):
        for dj in range(2):
            ph = di * 2 + dj
            # z part: combine taps landing on the same source cell
            for a in range(-1, 2):
                for a2 in range(-1, 2):
                    acc = sum(
                        wn[u, v, :cz, :]
                        for u in _up_taps(di, a)
                        for v in _up_taps(dj, a2)
                    )
                    if np.isscalar(acc):
                        continue
                    out[a + 1, a2 + 1, :cz, ph::4] += acc
            # rest: standard s2d->s2d taps
            for u in range(3):
                a, b = divmod(di + u - 1, 2)
                for v in range(3):
                    a2, b2 = divmod(dj + v - 1, 2)
                    out[a + 1, a2 + 1, cz + (b * 2 + b2)::4, ph::4] += wn[u, v, cz:, :]
    return jnp.asarray(out)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    for B in (64, 256):
        z = jnp.asarray((0.1 * rng.standard_normal((B, 128, 128, 32))).astype(np.float32), jnp.bfloat16)
        cam = jnp.asarray(rng.random((B, 256, 256, 1)).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray((0.05 * rng.standard_normal((3, 3, 33, 32))).astype(np.float32), jnp.bfloat16)
        wu = kernel_up_s2d(np.asarray(w, np.float32), 32).astype(jnp.bfloat16)

        @jax.jit
        def dense(z, cam, w):
            x = jnp.concatenate([resize_nearest(z, 256, 256), cam], -1)
            return jax.nn.elu(conv(x, w))

        @jax.jit
        def upconv(z, cam, wu):
            x = jnp.concatenate([z, s2d.space_to_depth(cam)], -1)
            return jax.nn.elu(s2d.depth_to_space(conv(x, wu)))

        # same, but leaving output in s2d layout (next layer could consume it)
        @jax.jit
        def upconv_stay(z, cam, wu):
            x = jnp.concatenate([z, s2d.space_to_depth(cam)], -1)
            return jax.nn.elu(conv(x, wu))

        td = timeit(dense, z, cam, w)
        tu = timeit(upconv, z, cam, wu)
        ts = timeit(upconv_stay, z, cam, wu)
        # parity in f32
        a = dense(z.astype(jnp.float32), cam.astype(jnp.float32), w.astype(jnp.float32))
        b = upconv(z.astype(jnp.float32), cam.astype(jnp.float32),
                   kernel_up_s2d(np.asarray(w, np.float32), 32))
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"B={B}: dense {td:6.2f} ms | up-s2d {tu:6.2f} ms ({td/tu:.2f}x) | "
              f"stay-s2d {ts:6.2f} ms ({td/ts:.2f}x) | parity {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
