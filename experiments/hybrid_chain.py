#!/usr/bin/env python
"""Full coarse-decoder chain: dense vs hybrid-s2d (conv19 as an s2d-output
conv from the half-res input with phase-combined taps, conv15/16/17/18 in
the s2d domain, depth-to-space only on the 1-channel heads)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.ops import s2d
from healthivert_tpu.ops.image import resize_nearest

import sys
sys.path.insert(0, "/root/repo/experiments")
from upconv_bench import kernel_up_s2d  # noqa: E402


def conv(x, w, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray((0.05 * rng.standard_normal(s)).astype(np.float32), jnp.bfloat16)
    for B in (64, 256):
        z128 = jnp.asarray((0.1 * rng.standard_normal((B, 128, 128, 32))).astype(np.float32), jnp.bfloat16)
        cam = jnp.asarray(rng.random((B, 256, 256, 1)).astype(np.float32), jnp.bfloat16)
        w19, w15, w16, w17, w18 = (
            mk((3, 3, 33, 32)), mk((3, 3, 32, 16)), mk((3, 3, 16, 8)),
            mk((3, 3, 8, 1)), mk((3, 3, 8, 1)),
        )

        @jax.jit
        def dense(z128, cam, w19, w15, w16, w17, w18):
            z = jnp.concatenate([resize_nearest(z128, 256, 256), cam], -1)
            z = jax.nn.elu(conv(z, w19))
            z = jax.nn.elu(conv(z, w15))
            z = jax.nn.elu(conv(z, w16))
            return jnp.clip(conv(z, w17), -1, 1), jax.nn.sigmoid(conv(z, w18))

        w19u = kernel_up_s2d(np.asarray(w19, np.float32), 32)
        w15s = s2d.kernel_s2d_s2d(w15.astype(jnp.float32))
        w16s = s2d.kernel_s2d_s2d(w16.astype(jnp.float32))
        w1718s = s2d.kernel_s2d_s2d(jnp.concatenate([w17, w18], -1).astype(jnp.float32))

        def hybrid_f(z128, cam, w19u, w15s, w16s, w1718s):
            x = jnp.concatenate([z128, s2d.space_to_depth(cam)], -1)
            z = jax.nn.elu(conv(x, w19u))
            z = jax.nn.elu(conv(z, w15s))
            z = jax.nn.elu(conv(z, w16s))
            heads = s2d.depth_to_space(conv(z, w1718s))  # (B,256,256,2)
            return jnp.clip(heads[..., :1], -1, 1), jax.nn.sigmoid(heads[..., 1:])

        hybrid = jax.jit(hybrid_f)

        td = timeit(dense, z128, cam, w19, w15, w16, w17, w18)
        th = timeit(hybrid, z128, cam, w19u.astype(jnp.bfloat16), w15s.astype(jnp.bfloat16),
                    w16s.astype(jnp.bfloat16), w1718s.astype(jnp.bfloat16))

        a0, b0 = dense(z128.astype(jnp.float32), cam.astype(jnp.float32),
                       *[w.astype(jnp.float32) for w in (w19, w15, w16, w17, w18)])
        a1, b1 = hybrid(z128.astype(jnp.float32), cam.astype(jnp.float32),
                        w19u, w15s, w16s, w1718s)
        err = max(float(jnp.max(jnp.abs(a0 - a1))), float(jnp.max(jnp.abs(b0 - b1))))
        print(f"B={B}: dense {td:6.2f} ms | hybrid-s2d {th:6.2f} ms "
              f"({td/th:.2f}x) | parity {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
