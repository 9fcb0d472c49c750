#!/usr/bin/env python
"""Measure dense vs space-to-depth execution of the generator's 256^2 conv
segments on the real TPU (tunneled). Not part of the test suite."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.ops import s2d
from healthivert_tpu.ops.image import resize_nearest

DT = jnp.bfloat16


def conv(x, w, stride=1, pads=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pads, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def elu(x):
    return jax.nn.elu(x)


def make_weights(rng, shapes):
    return [jnp.asarray(rng.standard_normal(s).astype(np.float32), DT) for s in shapes]


def timeit(fn, args, iters=20, reps=2):
    out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))  # warm + barrier
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    for B in (64, 256):
        print(f"==== batch {B} ====", flush=True)
        z128 = jnp.asarray(rng.standard_normal((B, 128, 128, 32)).astype(np.float32), DT)
        cam = jnp.asarray(rng.standard_normal((B, 256, 256, 1)).astype(np.float32), DT)

        # decoder chain: upsample -> conv19(33->32) -> conv15(32->16) ->
        # conv16(16->8) -> conv17(8->1), conv18(8->1)
        w19, w15, w16, w17, w18 = make_weights(
            rng, [(3, 3, 33, 32), (3, 3, 32, 16), (3, 3, 16, 8), (3, 3, 8, 1), (3, 3, 8, 1)]
        )

        @jax.jit
        def dec_dense(z128, cam, w19, w15, w16, w17, w18):
            z = resize_nearest(z128, 256, 256)
            z = elu(conv(jnp.concatenate([z, cam], -1), w19))
            z = elu(conv(z, w15))
            z = elu(conv(z, w16))
            return jnp.clip(conv(z, w17), -1, 1), jax.nn.sigmoid(conv(z, w18))

        @jax.jit
        def dec_s2d(z128, cam, w19, w15, w16, w17, w18):
            zs = s2d.upsample2x_as_s2d(z128)
            cams = s2d.space_to_depth(cam)
            z = elu(conv(jnp.concatenate([zs, cams], -1), s2d.kernel_s2d_s2d(w19)))
            z = elu(conv(z, s2d.kernel_s2d_s2d(w15)))
            z = elu(conv(z, s2d.kernel_s2d_s2d(w16)))
            a = s2d.depth_to_space(conv(z, s2d.kernel_s2d_s2d(w17)))
            b = s2d.depth_to_space(conv(z, s2d.kernel_s2d_s2d(w18)))
            return jnp.clip(a, -1, 1), jax.nn.sigmoid(b)

        # s2d but with the two heads fused into one N=8 conv
        w1718 = jnp.concatenate([w17, w18], -1)

        @jax.jit
        def dec_s2d_fused(z128, cam, w19, w15, w16, w1718):
            zs = s2d.upsample2x_as_s2d(z128)
            cams = s2d.space_to_depth(cam)
            z = elu(conv(jnp.concatenate([zs, cams], -1), s2d.kernel_s2d_s2d(w19)))
            z = elu(conv(z, s2d.kernel_s2d_s2d(w15)))
            z = elu(conv(z, s2d.kernel_s2d_s2d(w16)))
            ab = s2d.depth_to_space(conv(z, s2d.kernel_s2d_s2d(w1718)))
            return jnp.clip(ab[..., :1], -1, 1), jax.nn.sigmoid(ab[..., 1:])

        t_dense = timeit(dec_dense, (z128, cam, w19, w15, w16, w17, w18))
        print(f"decoder dense:     {t_dense:8.2f} ms", flush=True)
        t_s2d = timeit(dec_s2d, (z128, cam, w19, w15, w16, w17, w18))
        print(f"decoder s2d:       {t_s2d:8.2f} ms  ({t_dense / t_s2d:.2f}x)", flush=True)
        t_s2df = timeit(dec_s2d_fused, (z128, cam, w19, w15, w16, w1718))
        print(f"decoder s2d fused: {t_s2df:8.2f} ms  ({t_dense / t_s2df:.2f}x)", flush=True)

        # parity check (f32 on TPU)
        z32, c32 = z128.astype(jnp.float32), cam.astype(jnp.float32)
        ws = [w.astype(jnp.float32) for w in (w19, w15, w16, w17, w18)]
        a0, b0 = dec_dense(z32, c32, *ws)
        a1, b1 = dec_s2d(z32, c32, *ws)
        d = max(float(jnp.max(jnp.abs(a0 - a1))), float(jnp.max(jnp.abs(b0 - b1))))
        print(f"decoder parity max|diff| = {d:.2e}", flush=True)

        # encoder: conv1 5x5 (3->16) + conv2_downsample (16->32 s2)
        x = jnp.asarray(rng.standard_normal((B, 256, 256, 3)).astype(np.float32), DT)
        w1, w2 = make_weights(rng, [(5, 5, 3, 16), (3, 3, 16, 32)])

        @jax.jit
        def enc_dense(x, w1, w2):
            z = elu(conv(x, w1, pads=((2, 2), (2, 2))))
            return (elu(conv(z, w2, stride=2)),)

        @jax.jit
        def enc_s2d(x, w1, w2):
            xs = s2d.space_to_depth(x)
            z = elu(conv(xs, s2d.kernel_s2d_s2d(w1)))
            return (elu(conv(z, s2d.kernel_s2d_down(w2), pads=((1, 0), (1, 0)))),)

        t_ed = timeit(enc_dense, (x, w1, w2))
        t_es = timeit(enc_s2d, (x, w1, w2))
        print(f"encoder dense: {t_ed:8.2f} ms   s2d: {t_es:8.2f} ms  ({t_ed / t_es:.2f}x)", flush=True)
        e0 = enc_dense(x.astype(jnp.float32), w1.astype(jnp.float32), w2.astype(jnp.float32))[0]
        e1 = enc_s2d(x.astype(jnp.float32), w1.astype(jnp.float32), w2.astype(jnp.float32))[0]
        print(f"encoder parity max|diff| = {float(jnp.max(jnp.abs(e0 - e1))):.2e}", flush=True)


if __name__ == "__main__":
    main()
