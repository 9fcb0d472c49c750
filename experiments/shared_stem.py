#!/usr/bin/env python
"""Shared fine-stage input stem: measured cost of the duplicated encoders
(VERDICT r2 weak #4 / next #7).

The reference's FineGenerator runs TWO parallel trunks over the same input
concat [x, coarse_seg, mask, ratio] (inpaint_networks.py:181-205): the
hallucination branch (conv1..conv4_downsample) and the attention branch
(pmconv1..pmconv4_downsample) each re-encode 256^2 -> 64^2 with their own
weights. This script times the duplicated stem against a single shared stem
at bench shapes to bound what a (non-parity, opt-in) shared-stem variant
could save.

Usage: python -u experiments/shared_stem.py [batch ...]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")


def conv(x, w, stride=1, dil=1):
    pad = ((w.shape[0] - 1) * dil // 2,) * 2
    return jax.nn.elu(
        jax.lax.conv_general_dilated(
            x, w, (stride, stride), [pad, pad], rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )


def stem_weights(rng, c=16, cin=4, dtype=jnp.bfloat16):
    k = iter(jax.random.split(rng, 8))
    mk = lambda kh, ci, co: (
        jax.random.normal(next(k), (kh, kh, ci, co), dtype) * 0.05
    )
    return [mk(5, cin, c), mk(3, c, c), mk(3, c, 2 * c), mk(3, 2 * c, 4 * c)]


def run_stem(x, ws):
    h = conv(x, ws[0])
    h = conv(h, ws[1], stride=2)
    h = conv(h, ws[2])
    return conv(h, ws[3], stride=2)


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
    batches = [int(a) for a in _sys.argv[1:]] or [64, 256]
    rng = jax.random.PRNGKey(0)
    wa = stem_weights(jax.random.fold_in(rng, 1))
    wb = stem_weights(jax.random.fold_in(rng, 2))

    @jax.jit
    def dual(x):
        return run_stem(x, wa) + run_stem(x, wb)

    @jax.jit
    def shared(x):
        return run_stem(x, wa) * 2.0  # same arithmetic shape, one encode

    for bs in batches:
        x = jax.random.normal(jax.random.fold_in(rng, bs), (bs, 256, 256, 4), jnp.bfloat16)
        td = timeit(dual, x)
        ts = timeit(shared, x)
        print(
            f"batch {bs:4d}: dual stems {td:7.2f} ms, shared {ts:7.2f} ms "
            f"-> saving {td - ts:.2f} ms/dispatch ({(td-ts)/bs*1e3:.1f} us/slice)",
            flush=True,
        )


if __name__ == "__main__":
    main()
