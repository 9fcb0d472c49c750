#!/usr/bin/env python
"""Measure the generation-eval metric batching win (r3).

The reference computes PSNR/SSIM per slice (4 skimage calls per z,
evaluation/generation_eval_sagittal.py:70-94); our first port mirrored that
with 4 device dispatches + scalar fetches per slice. evaluation/generation.py
now batches a volume's slices into ~2-6 dispatches via ops.image.psnr_ssim_batch.
This script times both formulations on the same synthetic volume.

Run on CPU:  python experiments/geneval_bench.py --cpu
Run on TPU:  python -u experiments/geneval_bench.py   (tunneled: expect the
             per-slice path to be dominated by ~0.5-1 s RTT per dispatch)
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    import numpy as np

    from healthivert_tpu.evaluation import generation as G

    rng = np.random.default_rng(0)
    n_slices, h, w = 40, 256, 256
    # fresh content per rep so the tunnel's content-addressed H2D cache
    # cannot hide transfer costs (CLAUDE.md)
    def fresh_rows(seed):
        r = np.random.default_rng(seed)
        a = r.normal(100, 40, (n_slices, h, w))
        b = a + r.normal(0, 5, a.shape)
        return [(a[i], b[i], float(a[i].max() - a[i].min())) for i in range(n_slices)]

    # warm compiles
    G._metric_rows(fresh_rows(1)[:1])
    G._metric_rows(fresh_rows(2))

    t_batched = []
    for rep in range(args.reps):
        rows = fresh_rows(100 + rep)
        t0 = time.time()
        ps, ss = G._metric_rows(rows)
        t_batched.append(time.time() - t0)

    import jax.numpy as jnp

    from healthivert_tpu.ops import image as I

    def serial_psnr(a, b, d):
        # the true pre-batching formulation: one unpadded single-metric
        # dispatch + scalar fetch per call (what the first port did,
        # mirroring the reference's per-slice skimage calls)
        return float(I.psnr(jnp.asarray(np.float32(a)), jnp.asarray(np.float32(b)), float(d)))

    def serial_ssim(a, b, d):
        return float(I.ssim(jnp.asarray(np.float32(a)), jnp.asarray(np.float32(b)), float(d)))

    serial_psnr(*fresh_rows(3)[0])  # warm
    serial_ssim(*fresh_rows(4)[0])

    t_serial = []
    for rep in range(args.reps):
        rows = fresh_rows(200 + rep)
        t0 = time.time()
        ps2 = [serial_psnr(a, b, d) for a, b, d in rows]
        ss2 = [serial_ssim(a, b, d) for a, b, d in rows]
        t_serial.append(time.time() - t0)

    # equivalence spot check (same data through both paths; serial kernels
    # are the unbatched scalars, so agreement is f32-rounding-level)
    rows = fresh_rows(999)
    ps, ss = G._metric_rows(rows)
    ps2 = [serial_psnr(a, b, d) for a, b, d in rows]
    ss2 = [serial_ssim(a, b, d) for a, b, d in rows]
    perr = max(abs(x - y) for x, y in zip(ps, ps2))
    serr = max(abs(x - y) for x, y in zip(ss, ss2))

    print(f"slices/volume: {n_slices}  shape: {h}x{w}  reps: {args.reps}")
    print(f"batched  : {min(t_batched):.3f} s  (all {['%.3f' % t for t in t_batched]})")
    print(f"per-slice: {min(t_serial):.3f} s  (all {['%.3f' % t for t in t_serial]})")
    print(f"speedup  : {min(t_serial) / min(t_batched):.2f}x")
    print(f"max |d_psnr| {perr:.2e}  max |d_ssim| {serr:.2e}")


if __name__ == "__main__":
    main()
