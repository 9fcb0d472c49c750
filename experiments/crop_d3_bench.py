#!/usr/bin/env python
"""Measure the cropped-D3 train step (cfg.crop_d3) on the real chip.

D3's input (mask * fake_B * center columns, reference pix2pix_model.py:
254-260) is nonzero on <=41x70 px but the reference convolves the full
256^2 through the ndf=64 PatchGAN; crop_d3 feeds a static 48x128 window
containing every nonzero pixel (ops/geometry.band_crop). Trace-derived
r4 attribution: the three D updates are 38% of the step (~33 ms each
@bs128) and the g_head ~30 ms — D3's update + its G-head forward is the
target. Expected: ~1/10.7 of D3's conv time.

Run:  python -u experiments/crop_d3_bench.py [--batch_sizes 16,128]
"""

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_sizes", default="16,128")
    ap.add_argument("--ngf", type=int, default=16)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp

    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state, train_step

    on_tpu = jax.default_backend() == "tpu"
    lr = jnp.float32(2e-4)

    def wall_ms(cfg, bs, iters=10):
        state = init_state(jax.random.PRNGKey(0), cfg, batch_size=bs)
        ds = SyntheticDataset(batch_size=bs, seed=1, n_volumes=2)
        batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        state, losses = train_step(state, dict(batch), lr, cfg)  # compile
        float(losses["G_maskL1"])  # value fetch = the only reliable barrier
        best = 1e18
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, losses = train_step(state, dict(batch), lr, cfg)
            float(losses["G_maskL1"])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        mk = lambda **kw: Pix2PixConfig(
            ngf=args.ngf, image_size=args.image_size, compute_dtype="bfloat16",
            pallas_attention=on_tpu, **kw)
        # both deviations default ON since bc63fcd — baselines must turn
        # them OFF explicitly or every row measures the same compiled step
        t_base = wall_ms(mk(crop_d3=False), bs)
        t_crop = wall_ms(mk(crop_d3=True), bs)
        t_ref = wall_ms(mk(gan_head_preupdate=False, crop_d3=False), bs)
        t_both_ref = wall_ms(mk(gan_head_preupdate=False, crop_d3=True), bs)
        print(
            f"== batch {bs} (ms/step, sl/s):\n"
            f"   preupdate only             {t_base:7.1f}  {bs / t_base * 1e3:7.1f}\n"
            f"   preupdate + crop_d3 (dflt) {t_crop:7.1f}  {bs / t_crop * 1e3:7.1f}"
            f"  -> {t_base / t_crop:.3f}x from crop_d3\n"
            f"   reference semantics        {t_ref:7.1f}  {bs / t_ref * 1e3:7.1f}\n"
            f"   reference order + crop_d3  {t_both_ref:7.1f}  {bs / t_both_ref * 1e3:7.1f}"
            f"  -> {t_ref / t_both_ref:.3f}x vs reference order",
            flush=True,
        )


if __name__ == "__main__":
    main()
