#!/usr/bin/env python
"""Quality of the REAL int8 path, dynamic vs static-calibrated scales, on
the shipped checkpoint (CPU-measurable; VERDICT r4 #3 quality gate for
making static calibration the CLI default).

Unlike experiments/int8_quality.py (fake-quant conv patching), this drives
the actual SNConv int8 kernels (dtype="int8") through evaluate_model:

    python -u experiments/int8_static_quality.py [--batches 4]
"""

import argparse
import json
import sys
import types

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.engine import checkpoint as ckpt
    from healthivert_tpu.engine.evaluate import evaluate_model
    from healthivert_tpu.models.pix2pix import (
        Pix2PixConfig, build_modules, init_state,
    )

    state = init_state(
        jax.random.PRNGKey(0),
        Pix2PixConfig(image_size=256, compute_dtype="bfloat16"),
        batch_size=1,
    )
    state = ckpt.restore_generator(state, "/root/repo/checkpoints/pretrained_synthetic")

    def make_ds():
        opt = types.SimpleNamespace(batch_size=4, seed=7, crop_size=256)
        return SyntheticDataset(opt, size=4 * args.batches, batch_size=4, seed=7)

    from healthivert_tpu.models.layers import CALIB_PERCENTILES

    variants = ["bf16", "int8-dynamic", "int8-static"] + [
        f"int8-static-p{p}" for p in CALIB_PERCENTILES
    ]
    rows = {}
    calib_cache = None
    for variant in variants:
        cfg = Pix2PixConfig(
            image_size=256,
            compute_dtype="int8" if variant.startswith("int8") else "bfloat16",
        )
        quant = None
        if variant.startswith("int8-static"):
            import jax.numpy as jnp

            from healthivert_tpu.models.pix2pix import (
                calib_to_quant, calibrate_int8,
            )

            gen, _ = build_modules(cfg)
            if calib_cache is None:
                # calibrate on DIFFERENT data (seed 3) than the eval set —
                # the honest deployment setting; one calibration pass (the
                # SHARED shipping helper, return_calib=True) serves the whole
                # percentile sweep (act_pq sows the full grid)
                copt = types.SimpleNamespace(batch_size=4, seed=3, crop_size=256)
                cds = SyntheticDataset(copt, size=8, batch_size=4, seed=3)
                jbs = [{k: jnp.asarray(v) for k, v in b.items()} for b in cds]
                calib_cache = calibrate_int8(
                    gen, state.g_params, state.g_sn, jbs, cfg,
                    return_calib=True,
                )
            p = (float(variant.rsplit("p", 1)[1])
                 if "-p" in variant else None)
            quant = calib_to_quant(calib_cache, percentile=p)
        m = evaluate_model(state.g_params, state.g_sn, make_ds(), cfg, g_quant=quant)
        rows[variant] = {k: round(float(v), 4) for k, v in m.items()}
        print(variant, json.dumps(rows[variant]), flush=True)

    print("SUMMARY " + json.dumps(rows))


if __name__ == "__main__":
    main()
