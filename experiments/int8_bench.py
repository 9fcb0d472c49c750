#!/usr/bin/env python
"""int8 vs bf16 two-stage synthesis throughput (REAL TPU).

Quality gate already passed (experiments/int8_quality.py: near-zero deltas),
so this measures whether XLA actually lowers the quantized convs onto the
v5e int8 MXU (~2x bf16 peak) and what the end-to-end slices/sec gain is.
Mirrors bench.py's headline path (generator_forward, batch sweep).

    python -u experiments/int8_bench.py          # on the tunneled TPU
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import sys as _sys

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp

    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.models.generator import Generator
    from healthivert_tpu.models.pix2pix import (
        Pix2PixConfig, calibrate_int8, generator_forward, init_state,
    )

    on_tpu = jax.default_backend() == "tpu"
    cfg = Pix2PixConfig(ngf=16, image_size=256)
    state = init_state(jax.random.PRNGKey(0), cfg)

    int8_cfg = None

    def make_step(dtype):
        is_int8 = dtype.startswith("int8")
        gen = Generator(
            cnum=cfg.ngf, use_pallas_attention=on_tpu,
            # explicit bf16 baseline: dtype=None would follow promoted-f32
            # inputs and understate the bf16 rate (code-review r3)
            dtype="int8" if is_int8 else jnp.bfloat16,
        )
        fcfg = cfg if not is_int8 else type(cfg)(
            **{**cfg.__dict__, "compute_dtype": "int8"}
        )

        def infer_step(g_params, g_sn, batch, g_quant):
            bf = {
                k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 and v.ndim == 4 else v)
                for k, v in batch.items()
            }
            f = generator_forward(
                gen, g_params, g_sn, bf, fcfg, update_sn=False, g_quant=g_quant
            )
            return f["fake_b"], f["fine_seg_bin"], f["pred2_h"]

        return gen, jax.jit(infer_step)

    import os as _os
    batches = [int(a) for a in _sys.argv[1:]] or [256, 384]
    # e.g. INT8_BENCH_DTYPES=int8-static for a high-batch sweet-spot sweep
    # without paying bf16/dynamic compiles at every shape
    dtypes = tuple(
        _os.environ.get("INT8_BENCH_DTYPES", "bf16,int8-dynamic,int8-static")
        .split(",")
    )
    for bs in batches:
        ds = SyntheticDataset(batch_size=bs, seed=0, n_volumes=2)
        batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        for dtype in dtypes:
            gen, step = make_step(dtype)
            quant = None
            if dtype == "int8-static":
                icfg = type(cfg)(**{**cfg.__dict__, "compute_dtype": "int8"})
                quant = calibrate_int8(
                    gen, state.g_params, state.g_sn, [batch], icfg,
                    percentile=99.9,  # the shipping "auto" mode (r4)
                )
            try:
                out = step(state.g_params, state.g_sn, batch, quant)
                float(jnp.sum(out[0].astype(jnp.float32)))  # completion barrier
                reps, best = 6, 0.0
                for _ in range(reps):
                    t0 = time.time()
                    out = step(state.g_params, state.g_sn, batch, quant)
                    float(jnp.sum(out[0].astype(jnp.float32)))
                    best = max(best, bs / (time.time() - t0))
                print(f"batch {bs} {dtype}: {best:.1f} slices/sec")
            except Exception as e:
                print(f"batch {bs} {dtype} FAILED: {e!r}"[:300])


if __name__ == "__main__":
    main()
