#!/usr/bin/env python
"""Re-segment the INT8 forward (VERDICT r4 #3): with convs at int8 the bf16
Pallas attention share mechanically grows — is the kernel now the cap?

Measures at the int8 sweet-spot batches (256/512): full int8-static forward,
full bf16 forward, and the attention op alone (bf16 kernel — it rides inside
both). share = t_attn / t_full_int8.

Run on the chip:  python -u experiments/int8_segments.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.data.synthetic import SyntheticDataset
from healthivert_tpu.models.generator import Generator
from healthivert_tpu.models.pix2pix import (
    Pix2PixConfig, calibrate_int8, generator_forward, init_state,
)
from healthivert_tpu.ops.contextual_attention import contextual_attention


def timeit(fn, *args, iters=10):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # fetch = the only barrier
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    cfg = Pix2PixConfig(ngf=16, image_size=256)
    state = init_state(jax.random.PRNGKey(0), cfg)
    on_tpu = jax.default_backend() == "tpu"

    gen8 = Generator(cnum=16, use_pallas_attention=on_tpu, dtype="int8")
    genb = Generator(cnum=16, use_pallas_attention=on_tpu, dtype=jnp.bfloat16)

    for B in (256, 512):
        ds = SyntheticDataset(batch_size=B, seed=0, n_volumes=2)
        batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        import dataclasses as _dc

        quant = calibrate_int8(
            gen8, state.g_params, state.g_sn, [batch],
            _dc.replace(cfg, compute_dtype="int8"), percentile=99.9,
        )

        def step(gen, g_quant=None):
            @jax.jit
            def f(gp, gs, b):
                bf = {
                    k: (v.astype(jnp.bfloat16)
                        if v.dtype == jnp.float32 and v.ndim == 4 else v)
                    for k, v in b.items()
                }
                out = generator_forward(gen, gp, gs, bf, cfg, update_sn=False,
                                        g_quant=g_quant)
                return out["fake_b"], out["fine_seg_bin"], out["pred2_h"]
            return lambda: f(state.g_params, state.g_sn, batch)

        t8 = timeit(step(gen8, quant))
        tb = timeit(step(genb))

        rng = np.random.default_rng(0)
        f1 = jnp.asarray(rng.standard_normal((B, 64, 64, 64)), jnp.bfloat16)
        m = jnp.zeros((B, 256, 256, 1), jnp.bfloat16)

        @jax.jit
        def attn(f1, m):
            return contextual_attention(f1, f1, m, use_pallas=on_tpu)[0]

        ta = timeit(attn, f1, m)
        print(
            f"== batch {B}: int8-static fwd {t8:7.2f} ms ({B / t8 * 1e3:.1f} sl/s)"
            f"  bf16 fwd {tb:7.2f} ms ({B / tb * 1e3:.1f} sl/s)\n"
            f"   attention (bf16 kernel) {ta:6.2f} ms ->"
            f" {100 * ta / t8:.1f}% of the int8 forward"
            f" ({100 * ta / tb:.1f}% of bf16)",
            flush=True,
        )


if __name__ == "__main__":
    main()
