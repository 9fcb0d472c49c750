#!/usr/bin/env python
"""Per-segment timing of the two-stage generator forward at bench shapes
(bf16, batch 64/256) on the real TPU: which segment holds the remaining time?"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.models.generator import CoarseGenerator, FineGenerator, Generator
from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state
from healthivert_tpu.ops.contextual_attention import contextual_attention


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda t: float(jnp.sum(t.astype(jnp.float32))), out[0] if isinstance(out, tuple) else out)
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
    gp, gs = state.g_params, state.g_sn

    for B in (64, 256):
        print(f"==== batch {B} (bf16) ====", flush=True)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, 256, 256, 1)).astype(np.float32), jnp.bfloat16)
        mask = jnp.zeros((B, 256, 256, 1), jnp.bfloat16)
        cam = jnp.ones((B, 256, 256, 1), jnp.bfloat16)
        ratio = jnp.zeros((B,), jnp.float32)

        # explicit bf16 (pre-r3-fix runs measured f32-promoted convs)
        bf = jnp.bfloat16
        coarse = CoarseGenerator(cnum=16, dtype=bf)
        fine_x = FineGenerator(cnum=16, use_pallas_attention=True, dtype=bf)
        fine_noattn = FineGenerator(cnum=16, use_pallas_attention=False, dtype=bf)
        gen = Generator(cnum=16, use_pallas_attention=True, dtype=bf)

        @jax.jit
        def full(x, mask, cam, ratio):
            return gen.apply({"params": gp, "sn": gs}, x, mask, cam, ratio).x_stage2

        @jax.jit
        def coarse_only(x, mask, cam, ratio):
            return coarse.apply(
                {"params": gp["coarse_generator"], "sn": gs["coarse_generator"]},
                x, mask, cam, ratio,
            )[1]

        @jax.jit
        def fine_only(x, x1, mask, seg, ratio):
            return fine_x.apply(
                {"params": gp["fine_generator"], "sn": gs["fine_generator"]},
                x, x1, mask, seg, ratio,
            )[1]

        @jax.jit
        def fine_only_xla(x, x1, mask, seg, ratio):
            return fine_noattn.apply(
                {"params": gp["fine_generator"], "sn": gs["fine_generator"]},
                x, x1, mask, seg, ratio,
            )[1]

        t_full = timeit(full, x, mask, cam, ratio)
        print(f"full generator:      {t_full:7.2f} ms", flush=True)
        try:
            t_coarse = timeit(coarse_only, x, mask, cam, ratio)
            print(f"coarse only:         {t_coarse:7.2f} ms", flush=True)
        except Exception as e:
            print("coarse scoping failed:", repr(e)[:200], flush=True)
            t_coarse = None
        try:
            seg = jnp.zeros((B, 256, 256, 1), jnp.bfloat16)
            t_fine = timeit(fine_only, x, x, mask, seg, ratio)
            print(f"fine (pallas attn):  {t_fine:7.2f} ms", flush=True)
            t_fine_x = timeit(fine_only_xla, x, x, mask, seg, ratio)
            print(f"fine (xla attn):     {t_fine_x:7.2f} ms", flush=True)
        except Exception as e:
            print("fine scoping failed:", repr(e)[:200], flush=True)

        # attention op alone at feature shapes (B, 64, 64, 64)
        f1 = jnp.asarray(rng.standard_normal((B, 64, 64, 64)).astype(np.float32), jnp.bfloat16)
        m64 = jnp.zeros((B, 256, 256, 1), jnp.bfloat16)  # mask at full res (as the net passes it)

        @jax.jit
        def attn_pallas(f1, m64):
            return contextual_attention(f1, f1, m64, use_pallas=True)[0]

        @jax.jit
        def attn_xla(f1, m64):
            return contextual_attention(f1, f1, m64, use_pallas=False)[0]

        try:
            print(f"attention pallas:    {timeit(attn_pallas, f1, m64):7.2f} ms", flush=True)
            print(f"attention xla:       {timeit(attn_xla, f1, m64):7.2f} ms", flush=True)
        except Exception as e:
            print("attention timing failed:", repr(e)[:200], flush=True)


if __name__ == "__main__":
    main()
