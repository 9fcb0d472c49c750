"""Segment-level timing of the training step on the real TPU.

Measures, at batch 16 bf16 (BASELINE.json config 2):
  full      - the shipped train_step
  gfwd      - generator forward only (losses head skipped)
  gfwd_bwd  - generator forward + G-loss grad via vjp (no D updates)
  d_only    - the three discriminator d_step updates on fixed fakes
to locate where the ~86 ms/step goes.

Usage: python -u experiments/train_prof.py [batch_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.data.synthetic import SyntheticDataset
from healthivert_tpu.models.pix2pix import (
    Pix2PixConfig,
    build_modules,
    generator_forward,
    init_state,
    make_optimizer,
    train_step,
)
from healthivert_tpu.models.discriminator import gan_loss
from healthivert_tpu.ops import geometry as geo
from healthivert_tpu.ops.image import sobel_edges
import optax


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=10, reps=2):
    out = fn(*args)
    fetch(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = Pix2PixConfig(
        ngf=16, image_size=256, compute_dtype="bfloat16",
        pallas_attention=jax.default_backend() == "tpu",
    )
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=bs)
    ds = SyntheticDataset(batch_size=bs, seed=1, n_volumes=2)
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
    lr = jnp.float32(2e-4)
    gen, disc = build_modules(cfg)
    opt = make_optimizer(cfg)

    # --- full step (no donation here: reuse state across iters) ---
    full_step = jax.jit(
        lambda st, b: train_step(st, b, lr, cfg), donate_argnums=()
    )

    t_full = timeit(lambda: full_step(state, batch))
    print(f"full train step: {t_full:.1f} ms  ({bs / (t_full / 1e3):.1f} slices/s)", flush=True)

    # --- generator forward only ---
    @jax.jit
    def gfwd(g_params, g_sn, b):
        f = generator_forward(gen, g_params, g_sn, b, cfg, update_sn=False)
        return f["fake_b"], f["pred2_h"]

    t_gf = timeit(lambda: gfwd(state.g_params, state.g_sn, batch))
    print(f"gen forward:     {t_gf:.1f} ms", flush=True)

    # --- generator forward + G-grad (no Ds: plain sum losses over outputs) ---
    @jax.jit
    def gfwd_bwd(g_params, g_sn, b):
        def loss(p):
            f = generator_forward(gen, p, g_sn, b, cfg, update_sn=False)
            l1 = jnp.mean(jnp.abs(f["fake_b"].astype(jnp.float32) - b["full"]))
            return l1 + jnp.mean(f["gen"].fine_seg.astype(jnp.float32)) + jnp.mean(
                f["pred2_h"]
            )

        return jax.grad(loss)(g_params)

    t_gb = timeit(lambda: gfwd_bwd(state.g_params, state.g_sn, batch))
    print(f"gen fwd+bwd:     {t_gb:.1f} ms", flush=True)

    # --- D updates only, on fixed (precomputed) fakes ---
    f = jax.jit(
        lambda p, s, b: generator_forward(gen, p, s, b, cfg, update_sn=False)
    )(state.g_params, state.g_sn, batch)
    fake_b = jax.lax.stop_gradient(f["fake_b"])
    fine_seg_bin = jax.lax.stop_gradient(f["fine_seg_bin"])
    fake_local = jax.lax.stop_gradient(f["fake_local"])
    real_local = jax.lax.stop_gradient(f["real_local"])

    @jax.jit
    def d_only(st, b):
        def d_step(params, stats, opt_state, fake, real):
            def loss_fn(p, stt):
                out, mut = disc.apply(
                    {"params": p, "batch_stats": stt}, fake, train=True,
                    mutable=["batch_stats"],
                )
                l_fake = gan_loss(out, False, cfg.gan_mode)
                out2, mut = disc.apply(
                    {"params": p, "batch_stats": mut["batch_stats"]}, real,
                    train=True, mutable=["batch_stats"],
                )
                l_real = gan_loss(out2, True, cfg.gan_mode)
                return (l_fake + l_real) * 0.5, mut["batch_stats"]

            (l, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(
                params, jax.tree_util.tree_map(lambda u: -lr * u, updates)
            )
            return params, new_stats, opt_state, l

        r = []
        r.append(d_step(st.d1_params, st.d1_stats, st.opt_d1, fake_b, b["full"]))
        r.append(d_step(st.d2_params, st.d2_stats, st.opt_d2, fine_seg_bin, b["vert_seg"]))
        r.append(d_step(st.d3_params, st.d3_stats, st.opt_d3, fake_local, real_local))
        return [x[3] for x in r]

    t_d = timeit(lambda: d_only(state, batch))
    print(f"3x D updates:    {t_d:.1f} ms", flush=True)

    print(
        f"accounted: gen fwd+bwd {t_gb:.1f} + Ds {t_d:.1f} = {t_gb + t_d:.1f} "
        f"of {t_full:.1f} ms (G-head GAN terms through updated Ds are extra)",
        flush=True,
    )


if __name__ == "__main__":
    main()
