"""Where does the 43 ms G-backward go at batch 16?

Times gen fwd+bwd with pallas vs XLA attention, and the attention op
fwd+bwd in isolation at training shapes, on the real TPU.
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
from healthivert_tpu.models.pix2pix import Pix2PixConfig, generator_forward, init_state
from healthivert_tpu.models.generator import Generator
from healthivert_tpu.ops.contextual_attention import contextual_attention


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, iters=10, reps=2):
    fetch(fn())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ds = SyntheticDataset(batch_size=bs, seed=1, n_volumes=2)
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
    state = init_state(jax.random.PRNGKey(0), Pix2PixConfig(ngf=16, image_size=256))

    for pallas in (True, False):
        cfg = Pix2PixConfig(
            ngf=16, image_size=256, compute_dtype="bfloat16", pallas_attention=pallas
        )
        gen = Generator(cnum=16, dtype=jnp.bfloat16, use_pallas_attention=pallas)

        @jax.jit
        def gfwd_bwd(g_params, b):
            def loss(p):
                f = generator_forward(gen, p, state.g_sn, b, cfg, update_sn=False)
                return (
                    jnp.mean(jnp.abs(f["fake_b"].astype(jnp.float32) - b["full"]))
                    + jnp.mean(f["gen"].fine_seg.astype(jnp.float32))
                    + jnp.mean(f["pred2_h"])
                )

            return jax.grad(loss)(g_params)

        t = timeit(lambda: gfwd_bwd(state.g_params, batch))
        print(f"gen fwd+bwd pallas={pallas}: {t:.1f} ms", flush=True)

    # attention op in isolation at the training feature shape
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((bs, 64, 64, 64)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    m = jnp.zeros((bs, 256, 256, 1), jnp.float32).at[:, 100:140].set(1.0)

    for pallas in (True, False):
        @jax.jit
        def att_fwd(f_):
            return contextual_attention(f_, f_, m, use_pallas=pallas).y

        @jax.jit
        def att_bwd(f_):
            return jax.grad(
                lambda z: jnp.sum(
                    contextual_attention(z, z, m, use_pallas=pallas).y.astype(
                        jnp.float32
                    )
                    ** 2
                )
            )(f_)

        tf_ = timeit(lambda: att_fwd(f))
        tb = timeit(lambda: att_bwd(f))
        print(f"attention pallas={pallas}: fwd {tf_:.1f} ms, fwd+bwd {tb:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
