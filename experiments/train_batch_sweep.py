"""Training-throughput batch sweep on the real TPU, with and without
generator rematerialization (Pix2PixConfig.remat / --remat).

Question: does a larger train batch lift slices/sec the way inference does
(1351 @bs64 -> 2840 @bs384), and does remat (a) fit batches that otherwise
OOM on the 16 GB v5e, (b) cost the predicted ~one extra G forward?

Usage: python -u experiments/train_batch_sweep.py [bs,bs,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.data.synthetic import SyntheticDataset
from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state, train_step


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
    sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ["16", "64", "128"])]
    lr = jnp.float32(2e-4)
    for remat in (False, True):
        for bs in sizes:
            cfg = Pix2PixConfig(
                ngf=16, image_size=256, compute_dtype="bfloat16",
                pallas_attention=True, remat=remat,
            )
            ds = SyntheticDataset(batch_size=bs, seed=0, shape=(256, 256, 16))
            batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
            state = init_state(jax.random.PRNGKey(0), cfg, batch_size=bs)
            # train_step donates its state arg; re-timing the same state needs
            # a non-donating wrapper (as experiments/train_prof.py)
            step = jax.jit(lambda st, b: train_step(st, b, lr, cfg),
                           donate_argnums=())
            try:
                ms = timeit(step, state, batch)
            except Exception as e:  # XLA OOM arrives as RuntimeError
                print(f"remat={remat} bs={bs}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                continue
            print(f"remat={remat} bs={bs}: {ms:.1f} ms/step "
                  f"({bs / ms * 1e3:.1f} slices/s)", flush=True)
            del state, batch


if __name__ == "__main__":
    main()
