"""Batched vs serial multi-vertebra synthesis timing on the real TPU.

Interleaves 3-vertebra synthesize_volumes (shared passes) with 3 serial
synthesize_volume calls, plus an isolated CAM-stack upload timing that
exposes the tunnel's content-addressed H2D cache (first upload ~1 MB/s,
identical re-uploads ~free — see CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp
import numpy as np

from healthivert_tpu.data.synthetic import make_spine_volume
from healthivert_tpu.engine import infer3d
from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state


def main():
    cfg = Pix2PixConfig(ngf=16, image_size=256)
    state = init_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ct, labels, cam = make_spine_volume(rng, fractured={20: 0.6})
    vols = [(ct, labels, v, cam) for v in (19, 20, 21)]

    infer3d.synthesize_volumes(state.g_params, state.g_sn, cfg, vols)  # compile
    for v in (19, 20, 21):
        infer3d.synthesize_volume(state.g_params, state.g_sn, cfg, ct, labels, v, cam)

    blob = np.zeros((192, 256, 256), np.uint8)
    for rep in range(3):
        t0 = time.perf_counter()
        d = jnp.asarray(blob)
        float(jnp.sum(d[0, 0]))
        print(f"cam 12.6MB upload rep{rep}: {time.perf_counter() - t0:.2f}s", flush=True)

    for rnd in range(3):
        t0 = time.perf_counter()
        infer3d.synthesize_volumes(state.g_params, state.g_sn, cfg, vols)
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        for v in (19, 20, 21):
            infer3d.synthesize_volume(state.g_params, state.g_sn, cfg, ct, labels, v, cam)
        ts = time.perf_counter() - t0
        print(f"round {rnd}: batched {tb:.2f}s  serial {ts:.2f}s", flush=True)


if __name__ == "__main__":
    main()
