#!/usr/bin/env python
"""Phase-level timing of synthesize_volume on the real TPU: where do the
9.3 s warm per-vertebra go? (host geometry vs device forward vs transfers)"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.data.synthetic import make_spine_volume
from healthivert_tpu.engine import infer3d
from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

TIMES = {}


def wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        TIMES[name] = TIMES.get(name, 0.0) + time.perf_counter() - t0
        return out

    setattr(mod, name, timed)


wrap(infer3d, "_slice_geometry")
wrap(infer3d, "_reassemble")
wrap(infer3d, "_run_pass")


def main():
    cfg = Pix2PixConfig(ngf=16, image_size=256)
    state = init_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ct, labels, cam = make_spine_volume(rng, fractured={20: 0.6})

    for rep in range(3):
        TIMES.clear()
        t0 = time.perf_counter()
        infer3d.synthesize_volume(state.g_params, state.g_sn, cfg, ct, labels, 20, cam)
        total = time.perf_counter() - t0
        print(
            f"rep{rep}: total {total:6.2f}s | "
            + " ".join(f"{k}={v:.2f}s" for k, v in sorted(TIMES.items())),
            flush=True,
        )

    # batch-size sweep for the device passes
    for bs in (32, 64):
        TIMES.clear()
        t0 = time.perf_counter()
        infer3d.synthesize_volume(
            state.g_params, state.g_sn, cfg, ct, labels, 20, cam, batch_size=bs
        )
        total = time.perf_counter() - t0
        print(f"batch_size={bs}: total {total:6.2f}s  run_pass={TIMES.get('_run_pass', 0):.2f}s", flush=True)


if __name__ == "__main__":
    main()
