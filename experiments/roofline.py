#!/usr/bin/env python
"""Corrected inference roofline for the two-stage generator (VERDICT r2
weak #4): how fast CAN this architecture go on one v5e chip, and how close
is the shipped path?

Method:
  1. XLA's own cost model (compiled.cost_analysis()['flops']) gives the
     exact executed FLOPs of the jitted forward at each batch size.
  2. Wall time per forward (value-fetch barrier) gives achieved TF/s.
  3. An analytic per-conv-layer MXU packing model bounds the achievable
     ceiling: a v5e MXU tile is 128x128; a conv with C_out output channels
     fills min(C_out/128, 1) of the N dimension and
     min(C_in*k*k/128, 1)-ish of the K dimension. The FLOPs-weighted
     harmonic mean of per-layer N-utilization bounds conv TF/s by
     peak * util (K under-fill hurts less: XLA packs K into the contraction
     loop). v5e bf16 peak: 197 TF/s.

Usage: python -u experiments/roofline.py [batch ...]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.data.synthetic import SyntheticDataset
from healthivert_tpu.models.pix2pix import (
    Pix2PixConfig,
    generator_forward,
    init_state,
)
from healthivert_tpu.models.generator import Generator

V5E_PEAK_TFS = 197.0  # bf16


def conv_model(image=256, c=16):
    """Analytic per-layer FLOPs + MXU N-utilization for the generator's conv
    trunks (coarse + fine; mirror of models/generator.py layer lists)."""
    layers = []

    def add(name, h, cin, cout, k):
        flops = 2 * h * h * cin * cout * k * k
        layers.append((name, h, cin, cout, k, flops))

    # coarse trunk (CoarseGenerator)
    add("conv1", image, 3, c, 5)
    add("conv2_down", image // 2, c, 2 * c, 3)
    add("conv3", image // 2, 2 * c, 2 * c, 3)
    add("conv4_down", image // 4, 2 * c, 4 * c, 3)
    for n in ("conv5", "conv6", "atr7", "atr8", "atr9", "atr10", "conv11", "conv12"):
        add(n, image // 4, 4 * c, 4 * c, 3)
    add("conv13", image // 2, 4 * c, 2 * c, 3)
    add("conv14", image // 2, 2 * c, 2 * c, 3)
    add("conv15", image, 2 * c, c, 3)
    add("conv16", image, c, c // 2, 3)
    add("conv17", image, c // 2, 1, 3)
    add("seg", image, c // 2, 1, 3)
    # fine trunks (hallucination + attention branches + decoder)
    add("f.conv1", image, 4, c, 5)
    add("f.conv2_down", image // 2, c, c, 3)
    add("f.conv3", image // 2, c, 2 * c, 3)
    add("f.conv4_down", image // 4, 2 * c, 4 * c, 3)
    for n in ("f.conv5", "f.conv6", "f.atr7", "f.atr8", "f.atr9", "f.atr10"):
        add(n, image // 4, 4 * c, 4 * c, 3)
    add("f.pmconv1", image, 4, c, 5)
    add("f.pmconv2_down", image // 2, c, c, 3)
    add("f.pmconv3", image // 2, c, 2 * c, 3)
    add("f.pmconv4_down", image // 4, 2 * c, 4 * c, 3)
    for n in ("f.pmconv5", "f.pmconv6", "f.pmconv9", "f.pmconv10"):
        add(n, image // 4, 4 * c, 4 * c, 3)
    add("f.allconv11", image // 4, 8 * c, 4 * c, 3)
    for n in ("f.allconv12", "f.allconv19"):
        add(n, image // 4, 4 * c, 4 * c, 3)
    add("f.allconv13", image // 2, 4 * c, 2 * c, 3)
    add("f.allconv14", image // 2, 2 * c, 2 * c, 3)
    add("f.allconv15", image, 2 * c, c, 3)
    add("f.allconv16", image, c, c // 2, 3)
    add("f.allconv17", image, c // 2 + 1, 1, 3)
    add("f.allconv18", image, c // 2 + 1, 1, 3)
    return layers


def main():
    batches = [int(a) for a in _sys.argv[1:]] or [64, 256, 384]
    cfg = Pix2PixConfig(ngf=16, image_size=256)
    state = init_state(jax.random.PRNGKey(0), cfg)
    # explicit bf16: dtype=None follows promoted-f32 inputs (ratio plane /
    # attention leaks), so pre-r3-fix runs of this script measured f32 convs
    gen = Generator(
        cnum=cfg.ngf, use_pallas_attention=jax.default_backend() == "tpu",
        dtype=jnp.bfloat16,
    )

    # ---- analytic model ----
    layers = conv_model()
    tot = sum(l[5] for l in layers)
    # FLOPs-weighted harmonic mean of per-layer N-utilization
    inv = sum(l[5] / max(min(l[3] / 128.0, 1.0), 1.0 / 128) for l in layers)
    util = tot / inv
    print(f"analytic conv model: {tot/1e9:.2f} GFLOP/sample, "
          f"FLOPs-weighted MXU N-util {util:.3f} "
          f"-> conv ceiling ~{V5E_PEAK_TFS * util:.0f} TF/s", flush=True)
    by_res = {}
    for name, h, cin, cout, k, fl in layers:
        by_res.setdefault(h, [0, 0.0])
        by_res[h][0] += fl
        by_res[h][1] = max(by_res[h][1], min(cout / 128.0, 1.0))
    for h in sorted(by_res):
        fl, u = by_res[h]
        print(f"  res {h:4d}: {fl/1e9:.2f} GFLOP ({100*fl/tot:.0f}%), "
              f"best layer N-util {u:.2f}")

    def infer(g_params, g_sn, batch):
        bf = {
            k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 and v.ndim == 4 else v)
            for k, v in batch.items()
        }
        f = generator_forward(gen, g_params, g_sn, bf, cfg, update_sn=False)
        return f["fake_b"], f["fine_seg_bin"], f["pred2_h"]

    for bs in batches:
        ds = SyntheticDataset(batch_size=bs, seed=0, n_volumes=2)
        batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        jit = jax.jit(infer)
        lowered = jit.lower(state.g_params, state.g_sn, batch)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        flops = ca.get("flops", float("nan")) if ca else float("nan")
        out = jit(state.g_params, state.g_sn, batch)
        float(jnp.sum(out[2]))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(10):
                out = jit(state.g_params, state.g_sn, batch)
            float(jnp.sum(out[0])) + float(jnp.sum(out[2]))
            best = min(best, (time.perf_counter() - t0) / 10)
        tfs = flops / best / 1e12
        print(f"batch {bs:4d}: {best*1e3:8.2f} ms  "
              f"{bs/best:8.1f} slices/s  XLA flops {flops/1e12:.3f} TF  "
              f"-> achieved {tfs:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
