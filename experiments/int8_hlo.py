#!/usr/bin/env python
"""Inspect the TPU-optimized HLO of the int8 inference path (VERDICT r3 #3).

Questions answered (compile-only; barely touches the chip):
  1. Do the quantized convs lower to s8 x s8 -> s32 convolution ops (the
     v5e int8 MXU), or does XLA upcast them?
  2. How many of the generator's convs are int8 vs other dtypes?
  3. What surrounds them (are the dynamic per-sample activation-scale
     reductions fused or standalone)?

    python -u experiments/int8_hlo.py [batch]
"""

import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp

    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.models.generator import Generator
    from healthivert_tpu.models.pix2pix import (
        Pix2PixConfig, generator_forward, init_state,
    )

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    on_tpu = jax.default_backend() == "tpu"
    cfg = Pix2PixConfig(ngf=16, image_size=256)
    state = init_state(jax.random.PRNGKey(0), cfg)
    gen = Generator(cnum=cfg.ngf, use_pallas_attention=on_tpu, dtype="int8")

    def infer_step(g_params, g_sn, batch):
        bf = {
            k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 and v.ndim == 4 else v)
            for k, v in batch.items()
        }
        f = generator_forward(gen, g_params, g_sn, bf, cfg, update_sn=False)
        return f["fake_b"], f["fine_seg_bin"], f["pred2_h"]

    ds = SyntheticDataset(batch_size=bs, seed=0, n_volumes=2)
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
    print(f"backend={jax.default_backend()} batch={bs}; compiling...", flush=True)
    compiled = jax.jit(infer_step).lower(state.g_params, state.g_sn, batch).compile()
    hlo = compiled.as_text()
    print(f"HLO: {len(hlo.splitlines())} lines")

    # classify every convolution op by operand/result dtypes
    conv_re = re.compile(r"(\S+)\s*=\s*(\S+)\s+convolution\(([^)]*)\)")
    counts = {}
    for m in re.finditer(r"=\s*(s8|s32|bf16|f32|s16|u8)\[[^\]]*\]\{?[^=]*convolution", hlo):
        pass
    # simpler: walk lines
    for line in hlo.splitlines():
        if " convolution(" not in line and "convolution(" not in line:
            continue
        # result dtype
        mr = re.search(r"=\s*(\w+)\[", line)
        res = mr.group(1) if mr else "?"
        # operand dtypes inside the call
        ops = re.findall(r"(\w+)\[[0-9,]*\]", line.split("convolution(", 1)[-1])
        key = f"{'x'.join(ops[:2])}->{res}"
        counts[key] = counts.get(key, 0) + 1
    print("convolution ops by dtype signature:")
    for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {v}")

    # dynamic-scale reductions: count standalone reduce ops over abs
    n_reduce = len(re.findall(r"= (f32|bf16)\[[0-9,]*\]\{?[^=]* reduce\(", hlo))
    print(f"reduce ops (any): {n_reduce}")

    # sample: print the first two int8 conv lines + the first reduce line
    shown = 0
    for line in hlo.splitlines():
        if "convolution(" in line and "s8[" in line and shown < 2:
            print("SAMPLE CONV:", line.strip()[:400])
            shown += 1
    for line in hlo.splitlines():
        if re.search(r"reduce\(", line) and "f32" in line:
            print("SAMPLE REDUCE:", line.strip()[:300])
            break

    with open("/tmp/int8_hlo.txt", "w") as f:
        f.write(hlo)
    print("full HLO -> /tmp/int8_hlo.txt")


if __name__ == "__main__":
    main()
