#!/usr/bin/env python
"""Post-training int8 quantization QUALITY experiment (CPU-measurable).

TPU v5e's int8 MXU peaks at ~2x the bf16 rate, so W8A8 convs could lift the
inference headline IF synthesis quality survives post-training quantization.
This measures the quality half on CPU with fake-quant (symmetric absmax:
weights per-output-channel, activations per-tensor dynamic), patching
jax.lax.conv_general_dilated under the generator's single conv choke point
(models/layers.py SNConv). The attention matmuls stay unquantized (convs are
~80% of forward FLOPs). Throughput needs a real chip; quality gates first.

Each variant runs in its own process (evaluate's jit cache pins the traced
conv), driven by --quant all:

    python experiments/int8_quality.py --quant all
"""

import argparse
import json
import subprocess
import sys
import types

sys.path.insert(0, "/root/repo")


def run_variant(quant: str, n_batches: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp

    if quant != "none":
        orig = jax.lax.conv_general_dilated

        def fq(x, axis=None):
            amax = (
                jnp.max(jnp.abs(x), axis=axis, keepdims=True)
                if axis is not None else jnp.max(jnp.abs(x))
            )
            scale = jnp.maximum(amax, 1e-12) / 127.0
            return jnp.clip(jnp.round(x / scale), -127, 127) * scale

        def quant_conv(lhs, rhs, *a, **kw):
            rhs = fq(rhs, axis=(0, 1, 2))  # HWIO: per-output-channel
            if quant == "w8a8":
                lhs = fq(lhs)
            return orig(lhs, rhs, *a, **kw)

        jax.lax.conv_general_dilated = quant_conv

    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.engine import checkpoint as ckpt
    from healthivert_tpu.engine.evaluate import evaluate_model
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

    cfg = Pix2PixConfig(image_size=256, compute_dtype="bfloat16")
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=1)
    state = ckpt.restore_generator(state, "/root/repo/checkpoints/pretrained_synthetic")

    opt = types.SimpleNamespace(batch_size=4, seed=7, crop_size=256)
    ds = SyntheticDataset(opt, size=4 * n_batches, batch_size=4, seed=7)
    return evaluate_model(state.g_params, state.g_sn, ds, cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="all", choices=["all", "none", "w8", "w8a8"])
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    if args.quant != "all":
        m = run_variant(args.quant, args.batches)
        print("RESULT " + json.dumps({"quant": args.quant, **{k: float(v) for k, v in m.items()}}))
        return

    rows = {}
    for q in ("none", "w8", "w8a8"):
        r = subprocess.run(
            [sys.executable, __file__, "--quant", q, "--batches", str(args.batches)],
            capture_output=True, text=True, timeout=3000,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"{q}: FAILED\n{r.stderr[-500:]}")
            continue
        rows[q] = json.loads(line[0][len("RESULT "):])
        print(q, {k: round(v, 4) for k, v in rows[q].items() if k != "quant"})
    if "none" in rows and "w8a8" in rows:
        d = {k: rows["w8a8"][k] - rows["none"][k] for k in rows["none"] if k != "quant"}
        print("w8a8 - baseline deltas:", {k: round(v, 4) for k, v in d.items()})


if __name__ == "__main__":
    main()
