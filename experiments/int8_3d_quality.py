#!/usr/bin/env python
"""int8 vs f32 on the REAL 3D-synthesis surface (CPU-measurable).

Complements experiments/int8_quality.py (2D eval metrics): runs the full
iterative two-stage volume synthesis (engine/infer3d.synthesize_volume,
upper->lower->target passes, SHRM reassembly) with the shipped checkpoint
at true-f32 convs vs int8 convs (the eval_3d CLI's --compute_dtype float32
vs int8 modes) and compares the outputs — fake-seg agreement, each
variant's Dice vs the ground-truth label, and fake-CT voxel deltas over
the SYNTHESIZED region (the unprocessed background is identically zero in
both variants and would dilute the statistic).

    python experiments/int8_3d_quality.py
"""

import sys

sys.path.insert(0, "/root/repo")


def dice(a, b):
    import numpy as np

    inter = np.sum(a & b)
    s = a.sum() + b.sum()
    return 2.0 * inter / s if s else 1.0


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import numpy as np

    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.engine import checkpoint as ckpt
    from healthivert_tpu.engine.infer3d import synthesize_volume
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

    rng = np.random.default_rng(11)
    ct, labels, cam = make_spine_volume(
        rng, shape=(256, 256, 32), vert_ids=(19, 20, 21), vert_height=30,
        gap=12, fractured={20: 0.6},
    )

    # "int8-static" = the eval_3d CLI's shipping default (--int8_calib auto:
    # static per-tensor scales calibrated from the call's own first batch)
    outs = {}
    for mode, dtype, quant in (
        ("float32", "float32", None),
        ("int8", "int8", None),
        ("int8-static", "int8", "auto"),
    ):
        cfg = Pix2PixConfig(ngf=16, image_size=256, compute_dtype=dtype)
        state = init_state(jax.random.PRNGKey(0), cfg)
        state = ckpt.restore_generator(
            state, "/root/repo/checkpoints/pretrained_synthetic"
        )
        ct_fake, lb_fake = synthesize_volume(
            state.g_params, state.g_sn, cfg, ct, labels, 20, cam,
            batch_size=16, use_bf16=(dtype == "int8"), quant=quant,
        )
        outs[mode] = (np.asarray(ct_fake), np.asarray(lb_fake) > 0)
        print(f"{mode}: done")

    real = labels == 20
    f32_ct, f32_seg = outs["float32"]
    for mode in ("int8", "int8-static"):
        i8_ct, i8_seg = outs[mode]
        print(f"[{mode}] seg agreement vs f32 Dice: {dice(i8_seg, f32_seg):.4f}")
        print(f"[{mode}] Dice vs real label: f32 {dice(f32_seg, real):.4f}  "
              f"{mode} {dice(i8_seg, real):.4f}")
        region = (f32_ct != 0) | (i8_ct != 0)  # synthesized voxels only
        d = np.abs(
            f32_ct.astype(np.float32) - i8_ct.astype(np.float32)
        )[region]
        print(
            f"[{mode}] fake-CT |delta| over the synthesized region "
            f"({region.mean() * 100:.0f}% of voxels): "
            f"mean {d.mean():.3f} / p99 {np.percentile(d, 99):.1f} (uint8 scale)"
        )


if __name__ == "__main__":
    main()
