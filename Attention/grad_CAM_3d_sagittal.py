#!/usr/bin/env python
"""HGAM heatmap generation: train/apply the fracture classifier and write
per-vertebra Grad-CAM++ heatmap NIfTIs.

The reference README invokes a script of this name (README.md:99) whose
source is not in the repo; its OUTPUTS are consumed by the dataset
(aligned_dataset.py:162-171: {pv}_0/.._1/.. .nii.gz, values in [0, 1]).
This is a ground-up implementation (SURVEY.md §2.2).

    # train the classifier on a straightened dataset + split json:
    python Attention/grad_CAM_3d_sagittal.py train --dataroot <dir> \
        --split vertebra_data.json --out <ckpt-dir> [--steps 500]
    # generate heatmaps:
    python Attention/grad_CAM_3d_sagittal.py generate --dataroot <dir> \
        --split vertebra_data.json --ckpt <ckpt-dir> --out <heatmap-dir>

Heatmaps are written as {pv}_{cls}.nii.gz where cls is the classifier's
predicted class (0 normal / 1 fractured), matching the reference lookup.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _slices_for(ct, labels, vert_id, size=256, z_context=0):
    """Central-4/5 sagittal slices of a vertebra, normalized to [-1, 1].

    z_context=k stacks each center slice with its +-k sagittal neighbors as
    channels (2.5D input, clamped at the volume edges) — the z-structure a
    2D slice classifier can't see (a wedge deformity persists across
    neighboring slices; noise doesn't). Returns (N, H, W, 2k+1)."""
    vert = labels == vert_id
    zs = np.nonzero(vert.any(axis=(0, 1)))[0]
    if zs.size == 0:
        return None, None
    z0, z1 = int(zs.min()), int(zs.max())
    n = z1 - z0 + 1
    lo = z0 + (n - int(n * 4 / 5)) // 2
    hi = lo + int(n * 4 / 5)
    idx = list(range(lo, max(hi, lo + 1)))
    ctf = ct.astype(np.float32) / 255.0 * 2 - 1
    nz = ct.shape[2]
    stacks = [
        ctf[:, :, [min(max(z + d, 0), nz - 1)
                   for d in range(-z_context, z_context + 1)]]
        for z in idx
    ]
    return np.stack(stacks), idx  # (N, H, W, 2k+1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["train", "generate"])
    p.add_argument("--dataroot", required=True)
    p.add_argument("--split", default="vertebra_data.json")
    p.add_argument("--phase", default="train")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--z_context", type=int, default=2,
                   help="2.5D input: each sample is the center slice +- this "
                        "many sagittal neighbors as channels (VERDICT r4 #6; "
                        "0 = the old pure-2D classifier). 'generate' reads "
                        "the value the checkpoint was trained with from its "
                        "meta.json when present")
    p.add_argument(
        "--gpu_ids", type=str, default="0",
        help="-1 selects the CPU backend (reference base_options.py:131-139 "
        "semantics), like every other CLI in this repo",
    )
    args = p.parse_args(argv)

    from healthivert_tpu.config.options import BaseOptions

    BaseOptions._apply_device_options(args)

    import jax
    import jax.numpy as jnp
    import optax

    from healthivert_tpu.engine import checkpoint as ckpt_io
    from healthivert_tpu.models.hgam import (
        FractureClassifier,
        classifier_train_step,
        grad_cam_pp,
    )
    from healthivert_tpu.utils import nifti

    with open(args.split) as f:
        split = json.load(f)

    model = FractureClassifier()
    rng = np.random.default_rng(args.seed)

    def load_pv(pv):
        ct = nifti.load(os.path.join(args.dataroot, "CT", pv + ".nii.gz")).get_fdata()
        lb = nifti.load(os.path.join(args.dataroot, "label", pv + ".nii.gz")).get_fdata()
        return ct, lb

    if args.mode == "train":
        items = [
            (pv, 1 if int(g) > 1 else 0)
            for pv, g in split[args.phase].items()
            if os.path.exists(os.path.join(args.dataroot, "CT", pv + ".nii.gz"))
        ]
        if not items:
            raise SystemExit("no training volumes found")
        chans = 2 * args.z_context + 1
        params = model.init(jax.random.PRNGKey(args.seed),
                            jnp.zeros((1, 256, 256, chans)))
        opt_state = optax.scale_by_adam().init(params)
        for step in range(args.steps):
            xs, ys = [], []
            while len(xs) < args.batch:
                pv, y = items[rng.integers(len(items))]
                ct, lb = load_pv(pv)
                sl, _ = _slices_for(ct, lb, int(pv.rsplit("_", 1)[1]),
                                    z_context=args.z_context)
                if sl is None:
                    continue
                xs.append(sl[rng.integers(len(sl))])
                ys.append(y)
            params, opt_state, loss, acc = classifier_train_step(
                model, params, opt_state,
                jnp.asarray(np.stack(xs)), jnp.asarray(np.array(ys)), jnp.float32(args.lr),
            )
            if step % 50 == 0:
                print(f"step {step}: loss {float(loss):.4f} acc {float(acc):.3f}")
        ckpt_io.save_checkpoint(params, args.out, "classifier")
        with open(os.path.join(args.out, "meta.json"), "w") as f:
            json.dump({"z_context": args.z_context}, f)
        print(f"saved classifier to {args.out}/classifier (z_context={args.z_context})")
        return

    # generate — the input channel count must match the trained checkpoint
    meta_path = os.path.join(args.ckpt or "", "meta.json")
    if args.ckpt and os.path.exists(meta_path):
        with open(meta_path) as f:
            args.z_context = int(json.load(f).get("z_context", args.z_context))
    chans = 2 * args.z_context + 1
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, chans)))
    if args.ckpt and ckpt_io.latest_exists(args.ckpt, "classifier"):
        params = ckpt_io.restore_checkpoint(params, args.ckpt, "classifier")
        print(f"loaded classifier from {args.ckpt}/classifier")
    else:
        print("warning: no classifier checkpoint; heatmaps from init weights")
    os.makedirs(args.out, exist_ok=True)
    pvs = [
        pv for phase in split.values() for pv in phase
        if os.path.exists(os.path.join(args.dataroot, "CT", pv + ".nii.gz"))
    ]
    for pv in sorted(set(pvs)):
        ct_img = nifti.load(os.path.join(args.dataroot, "CT", pv + ".nii.gz"))
        ct, lb = ct_img.get_fdata(), load_pv(pv)[1]
        sl, idx = _slices_for(ct, lb, int(pv.rsplit("_", 1)[1]),
                              z_context=args.z_context)
        if sl is None:
            continue
        x = jnp.asarray(sl)
        logits = model.apply(params, x)
        cls = int(jnp.mean(jnp.argmax(logits, -1) + 0.0) > 0.5)
        cams = np.asarray(grad_cam_pp(model, params, x, target_class=1))
        vol = np.zeros_like(ct, np.float32)
        for k, z in enumerate(idx):
            vol[:, :, z] = cams[k, :, :, 0]
        nifti.save(
            nifti.Nifti1Image(vol, ct_img.affine),
            os.path.join(args.out, f"{pv}_{cls}.nii.gz"),
        )
        print(f"{pv}: class {cls}, {len(idx)} slices")


if __name__ == "__main__":
    main()
