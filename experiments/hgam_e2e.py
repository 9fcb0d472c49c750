#!/usr/bin/env python
"""HGAM closed-loop experiment (VERDICT r3 #5): classifier-GENERATED CAMs
drive the GAN, end-to-end, instead of the synthetic cohort's procedural ones.

Chain (all through the real CLIs / dataset classes):
  1. materialize a synthetic straightened cohort to disk as NIfTIs
     ({root}/CT,label/{pv}.nii.gz + vertebra_data_local.json split)
  2. train the fracture classifier on it
     (Attention/grad_CAM_3d_sagittal.py train)
  3. generate Grad-CAM++ heatmap NIfTIs ({pv}_{cls}.nii.gz, the exact
     layout aligned_dataset.py:162-171 consumes)
  4. GAN training twice on the SAME aligned cohort: --cam_dir pointing at
     the classifier heatmaps vs no cam_dir (zero CAM channel), comparing
     in-training eval
  5. 3D synthesis (eval_3d CLI) with --cam_dir on the val split

    python -u experiments/hgam_e2e.py [--out DIR] [--gpu_ids -1]
        [--cls_steps 300] [--gan_steps 150]
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_cohort(root, seed=0, n_cases=(10, 3, 3)):
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "CT"), exist_ok=True)
    os.makedirs(os.path.join(root, "label"), exist_ok=True)
    # the synthetic generator's procedural CAMs, materialized in the layout
    # find_cam_path expects (bare {pv}.nii.gz) — the checkpoint was trained
    # WITH a CAM channel, so chains that want its training distribution pass
    # --cam_dir {root}/cam_procedural (classifier-generated CAMs live
    # elsewhere; this experiment compares against them)
    os.makedirs(os.path.join(root, "cam_procedural"), exist_ok=True)
    split = {"train": {}, "val": {}, "test": {}}
    idx = 0
    # grade -> compression fraction (data/synthetic.py wedge model)
    frac_of = {0: 1.0, 1: 0.8, 2: 0.63, 3: 0.45}
    for phase, n_phase in zip(("train", "val", "test"), n_cases):
        for _ in range(n_phase):
            vert_ids = (18, 19, 20, 21, 22)
            fractured = {}
            grades = {}
            for vid in vert_ids:
                g = int(rng.choice([0, 0, 0, 1, 2, 3]))
                grades[vid] = g
                if g > 0:
                    fractured[vid] = frac_of[g]
            ct, labels, cam = make_spine_volume(
                rng, shape=(256, 256, 32), vert_ids=vert_ids,
                vert_height=26, gap=10, fractured=fractured,
            )
            case = f"case{idx:03d}"
            idx += 1
            for vid in vert_ids:
                split[phase][f"{case}_{vid}"] = grades[vid]
            nifti.save(
                nifti.Nifti1Image(ct.astype(np.float32)),
                os.path.join(root, "CT", f"{case}_{vert_ids[0]}.nii.gz"),
            )
            nifti.save(
                nifti.Nifti1Image(labels.astype(np.float32)),
                os.path.join(root, "label", f"{case}_{vert_ids[0]}.nii.gz"),
            )
            nifti.save(
                nifti.Nifti1Image(cam.astype(np.float32)),
                os.path.join(root, "cam_procedural", f"{case}_{vert_ids[0]}.nii.gz"),
            )
            # per-vertebra files share the volume (the loader addresses
            # {case}_{vid}.nii.gz individually, as the reference layout does)
            for vid in vert_ids[1:]:
                for sub in ("CT", "label", "cam_procedural"):
                    src = os.path.join(root, sub, f"{case}_{vert_ids[0]}.nii.gz")
                    dst = os.path.join(root, sub, f"{case}_{vid}.nii.gz")
                    if not os.path.exists(dst):
                        os.link(src, dst)
    with open(os.path.join(root, "vertebra_data_local.json"), "w") as f:
        json.dump(split, f)
    return split


def run(cmd, log):
    print(f"$ {' '.join(cmd)}", flush=True)
    with open(log, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    out = open(log).read()
    if p.returncode != 0:
        print(out[-3000:])
        raise SystemExit(f"FAILED ({p.returncode}): {' '.join(cmd)}")
    return out


def last_eval(log_text):
    evs = re.findall(r"epoch\[\d+\] SSIM.*", log_text)
    return evs[-1] if evs else "(no eval line)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hgam_e2e")
    ap.add_argument("--gpu_ids", default="0")
    ap.add_argument("--cls_steps", type=int, default=300)
    ap.add_argument("--gan_steps", type=int, default=150)
    ap.add_argument("--z_context", type=int, default=2,
                    help="2.5D classifier context (0 = the r4 pure-2D mode)")
    args = ap.parse_args()

    root = os.path.join(args.out, "data")
    cam_dir = os.path.join(args.out, "heatmaps")
    os.makedirs(args.out, exist_ok=True)

    print("== 1. cohort", flush=True)
    split = build_cohort(root)
    n_frac = sum(1 for g in split["train"].values() if g > 1)
    print(f"train vertebrae: {len(split['train'])} ({n_frac} grade>1)")

    print("== 2. classifier train", flush=True)
    run([sys.executable, "-u", "Attention/grad_CAM_3d_sagittal.py", "train",
         "--dataroot", root, "--split", os.path.join(root, "vertebra_data_local.json"),
         "--out", os.path.join(args.out, "cls"), "--steps", str(args.cls_steps),
         "--z_context", str(args.z_context),
         "--gpu_ids", args.gpu_ids], os.path.join(args.out, "cls_train.log"))
    print(open(os.path.join(args.out, "cls_train.log")).read().splitlines()[-1])

    print("== 3. heatmap generation", flush=True)
    gen_log = run([sys.executable, "-u", "Attention/grad_CAM_3d_sagittal.py", "generate",
         "--dataroot", root, "--split", os.path.join(root, "vertebra_data_local.json"),
         "--ckpt", os.path.join(args.out, "cls"), "--out", cam_dir,
         "--gpu_ids", args.gpu_ids], os.path.join(args.out, "cam_gen.log"))
    cams = sorted(os.listdir(cam_dir))
    # classifier accuracy on its own training distribution: predicted class
    # (suffix) vs split grade
    right = total = 0
    for c in cams:
        pv, cls = c[:-len(".nii.gz")].rsplit("_", 1)
        g = None
        for ph in split.values():
            if pv in ph:
                g = ph[pv]
        if g is None:
            continue
        total += 1
        right += int((g > 1) == (int(cls) == 1))
    print(f"heatmaps: {len(cams)}; predicted-class agreement vs grade>1: "
          f"{right}/{total} = {right / max(total, 1):.2f}")

    from healthivert_tpu.utils import nifti
    sample = nifti.load(os.path.join(cam_dir, cams[0])).get_fdata()
    assert sample.min() >= 0 and sample.max() <= 1.0 + 1e-6, "CAM out of [0,1]"

    print("== 4. GAN training: classifier CAMs vs zero CAMs", flush=True)
    common = [sys.executable, "-u", "train.py", "--dataset_mode", "aligned",
              "--dataroot", root, "--direction", "BtoA", "--batch_size", "8",
              "--compute_dtype", "bfloat16", "--seed", "5",
              "--max_steps", str(args.gan_steps), "--n_epochs", "150",
              "--n_epochs_decay", "150", "--eval_freq", "2",
              "--display_freq", "99999", "--print_freq", "64",
              "--checkpoints_dir", os.path.join(args.out, "ckpt"),
              "--gpu_ids", args.gpu_ids]
    log_a = run(common + ["--name", "gan_clscam", "--cam_dir", cam_dir],
                os.path.join(args.out, "gan_clscam.log"))
    log_b = run(common + ["--name", "gan_nocam"],
                os.path.join(args.out, "gan_nocam.log"))
    print("classifier-CAM run:", last_eval(log_a))
    print("zero-CAM run:      ", last_eval(log_b))

    print("== 5. 3D synthesis with --cam_dir on val", flush=True)
    run([sys.executable, "-u", "eval_3d_sagittal_twostage.py",
         "--dataroot", root, "--cam_dir", cam_dir, "--phase", "val",
         "--name", "gan_clscam",
         "--checkpoints_dir", os.path.join(args.out, "ckpt"),
         "--results_dir", os.path.join(args.out, "synth3d"),
         "--gpu_ids", args.gpu_ids],
        os.path.join(args.out, "synth3d.log"))
    fake_dir = None
    for dirpath, _dirs, files in os.walk(os.path.join(args.out, "synth3d")):
        if any(f.endswith(".nii.gz") for f in files):
            fake_dir = dirpath
            n = len([f for f in files if f.endswith(".nii.gz")])
            print(f"3D outputs: {n} NIfTIs under {dirpath}")
    assert fake_dir, "no 3D synthesis outputs"
    print("HGAM closed loop COMPLETE")


if __name__ == "__main__":
    main()
