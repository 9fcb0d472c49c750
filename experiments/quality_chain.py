#!/usr/bin/env python
"""Regenerate the full e2e quality chain on the SHIPPED checkpoint
(VERDICT r4 #1 follow-through): fresh synthetic cohort -> 3D synthesis
(eval_3d CLI) -> generation eval -> RHLV -> 5-fold SVM, printing the
summary table the README cites.

    python -u experiments/quality_chain.py [--out DIR] [--gpu_ids 0]
        [--name pretrained_synthetic] [--compute_dtype bfloat16] [--seed 1]

All stages run through the real CLIs (subprocesses), so this doubles as an
end-to-end surface drive.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "experiments"))

from hgam_e2e import build_cohort, run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/quality_chain")
    ap.add_argument("--gpu_ids", default="0")
    ap.add_argument("--name", default="pretrained_synthetic")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cases", type=int, nargs=3, default=(10, 3, 3),
                    metavar=("TRAIN", "VAL", "TEST"),
                    help="cohort cases per phase (5 vertebrae each); the "
                         "5-fold SVM figure is noisy below ~150 vertebrae")
    args = ap.parse_args()

    root = os.path.join(args.out, "data")
    os.makedirs(args.out, exist_ok=True)

    print("== 1. cohort", flush=True)
    split = build_cohort(root, seed=args.seed, n_cases=tuple(args.cases))
    counts = {ph: len(v) for ph, v in split.items()}
    print(f"vertebrae per phase: {counts}")

    print("== 2. 3D synthesis (eval_3d CLI, shipped checkpoint)", flush=True)
    synth_dir = os.path.join(args.out, "output_3d")
    run([sys.executable, "-u", "eval_3d_sagittal_twostage.py",
         "--dataroot", root, "--name", args.name,
         # procedural CAMs = the checkpoint's training distribution (the
         # first r4 run omitted them — zero CAM channel — and scored
         # Dice 0.808; see /tmp/quality_chain_r4)
         "--cam_dir", os.path.join(root, "cam_procedural"),
         "--results_dir", synth_dir, "--gpu_ids", args.gpu_ids,
         "--compute_dtype", args.compute_dtype],
        os.path.join(args.out, "synth.log"))
    n = len(os.listdir(os.path.join(synth_dir, "CT_fake")))
    print(f"synthesized {n} vertebra volumes")

    print("== 3. generation eval (val, grade==0 cohort)", flush=True)
    gen_log = run([sys.executable, "-u", "evaluation/generation_eval_sagittal.py",
         "--split", os.path.join(root, "vertebra_data_local.json"),
         "--phase", "val",
         "--ct_folder", os.path.join(root, "CT"),
         "--label_folder", os.path.join(root, "label"),
         "--output_folder", synth_dir,
         "--result_folder", os.path.join(args.out, "generation_eval"),
         "--gpu_ids", args.gpu_ids],
        os.path.join(args.out, "geneval.log"))
    print("\n".join(gen_log.splitlines()[-6:]))

    print("== 4. RHLV quantification", flush=True)
    rhlv_dir = os.path.join(args.out, "rhlv")
    run([sys.executable, "-u", "evaluation/RHLV_quantification.py",
         "--split", os.path.join(root, "vertebra_data_local.json"),
         "--label_folder", os.path.join(root, "label"),
         "--output_folder", synth_dir, "--result_folder", rhlv_dir],
        os.path.join(args.out, "rhlv.log"))
    # RHLV summary by grade (mean of the three sector RHLVs)
    import csv

    by_grade = {}
    for f in os.listdir(rhlv_dir):
        if not f.endswith(".csv"):
            continue
        with open(os.path.join(rhlv_dir, f)) as fh:
            for row in csv.DictReader(fh):
                g = int(float(row["Label"]))
                by_grade.setdefault(g, []).append(
                    tuple(float(row[k]) for k in ("All RHLV", "Pre RHLV", "Post RHLV"))
                )
    for g in sorted(by_grade):
        v = by_grade[g]
        m = [sum(col) / len(col) for col in zip(*v)]
        print(f"grade {g} (n={len(v)}): All {m[0]:+.3f}  Pre {m[1]:+.3f}  "
              f"Post {m[2]:+.3f}")

    print("== 5. SVM grading (5-fold)", flush=True)
    svm_log = run([sys.executable, "-u", "evaluation/SVM_grading.py",
         "--result_folder", rhlv_dir,
         "--grading_folder", os.path.join(args.out, "classification_metric")],
        os.path.join(args.out, "svm.log"))
    print("\n".join(svm_log.splitlines()[-8:]))
    print("QUALITY CHAIN COMPLETE ->", args.out)


if __name__ == "__main__":
    main()
