#!/usr/bin/env python
"""SVM Genant grading CLI. Drop-in for the reference script.

    python evaluation/SVM_grading.py --result_folder <rhlv-tables-dir> \
        --grading_folder <out-dir>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthivert_tpu.evaluation.grading import FEATURES_SAGITTAL, evaluate_svm  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--result_folder", default="evaluation/RHLV_quantification")
    p.add_argument("--grading_folder", default="evaluation/classification_metric")
    args = p.parse_args(argv)

    os.makedirs(args.grading_folder, exist_ok=True)
    for f in sorted(os.listdir(args.result_folder)):
        if not (f.endswith(".csv") or f.endswith(".xlsx")):
            continue
        name = f.rsplit(".", 1)[0]
        out = os.path.join(args.grading_folder, name + ".txt")
        s = evaluate_svm(os.path.join(args.result_folder, f), FEATURES_SAGITTAL, out)
        print(f"{name}: macro-F1 {s['f1']['mean']:.4f} P {s['precision']['mean']:.4f} R {s['recall']['mean']:.4f}")


if __name__ == "__main__":
    main()
