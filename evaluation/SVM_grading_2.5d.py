#!/usr/bin/env python
"""2.5D SVM grading: merge sagittal + coronal RHLV tables -> 6 features.

    python evaluation/SVM_grading_2.5d.py --sagittal <table> --coronal <table> \
        --output <txt>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthivert_tpu.evaluation.grading import evaluate_svm_25d  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sagittal", required=True)
    p.add_argument("--coronal", required=True)
    p.add_argument("--output", default="classification_2.5d.txt")
    args = p.parse_args(argv)
    s = evaluate_svm_25d(args.sagittal, args.coronal, args.output)
    print(f"2.5D macro-F1 {s['f1']['mean']:.4f} P {s['precision']['mean']:.4f} R {s['recall']['mean']:.4f}")


if __name__ == "__main__":
    main()
