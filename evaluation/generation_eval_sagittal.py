#!/usr/bin/env python
"""Generation-quality evaluation CLI (sagittal; pass --coronal for axis 1).

    python evaluation/generation_eval_sagittal.py --split vertebra_data.json \
        --phase val --ct_folder <straightened/CT> --label_folder <straightened/label> \
        --output_folder <output_3d-with-experiment-dirs> --result_folder <out>
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthivert_tpu.evaluation.generation import evaluate_experiment  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--split", default="vertebra_data.json")
    p.add_argument("--phase", default="val")
    p.add_argument("--ct_folder", required=True)
    p.add_argument("--label_folder", required=True)
    p.add_argument("--output_folder", required=True)
    p.add_argument("--result_folder", required=True)
    p.add_argument("--coronal", action="store_true")
    p.add_argument("--gpu_ids", default="0",
                   help="-1 = compute the PSNR/SSIM batches on CPU "
                        "(reference semantics; the other CLIs share this flag)")
    args = p.parse_args(argv)

    # same backend-selection + persistent-compile-cache setup as the
    # options.py-based CLIs (strict typo errors included)
    from healthivert_tpu.config.options import BaseOptions

    BaseOptions._apply_device_options(args)

    with open(args.split) as f:
        split = json.load(f)[args.phase]
    os.makedirs(args.result_folder, exist_ok=True)
    axis = 1 if args.coronal else 2

    exps = [
        d for d in sorted(os.listdir(args.output_folder))
        if os.path.isdir(os.path.join(args.output_folder, d, "CT_fake"))
    ]
    if not exps and os.path.isdir(os.path.join(args.output_folder, "CT_fake")):
        exps = ["."]
    for d in exps:
        name = os.path.basename(os.path.abspath(os.path.join(args.output_folder, d)))
        if args.coronal and "coronal" not in name and d != ".":
            continue  # reference filters coronal dirs (generation_eval_coronal.py:132-135)
        out = os.path.join(args.result_folder, name + ".txt")
        avg = evaluate_experiment(
            split, args.ct_folder, args.label_folder,
            os.path.join(args.output_folder, d), out, axis,
        )
        print(name, {k: round(v, 4) if isinstance(v, float) else v for k, v in avg.items()})


if __name__ == "__main__":
    main()
