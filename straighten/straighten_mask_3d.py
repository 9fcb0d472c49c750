#!/usr/bin/env python
"""Spine straightening + de-pedicle masking CLI.

Drop-in surface for /root/reference/straighten/straighten_mask_3d.py with
flags. Per patient: HU-window, straighten CT (order 1) and labels (order 0)
along the extended centroid curve with the sagittal-constrained basis,
posterior-element cleanup, then per-vertebra 256x256x64 crops + de-pedicle
masks into {out}/{CT,label,mask_2d}/{patient}_{vert}.nii.gz.

    # all vertebrae found in each patient's centroid json:
    python straighten/straighten_mask_3d.py --root <raw-root> --out <dir>
    # or restricted via a split json {category: {patient: [vert_ids]}}:
    python straighten/straighten_mask_3d.py --root <raw-root> --out <dir> \
        --split patient_vertebrae.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthivert_tpu.straighten.pipeline import process_data, process_mask3d  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--split", default=None)
    p.add_argument("--size", type=int, nargs=3, default=(256, 256, 64))
    p.add_argument("--mask_mode", choices=("rect", "left", "3d"), default="rect",
                   help="de-pedicle mask strategy (reference alternates :308-363/:438-461)")
    p.add_argument("--reorient", default=None, metavar="RAI",
                   help="reorient volumes to this axis-code order before straightening")
    args = p.parse_args(argv)

    if args.split:
        with open(args.split) as f:
            data = json.load(f)
        done = process_data(args.root, data, args.out, tuple(args.size),
                            mask_mode=args.mask_mode, reorient=args.reorient)
        print(f"straightened {len(done)} vertebrae")
        return

    for patient in sorted(os.listdir(args.root)):
        pdir = os.path.join(args.root, patient)
        js = os.path.join(pdir, f"{patient}.json")
        ct = os.path.join(pdir, f"{patient}.nii.gz")
        msk = os.path.join(pdir, f"{patient}_msk.nii.gz")
        if not os.path.exists(msk):
            msk = os.path.join(pdir, f"{patient}_seg.nii.gz")
        if not (os.path.exists(js) and os.path.exists(msk)):
            continue
        if not os.path.exists(ct):
            print(f"{patient}: no raw CT, straightening labels only (CT=labels)")
            ct = msk
        with open(js) as f:
            vert_ids = [e["label"] for e in json.load(f) if isinstance(e, dict)]
        outs = process_mask3d(ct, msk, js, vert_ids, args.out, tuple(args.size),
                              mask_mode=args.mask_mode, reorient=args.reorient)
        print(patient, "->", outs)


if __name__ == "__main__":
    main()
