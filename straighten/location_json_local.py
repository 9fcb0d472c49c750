#!/usr/bin/env python
"""Centroid extraction CLI: per-patient vertebra centers-of-mass json.

Drop-in surface for /root/reference/straighten/location_json_local.py with a
--root flag instead of a hard-coded path. Expects {root}/{patient}/
{patient}_msk.nii.gz (or _seg); writes {root}/{patient}/{patient}.json.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthivert_tpu.straighten.pipeline import write_centroid_json  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    args = p.parse_args(argv)
    for patient in sorted(os.listdir(args.root)):
        pdir = os.path.join(args.root, patient)
        if not os.path.isdir(pdir):
            continue
        seg = os.path.join(pdir, f"{patient}_seg.nii.gz")
        if not os.path.exists(seg):
            seg = os.path.join(pdir, f"{patient}_msk.nii.gz")
        if not os.path.exists(seg):
            continue
        data = write_centroid_json(seg, os.path.join(pdir, f"{patient}.json"))
        print(patient, [e["label"] for e in data])


if __name__ == "__main__":
    main()
