"""RHLV quantification: relative height loss between fake and real vertebrae.

Math parity with /root/reference/evaluation/RHLV_quantification.py:41-147
(sagittal, axis=2) and RHLV_quantification_coronal.py (axis=1): per-slice
column heights split into anterior/middle/posterior thirds of the FAKE
segmentation's y-extent, scale-ratio correction when the real label is
taller than the fake, 0.7x-center-height column filtering, and
RHLV = (H_fake - H_label) / H_fake per region.

Output rows use the reference xlsx schema {Vertebra, Label, Dataset,
All/Pre/Mid/Post RHLV, Relative Height Label}; written as CSV (openpyxl is
not available in this image — pandas reads either).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from healthivert_tpu.utils import nifti


def _slice_at(vol: np.ndarray, z: int, axis: int) -> np.ndarray:
    return vol[:, :, z] if axis == 2 else vol[:, z, :]


def calculate_heights(seg_fake, seg_label, height_threshold: float, axis: int = 2):
    """Accumulate per-column heights over slices; returns 8 arrays
    (all/pre/mid/post x fake/label)."""
    acc = {k: [] for k in ("all_f", "all_l", "pre_f", "pre_l", "mid_f", "mid_l", "post_f", "post_l")}
    for z in range(seg_label.shape[axis]):
        lab = _slice_at(seg_label, z, axis)
        fak = _slice_at(seg_fake, z, axis)
        if not (lab.any() and fak.any()):
            continue
        loc = np.where(fak)[1]
        y_min, y_max = int(loc.min()), int(loc.max())
        y_range = y_max - y_min
        one_third = int(y_min + y_range / 3)
        two_third = int(y_min + 2 * y_range / 3)

        center_f = np.count_nonzero(fak[:, int(loc.mean())])
        all_f = np.count_nonzero(fak, axis=0)
        pre_f = np.count_nonzero(fak[:, :one_third], axis=0)
        mid_f = np.count_nonzero(fak[:, one_third:two_third], axis=0)
        post_f = np.count_nonzero(fak[:, two_third:], axis=0)

        lloc = np.where(lab)[1]
        center_l = np.count_nonzero(lab[:, int(lloc.mean())])
        all_l = np.count_nonzero(lab, axis=0)
        pre_l = np.count_nonzero(lab[:, :one_third], axis=0)
        mid_l = np.count_nonzero(lab[:, one_third:two_third], axis=0)
        post_l = np.count_nonzero(lab[:, two_third:], axis=0)

        def ratio(l, f):
            if l.size and f.size and l.max() > f.max():
                return l.max() / (f.max() + 1e-6)
            return 1.0

        r_all, r_pre, r_mid, r_post = (
            ratio(all_l, all_f), ratio(pre_l, pre_f), ratio(mid_l, mid_f), ratio(post_l, post_f),
        )
        all_f = all_f * r_all
        center_fs = center_f * r_all
        pre_f = pre_f * r_pre
        mid_f = mid_f * r_mid
        post_f = post_f * r_post

        t = height_threshold
        acc["all_f"].extend(all_f[all_f > center_fs * t])
        acc["all_l"].extend(all_l[all_l > center_l * t])
        acc["pre_f"].extend(pre_f[pre_f > center_fs * t])
        acc["pre_l"].extend(pre_l[pre_l > center_l * t])
        acc["mid_f"].extend(mid_f[mid_f > center_fs * t])
        acc["mid_l"].extend(mid_l[mid_l > center_l * t])
        acc["post_f"].extend(post_f[post_f > center_fs * t])
        acc["post_l"].extend(post_l[post_l > center_l * t])
    return {k: np.array(v) for k, v in acc.items()}


def calculate_rhlv(seg_fake, seg_label, center_z, length, height_threshold=0.7, axis: int = 2):
    """RHLV over the central window [center_z - length, center_z + length).

    Deliberate deviation: the start is clamped to 0. The reference
    (RHLV_quantification.py:125-126) lets center_z - length go negative,
    which numpy-wraps the slice to an empty window and silently emits an
    all-zero RHLV row (a fake "healthy" grading input) for labels whose
    mass sits near the volume edge. Well-formed straightened crops never
    trigger this, so the oracle parity (tests/test_rhlv_oracle.py) holds."""
    sl = [slice(None)] * 3
    sl[axis] = slice(max(0, center_z - length), center_z + length)
    h = calculate_heights(seg_fake[tuple(sl)], seg_label[tuple(sl)], height_threshold, axis)

    def mean(a):
        return float(np.mean(a)) if a.size else 0.0

    all_f, all_l = mean(h["all_f"]), mean(h["all_l"])
    pre_f, pre_l = mean(h["pre_f"]), mean(h["pre_l"])
    mid_f, mid_l = mean(h["mid_f"]), mean(h["mid_l"])
    post_f, post_l = mean(h["post_f"]), mean(h["post_l"])

    rhlv = lambda f, l: (f - l) / (f + 1e-6)
    mn, mx = min(pre_l, mid_l, post_l), max(pre_l, mid_l, post_l)
    return (
        rhlv(all_f, all_l), rhlv(pre_f, pre_l), rhlv(mid_f, mid_l), rhlv(post_f, post_l),
        mn / (mx + 1e-6),
    )


def process_datasets(
    dataset_info: Dict[str, Dict[str, int]],
    label_folder: str,
    fake_folder: str,
    output_file: str,
    length_divisor: int = 5,
    height_threshold: float = 0.7,
    axis: int = 2,
) -> List[dict]:
    """Walk {dataset: {vertebra: grade}}, compute RHLV rows, write CSV."""
    results = []
    for dataset_type, data in dataset_info.items():
        for vertebra, grade in data.items():
            lp = os.path.join(label_folder, vertebra + ".nii.gz")
            fp = os.path.join(fake_folder, vertebra + ".nii.gz")
            if not (os.path.exists(lp) and os.path.exists(fp)):
                continue
            lab_t = nifti.load(lp).get_fdata()
            fak_t = nifti.load(fp).get_fdata()
            vid = int(vertebra.split("_")[-1])
            lab = (lab_t == vid).astype(np.float64)
            fak = (fak_t == vid).astype(np.float64)
            loc = np.where(lab)[axis]
            if loc.size == 0:
                continue
            center = int(loc.mean())
            length = (int(loc.max()) - int(loc.min())) // length_divisor
            a, p, m, po, rel = calculate_rhlv(fak, lab, center, length, height_threshold, axis)
            results.append({
                "Vertebra": vertebra, "Label": grade, "Dataset": dataset_type,
                "All RHLV": a, "Pre RHLV": p, "Mid RHLV": m, "Post RHLV": po,
                "Relative Height Label": rel,
            })
    if output_file:
        write_rows(results, output_file)
    return results


def write_rows(rows: List[dict], output_file: str):
    import pandas as pd

    df = pd.DataFrame(rows)
    if output_file.endswith(".xlsx"):
        try:
            df.to_excel(output_file, index=False)
            return
        except (ImportError, ModuleNotFoundError):
            output_file = output_file[:-5] + ".csv"
    df.to_csv(output_file, index=False)


def read_rows(path: str):
    import pandas as pd

    if path.endswith(".xlsx"):
        try:
            return pd.read_excel(path)
        except (ImportError, ModuleNotFoundError):
            alt = path[:-5] + ".csv"
            if os.path.exists(alt):
                return pd.read_csv(alt)
            raise
    return pd.read_csv(path)
