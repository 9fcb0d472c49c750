"""Generation-quality metrics: 3D IoU/Dice/RVD + patch & global PSNR/SSIM.

Parity with /root/reference/evaluation/generation_eval_sagittal.py:11-111
(and the coronal variant's axis-1 slicing): metrics on val-normal vertebrae
only, slices restricted to the central 4/5 with > 400 foreground px, patch
metrics on rows cropped to the vertebra extent, skimage-default SSIM
(implemented in ops.image since skimage is unavailable).
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from healthivert_tpu.evaluation.rhlv import _slice_at
from healthivert_tpu.ops import image as I
from healthivert_tpu.utils import nifti


def calculate_iou(a, b):
    inter = np.sum(a * b)
    union = np.sum((a + b) > 0)
    return inter / union if union else 0.0


def calculate_dice(a, b):
    inter = np.sum(a * b)
    union = np.sum(a) + np.sum(b)
    return 2.0 * inter / union if union else 0.0


def relative_volume_difference(a, b):
    va, vb = np.sum(a), np.sum(b)
    return abs(va - vb) / va if va else 0.0


def _bucket(n: int) -> int:
    """Pad metric batches to multiples of 8 so each slice shape compiles a
    handful of variants, not one per batch count. Multiples of 8 (not pow2):
    volumes run ~30-50 valid slices, so pow2 padded up to ~60% extra compute
    — measurably a net LOSS on CPU where dispatches are cheap
    (experiments/geneval_bench.py), while <=7 pad rows keep both backends
    ahead."""
    return -(-n // 8) * 8


def _metric_rows(rows, want_ssim: bool = True):
    """PSNR/SSIM for a list of same-shape (a, b, data_range) slice pairs in
    ONE device dispatch (ops.image.psnr_ssim_batch). Returns two lists
    aligned with `rows`, np.nan where the reference's guards fire (dr <= 0
    for both; shape < win for SSIM, or want_ssim=False). Multi-row batches
    are zero-padded to a bucket size (discarded rows cost nothing
    meaningful); single rows dispatch unpadded — vmap rows are independent,
    so values are identical at any batch size (pinned by
    tests/test_metrics_golden.py)."""
    n = len(rows)
    if n == 0:
        return [], []
    h, w = rows[0][0].shape
    nb = 1 if n == 1 else _bucket(n)
    a = np.zeros((nb, h, w), np.float32)
    b = np.zeros((nb, h, w), np.float32)
    dr = np.ones((nb,), np.float32)
    for i, (ai, bi, di) in enumerate(rows):
        a[i], b[i] = ai, bi
        dr[i] = di if di > 0 else 1.0  # placeholder; masked to nan below
    with_ssim = want_ssim and min(h, w) >= 7
    p, s = I.psnr_ssim_batch(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(dr), with_ssim=with_ssim
    )
    p = np.asarray(p)
    psnrs = [float(p[i]) if rows[i][2] > 0 else np.nan for i in range(n)]
    if not with_ssim:
        return psnrs, [np.nan] * n
    s = np.asarray(s)
    ssims = [float(s[i]) if rows[i][2] > 0 else np.nan for i in range(n)]
    return psnrs, ssims


def _ssim(a, b, dr):
    _, (s,) = _metric_rows([(np.asarray(a, np.float32), np.asarray(b, np.float32), dr)])
    return s


def _psnr(a, b, dr):
    (p,), _ = _metric_rows(
        [(np.asarray(a, np.float32), np.asarray(b, np.float32), dr)],
        want_ssim=False,
    )
    return p


def process_images(ori_ct_path, fake_ct_path, ori_seg_path, fake_seg_path, axis=2) -> Dict[str, float]:
    ori_ct = nifti.load(ori_ct_path).get_fdata()
    fake_ct = nifti.load(fake_ct_path).get_fdata()
    vid = int(os.path.basename(ori_seg_path)[: -len(".nii.gz")].split("_")[-1])
    ori_seg = (nifti.load(ori_seg_path).get_fdata() == vid).astype(np.float64)
    fake_seg = (nifti.load(fake_seg_path).get_fdata() == vid).astype(np.float64)

    out = dict(
        iou=calculate_iou(ori_seg, fake_seg),
        dice=calculate_dice(ori_seg, fake_seg),
        rvd=relative_volume_difference(ori_seg, fake_seg),
    )

    loc = np.where(ori_seg)[axis]
    if loc.size == 0:
        # label volume without the expected vertebra id (failed synthesis or
        # misnamed file): no slices to metric. Zero patch metrics make
        # evaluate_experiment skip this vertebra entirely, the reference's
        # behavior for degenerate metric returns (:142-147).
        out.update(patch_psnr=0.0, patch_ssim=0.0, global_psnr=0.0, global_ssim=0.0)
        return out
    z0, z1 = int(loc.min()), int(loc.max())
    range_length = z1 - z0 + 1
    new_len = int(range_length * 4 / 5)
    nz0 = z0 + (range_length - new_len) // 2
    nz1 = nz0 + new_len - 1

    # Gather every valid slice first, then metric them in batched dispatches:
    # one for the global slices (uniform shape) and one per patch-crop height
    # (the vertebra row extent varies by slice). Per-slice values are
    # identical to per-slice calls — only the dispatch count changes
    # (4/slice -> ~2-6/volume), which is what dominates on the tunneled TPU.
    glob_rows, patch_groups = [], {}
    for z in range(nz0, nz1 + 1):
        seg_sl = _slice_at(ori_seg, z, axis)
        if seg_sl.sum() <= 400:
            continue
        rows = np.argwhere(seg_sl)[:, 0]
        x1, x2 = int(rows.min()), int(rows.max())
        co = _slice_at(ori_ct, z, axis)[x1 : x2 + 1]
        cf = _slice_at(fake_ct, z, axis)[x1 : x2 + 1]
        patch_groups.setdefault(x2 - x1 + 1, []).append((co, cf, co.max() - co.min()))

        go = _slice_at(ori_ct, z, axis)
        gf = _slice_at(fake_ct, z, axis)
        glob_rows.append((go, gf, go.max() - go.min()))

    patch_psnr, patch_ssim, glob_psnr, glob_ssim = [], [], [], []
    for group in patch_groups.values():
        ps, ss = _metric_rows(group)
        patch_psnr += [p for p in ps if not np.isnan(p)]
        patch_ssim += [s for s in ss if not np.isnan(s)]
    ps, ss = _metric_rows(glob_rows)
    glob_psnr += [p for p in ps if not np.isnan(p)]
    glob_ssim += [s for s in ss if not np.isnan(s)]

    out.update(
        patch_psnr=float(np.mean(patch_psnr)) if patch_psnr else 0.0,
        patch_ssim=float(np.mean(patch_ssim)) if patch_ssim else 0.0,
        global_psnr=float(np.mean(glob_psnr)) if glob_psnr else 0.0,
        global_ssim=float(np.mean(glob_ssim)) if glob_ssim else 0.0,
    )
    return out


def evaluate_experiment(
    split: Dict[str, int],
    ct_folder: str,
    label_folder: str,
    fake_folder: str,
    output_txt: str = None,
    axis: int = 2,
    normal_only: bool = True,
) -> Dict[str, float]:
    """Average metrics over (val, normal) vertebrae of one experiment dir
    (generation_eval_sagittal.py:114-162). Normal means grade == 0 here —
    the reference's val_normal_vert filter (:118-120); the <= 1 convention
    belongs to the TRAINING split (aligned_dataset.py:62), not this eval.
    Vertebrae whose patch PSNR/SSIM comes back 0 or NaN are excluded from
    every average, including IoU/Dice (reference :142-147 `continue`s
    before appending to any list)."""
    sums, n = {}, 0
    for vertebra, grade in split.items():
        if normal_only and int(grade) != 0:
            continue
        paths = dict(
            ori_ct=os.path.join(ct_folder, vertebra + ".nii.gz"),
            fake_ct=os.path.join(fake_folder, "CT_fake", vertebra + ".nii.gz"),
            ori_seg=os.path.join(label_folder, vertebra + ".nii.gz"),
            fake_seg=os.path.join(fake_folder, "label_fake", vertebra + ".nii.gz"),
        )
        if not all(os.path.exists(p) for p in paths.values()):
            continue
        m = process_images(paths["ori_ct"], paths["fake_ct"], paths["ori_seg"], paths["fake_seg"], axis)
        if (
            np.isnan(m["patch_psnr"]) or np.isnan(m["patch_ssim"])
            or m["patch_psnr"] == 0 or m["patch_ssim"] == 0
        ):
            continue
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + v
        n += 1
    avg = {k: v / n for k, v in sums.items()} if n else {}
    avg["count"] = n
    if output_txt and avg:
        with open(output_txt, "w") as f:
            for k, v in avg.items():
                f.write(f"{k}: {v}\n")
    return avg
