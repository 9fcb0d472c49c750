"""RHLV + grading + generation metrics on synthetic spines with known truth."""

import json
import os

import numpy as np
import pytest

from healthivert_tpu.data.synthetic import make_spine_volume
from healthivert_tpu.evaluation.generation import evaluate_experiment
from healthivert_tpu.evaluation.grading import FEATURES_SAGITTAL, evaluate_svm
from healthivert_tpu.evaluation.rhlv import calculate_rhlv, process_datasets, write_rows
from healthivert_tpu.utils import nifti


def _volumes(rng, frac):
    """healthy (fake) + fractured (label) volume pair for vertebra 20."""
    healthy_ct, healthy_lb, _ = make_spine_volume(rng, fractured={})
    frac_ct, frac_lb, _ = make_spine_volume(rng, fractured={20: frac})
    return healthy_lb, frac_lb


def test_rhlv_detects_compression(rng):
    healthy_lb, frac_lb = _volumes(rng, 0.5)
    fake = (healthy_lb == 20).astype(np.float64)  # synthesized pseudo-healthy
    real = (frac_lb == 20).astype(np.float64)  # actual fractured
    loc = np.where(real)[2]
    center, length = int(loc.mean()), (loc.max() - loc.min()) // 5
    a, p, m, po, rel = calculate_rhlv(fake, real, center, length)
    # fractured anterior: fake taller than label -> positive RHLV, pre worst
    assert a > 0.1, a
    assert p > m > -0.05, (p, m, po)
    # a healthy vertebra against itself -> ~0 everywhere
    a0, p0, m0, po0, _ = calculate_rhlv(fake, fake, center, length)
    assert abs(a0) < 1e-3 and abs(p0) < 1e-3


def test_process_datasets_and_svm(tmp_path, rng):
    # build a tiny cohort: grade 0 (healthy) and grade 2 (50% compression)
    label_dir = tmp_path / "label"
    fake_dir = tmp_path / "fake"
    os.makedirs(label_dir)
    os.makedirs(fake_dir)
    split = {"train": {}, "test": {}, "val": {}}
    idx = 0
    for phase, n in (("train", 8), ("test", 4), ("val", 4)):
        for i in range(n):
            grade = 0 if i % 2 == 0 else 2
            frac = 1.0 if grade == 0 else 0.5
            healthy_ct, healthy_lb, _ = make_spine_volume(
                rng, shape=(128, 128, 32), vert_ids=(19, 20, 21),
                vert_height=18, gap=8, fractured={},
            )
            _, frac_lb, _ = make_spine_volume(
                rng, shape=(128, 128, 32), vert_ids=(19, 20, 21),
                vert_height=18, gap=8, fractured={20: frac},
            )
            pv = f"case{idx:03d}_20"
            idx += 1
            nifti.save(nifti.Nifti1Image(frac_lb), str(label_dir / f"{pv}.nii.gz"))
            nifti.save(nifti.Nifti1Image(healthy_lb), str(fake_dir / f"{pv}.nii.gz"))
            split[phase][pv] = grade

    out = str(tmp_path / "rhlv.csv")
    rows = process_datasets(split, str(label_dir), str(fake_dir), out)
    assert len(rows) == 16
    # fractured cases must show materially higher RHLV
    frac_rhlv = [r["All RHLV"] for r in rows if r["Label"] == 2]
    heal_rhlv = [r["All RHLV"] for r in rows if r["Label"] == 0]
    assert min(frac_rhlv) > max(heal_rhlv) + 0.05

    summary = evaluate_svm(out, FEATURES_SAGITTAL, str(tmp_path / "grading.txt"))
    # trivially separable cohort -> perfect grading
    assert summary["f1"]["mean"] > 0.99, summary
    assert (tmp_path / "grading.txt").read_text().startswith("Fold 1:")


def test_generation_eval_identity(tmp_path, rng):
    ct, lb, _ = make_spine_volume(rng, shape=(128, 128, 32), vert_ids=(19, 20, 21),
                                  vert_height=18, gap=8)
    for d in ("CT", "label", "exp/CT_fake", "exp/label_fake"):
        os.makedirs(tmp_path / d)
    pv = "case000_20"
    nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "CT" / f"{pv}.nii.gz"))
    nifti.save(nifti.Nifti1Image(lb), str(tmp_path / "label" / f"{pv}.nii.gz"))
    nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "exp/CT_fake" / f"{pv}.nii.gz"))
    nifti.save(nifti.Nifti1Image(lb), str(tmp_path / "exp/label_fake" / f"{pv}.nii.gz"))
    avg = evaluate_experiment(
        {pv: 0}, str(tmp_path / "CT"), str(tmp_path / "label"), str(tmp_path / "exp"),
    )
    assert avg["count"] == 1
    assert avg["iou"] == pytest.approx(1.0)
    assert avg["dice"] == pytest.approx(1.0)
    assert avg["rvd"] == 0.0
    assert avg["global_ssim"] == pytest.approx(1.0, abs=1e-5)
    assert avg["patch_psnr"] > 60


def test_generation_eval_normal_is_grade_zero_only(tmp_path, rng):
    """The val-normal cohort is grade == 0 (generation_eval_sagittal.py:118-
    120); grade-1 (mild fracture) vertebrae must be excluded. The <= 1
    convention belongs to the training split, not this eval."""
    ct, lb, _ = make_spine_volume(rng, shape=(128, 128, 32), vert_ids=(19, 20, 21),
                                  vert_height=18, gap=8)
    for d in ("CT", "label", "exp/CT_fake", "exp/label_fake"):
        os.makedirs(tmp_path / d)
    split = {}
    for pv, grade in (("case000_20", 0), ("case001_20", 1), ("case002_20", 3)):
        nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "CT" / f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(lb), str(tmp_path / "label" / f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "exp/CT_fake" / f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(lb), str(tmp_path / "exp/label_fake" / f"{pv}.nii.gz"))
        split[pv] = grade
    avg = evaluate_experiment(
        split, str(tmp_path / "CT"), str(tmp_path / "label"), str(tmp_path / "exp"),
    )
    assert avg["count"] == 1  # only the grade-0 vertebra


def test_generation_eval_skips_degenerate_vertebrae(tmp_path, rng):
    """A label volume lacking the expected vertebra id (or with no valid
    slices) must be skipped — excluded from count and ALL averages, incl.
    IoU/Dice — not crash or contribute 0.0 rows (reference
    generation_eval_sagittal.py:142-147 `continue`s on NaN/0 metrics)."""
    ct, lb, _ = make_spine_volume(rng, shape=(128, 128, 32), vert_ids=(19, 20, 21),
                                  vert_height=18, gap=8)
    for d in ("CT", "label", "exp/CT_fake", "exp/label_fake"):
        os.makedirs(tmp_path / d)
    good, bad = "case000_20", "case001_20"
    for pv in (good, bad):
        # the BAD case's ori label volume has no vertebra-20 voxels at all
        ori_lb = lb if pv == good else (lb * (lb != 20)).astype(lb.dtype)
        nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "CT" / f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(ori_lb), str(tmp_path / "label" / f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "exp/CT_fake" / f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(lb), str(tmp_path / "exp/label_fake" / f"{pv}.nii.gz"))
    avg = evaluate_experiment(
        {good: 0, bad: 0}, str(tmp_path / "CT"), str(tmp_path / "label"),
        str(tmp_path / "exp"),
    )
    assert avg["count"] == 1
    assert avg["dice"] == pytest.approx(1.0)  # the bad case's 0.0 not averaged in


def test_rhlv_window_clamped_at_volume_edge(rng):
    """center_z - length < 0 must clamp to 0 (documented deviation: the
    reference numpy-wraps to an empty window and silently emits all-zero
    RHLV — a fake 'healthy' row)."""
    healthy_lb, frac_lb = _volumes(rng, 0.5)
    fake = (healthy_lb == 20).astype(np.float64)
    real = (frac_lb == 20).astype(np.float64)
    loc = np.where(real)[2]
    # place the window to spill past z=0: center 2, half-length 10
    a, p, m, po, rel = calculate_rhlv(fake, real, 2, 10)
    ref = calculate_rhlv(fake, real, 10, 10)  # interior sanity anchor
    assert (a, p, m, po) != (0.0, 0.0, 0.0, 0.0)
    assert np.isfinite([a, p, m, po, rel]).all() and abs(ref[0]) > 0


def test_rhlv_coronal_axis_consistency(rng):
    """axis=1 on a (X, Z, Y)-swapped volume must equal axis=2 on the original
    (the coronal variant is the same math over the other slicing axis)."""
    healthy_lb, frac_lb = _volumes(rng, 0.5)
    fake = (healthy_lb == 20).astype(np.float64)
    real = (frac_lb == 20).astype(np.float64)
    loc = np.where(real)[2]
    center, length = int(loc.mean()), (loc.max() - loc.min()) // 5
    sag = calculate_rhlv(fake, real, center, length, axis=2)
    # swap axes 1<->2: slicing axis 1 of the swapped volume = axis 2 original
    cor = calculate_rhlv(
        fake.transpose(0, 2, 1), real.transpose(0, 2, 1), center, length, axis=1
    )
    np.testing.assert_allclose(sag, cor, rtol=1e-12)


def test_generation_eval_coronal_axis(tmp_path, rng):
    ct, lb, _ = make_spine_volume(rng, shape=(128, 128, 32), vert_ids=(19, 20, 21),
                                  vert_height=18, gap=8)
    for d in ("CT", "label", "exp/CT_fake", "exp/label_fake"):
        os.makedirs(tmp_path / d)
    pv = "case000_20"
    nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "CT" / f"{pv}.nii.gz"))
    nifti.save(nifti.Nifti1Image(lb), str(tmp_path / "label" / f"{pv}.nii.gz"))
    nifti.save(nifti.Nifti1Image(ct.astype(np.float32)), str(tmp_path / "exp/CT_fake" / f"{pv}.nii.gz"))
    nifti.save(nifti.Nifti1Image(lb), str(tmp_path / "exp/label_fake" / f"{pv}.nii.gz"))
    avg = evaluate_experiment(
        {pv: 0}, str(tmp_path / "CT"), str(tmp_path / "label"), str(tmp_path / "exp"),
        axis=1,
    )
    assert avg["count"] == 1 and avg["dice"] == pytest.approx(1.0)
