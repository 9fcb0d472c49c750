"""Hermetic end-to-end pipeline test: synthetic cohort -> batched 3D
synthesis -> RHLV tables -> SVM grading, all through the library APIs the
CLIs wrap (SURVEY.md §4 test strategy)."""

import json
import os

import jax
import numpy as np

from healthivert_tpu.data.synthetic import make_spine_volume
from healthivert_tpu.engine.infer3d import synthesize_volume
from healthivert_tpu.evaluation.grading import FEATURES_SAGITTAL, evaluate_svm
from healthivert_tpu.evaluation.rhlv import process_datasets
from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state
from healthivert_tpu.utils import nifti

CFG = Pix2PixConfig(ngf=4, ndf=8, image_size=64)


def test_full_clinical_chain(tmp_path, rng):
    label_dir = tmp_path / "label"
    fake_dir = tmp_path / "fake" / "label_fake"
    os.makedirs(label_dir)
    os.makedirs(fake_dir)

    state = init_state(jax.random.PRNGKey(0), CFG)
    split = {"train": {}, "test": {}, "val": {}}
    idx = 0
    for phase, n in (("train", 8), ("test", 4), ("val", 2)):
        for i in range(n):
            grade = 0 if i % 2 == 0 else 2
            frac = {} if grade == 0 else {20: 0.55}
            ct, labels, cam = make_spine_volume(
                rng, shape=(64, 64, 16), vert_ids=(19, 20, 21),
                vert_height=12, gap=5, fractured=frac,
            )
            pv = f"case{idx:03d}_20"
            idx += 1
            # batched two-stage synthesis (untrained weights: the seg output
            # is arbitrary but the pipeline mechanics and the real-label side
            # of RHLV are fully exercised)
            _, lb_fake = synthesize_volume(
                state.g_params, state.g_sn, CFG, ct, labels, 20, cam,
                batch_size=8, use_bf16=False,
            )
            nifti.save(nifti.Nifti1Image(labels), str(label_dir / f"{pv}.nii.gz"))
            nifti.save(
                nifti.Nifti1Image(lb_fake.astype(np.float32)),
                str(fake_dir / f"{pv}.nii.gz"),
            )
            split[phase][pv] = grade

    rows = process_datasets(
        split, str(label_dir), str(fake_dir), str(tmp_path / "rhlv.csv")
    )
    assert len(rows) == 14
    assert {r["Dataset"] for r in rows} == {"train", "test", "val"}

    summary = evaluate_svm(
        str(tmp_path / "rhlv.csv"), FEATURES_SAGITTAL, str(tmp_path / "grading.txt")
    )
    for k in ("f1", "precision", "recall", "accuracy"):
        assert 0.0 <= summary[k]["mean"] <= 1.0
    report = (tmp_path / "grading.txt").read_text()
    assert "Average F1 Score" in report and "Confusion Matrix" in report
