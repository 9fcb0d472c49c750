"""SVM grading parity vs the reference's own evaluate_svm.

The reference function (evaluation/SVM_grading.py:9-80) is pandas+sklearn;
both run in this image. Its xlsx read is monkeypatched to a synthetic RHLV
table; ours reads the same rows from CSV. Per-fold confusion matrices and
macro metrics must match exactly (same sklearn, deterministic folds/SVC).
"""

import importlib.util
import os
import re
import sys

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from ref_loader import REF, reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _load_reference_svm():
    path = os.path.join(REF, "evaluation", "SVM_grading.py")
    spec = importlib.util.spec_from_file_location("_ref_svm", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_svm"] = mod
    spec.loader.exec_module(mod)
    return mod


def _synth_table(rng, n=260):
    """RHLV rows with grade-dependent means (Genant-like separability+noise)."""
    rows = []
    for i in range(n):
        label = int(rng.integers(0, 4))
        base = [0.02, 0.18, 0.30, 0.45][label]
        pre = base + rng.normal(0, 0.06)
        mid = base * 0.8 + rng.normal(0, 0.06)
        post = base * 0.6 + rng.normal(0, 0.06)
        # dataset blocks in order (train, test, val), as the real xlsx writer
        # emits them — the reference indexes the filtered train/test Series
        # with positional fold indices, which only works when those rows
        # keep a contiguous 0..N-1 index (SVM_grading.py:38-39)
        dataset = "train" if i < n // 2 else ("test" if i < 3 * n // 4 else "val")
        rows.append(
            dict(
                Vertebra=f"p{i:04d}_20",
                Label=label,
                Dataset=dataset,
                **{
                    "All RHLV": (pre + mid + post) / 3,
                    "Pre RHLV": pre,
                    "Mid RHLV": mid,
                    "Post RHLV": post,
                    "Relative Height Label": 1.0 - base,
                },
            )
        )
    return pd.DataFrame(rows)


def test_svm_grading_matches_reference(tmp_path, monkeypatch):
    ref = _load_reference_svm()
    from healthivert_tpu.evaluation.grading import evaluate_svm

    rng = np.random.default_rng(0)
    df = _synth_table(rng)
    features = ["Pre RHLV", "Mid RHLV", "Post RHLV"]

    monkeypatch.setattr(ref.pd, "read_excel", lambda _p: df.copy())
    ref_txt = str(tmp_path / "ref.txt")
    ref.evaluate_svm("ignored.xlsx", features, ref_txt)

    csv_path = str(tmp_path / "table.csv")
    df.to_csv(csv_path, index=False)
    our_txt = str(tmp_path / "ours.txt")
    summary = evaluate_svm(csv_path, features, our_txt)

    ref_out = open(ref_txt).read()
    def grab(name):
        return float(re.search(rf"Average {name}: ([0-9.eE+-]+) ", ref_out).group(1))

    assert summary["f1"]["mean"] == pytest.approx(grab("F1 Score"), abs=1e-12)
    assert summary["precision"]["mean"] == pytest.approx(grab("Precision"), abs=1e-12)
    assert summary["recall"]["mean"] == pytest.approx(grab("Recall"), abs=1e-12)
    assert summary["accuracy"]["mean"] == pytest.approx(grab("Accuracy"), abs=1e-12)
    # per-fold confusion matrices byte-identical in the txt dumps
    ref_cms = re.findall(r"Confusion Matrix:\n(\[[^F]*?)\nF1", ref_out, re.S)
    our_cms = re.findall(r"Confusion Matrix:\n(\[[^F]*?)\nF1", open(our_txt).read(), re.S)
    assert len(ref_cms) == len(our_cms) == 5
    assert ref_cms == our_cms
