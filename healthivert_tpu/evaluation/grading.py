"""SVM Genant grading from RHLV features.

Parity with /root/reference/evaluation/SVM_grading.py:9-79: StandardScaler
fit on train+test and applied to val, linear SVC with balanced class
weights, 5-fold StratifiedKFold (each fold's model evaluated on the held-out
val split), per-fold confusion matrix + macro P/R/F1 + accuracy, averages
and variances written to a txt report.

SVM_grading_2.5d merges sagittal + coronal tables on 'Vertebra' -> 6
features (SVM_grading_2.5d.py:17-31).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .rhlv import read_rows

FEATURES_SAGITTAL: Sequence[str] = ("Pre RHLV", "Mid RHLV", "Post RHLV")


def evaluate_svm(filepath: str, features: Sequence[str], output_txt: str) -> dict:
    from sklearn.metrics import (
        accuracy_score,
        confusion_matrix,
        f1_score,
        precision_score,
        recall_score,
    )
    from sklearn.model_selection import StratifiedKFold
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    # accept a pre-built DataFrame (the 2.5D merge) or a table path
    data = filepath if hasattr(filepath, "columns") else read_rows(filepath)
    tt = data[data["Dataset"].isin(["train", "test"])]
    val = data[data["Dataset"] == "val"]

    x_tt = tt[list(features)].to_numpy()
    y_tt = tt["Label"].to_numpy()
    x_val = val[list(features)].to_numpy()
    y_val = val["Label"].to_numpy()

    scaler = StandardScaler()
    x_tt = scaler.fit_transform(x_tt)
    x_val = scaler.transform(x_val)

    clf = SVC(kernel="linear", class_weight="balanced")
    skf = StratifiedKFold(n_splits=5)

    folds = []
    for train_idx, _ in skf.split(x_tt, y_tt):
        clf.fit(x_tt[train_idx], y_tt[train_idx])
        pred = clf.predict(x_val)
        folds.append(
            dict(
                cm=confusion_matrix(y_val, pred),
                f1=f1_score(y_val, pred, average="macro"),
                precision=precision_score(y_val, pred, average="macro", zero_division=0),
                recall=recall_score(y_val, pred, average="macro", zero_division=0),
                accuracy=accuracy_score(y_val, pred),
            )
        )

    summary = {
        k: dict(mean=float(np.mean([f[k] for f in folds])), var=float(np.var([f[k] for f in folds])))
        for k in ("f1", "precision", "recall", "accuracy")
    }
    with open(output_txt, "w") as f:
        for i, fold in enumerate(folds):
            f.write(f"Fold {i + 1}:\nConfusion Matrix:\n{fold['cm']}\n")
            f.write(
                f"F1 Score: {fold['f1']}, Precision: {fold['precision']}, "
                f"Recall: {fold['recall']}, Accuracy: {fold['accuracy']}\n\n"
            )
        f.write("Average Scores:\n")
        f.write(f"Average F1 Score: {summary['f1']['mean']} (Variance: {summary['f1']['var']})\n")
        f.write(f"Average Precision: {summary['precision']['mean']} (Variance: {summary['precision']['var']})\n")
        f.write(f"Average Recall: {summary['recall']['mean']} (Variance: {summary['recall']['var']})\n")
        f.write(f"Average Accuracy: {summary['accuracy']['mean']} (Variance: {summary['accuracy']['var']})\n")
    print(f"Results saved to {output_txt}")
    return summary


def merge_25d(sagittal_path: str, coronal_path: str):
    """Join sagittal + coronal RHLV tables on Vertebra -> 6-feature table."""
    sag = read_rows(sagittal_path)
    cor = read_rows(coronal_path)
    merged = sag.merge(
        cor[["Vertebra", "Pre RHLV", "Mid RHLV", "Post RHLV"]],
        on="Vertebra",
        suffixes=("_sag", "_cor"),
    )
    features: List[str] = [
        "Pre RHLV_sag", "Mid RHLV_sag", "Post RHLV_sag",
        "Pre RHLV_cor", "Mid RHLV_cor", "Post RHLV_cor",
    ]
    return merged, features


def evaluate_svm_25d(sagittal_path: str, coronal_path: str, output_txt: str) -> dict:
    merged, features = merge_25d(sagittal_path, coronal_path)
    return evaluate_svm(merged, features, output_txt)
