"""Offline categorical SER scorer.

Capability parity with reference ``src/metrics/categorical_metrics.py:23-256``:
score a predictions CSV against ``labels_consensus.csv`` ground truth —
auto-detect the filename/prediction columns, strip ``_snrN_...`` suffixes to
match augmented filenames to their base utterance, filter X/O, optional
split filter; emit accuracy, macro-F1, weighted-F1, a per-class report CSV,
a confusion-matrix PNG, a per-class F1 bar chart, and a class-distribution
CSV.

Usage (CLI):
    python -m nrse_tpu.metrics.categorical_metrics \
        --predictions preds.csv --ground_truth labels_consensus.csv \
        --output_dir out/ [--split Test2]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np

from nrse_tpu.labels.parsing import VALID_EMOTIONS_MAP, clean_filename

FILENAME_COLUMNS = ["file_name", "Filename", "FileName", "filename"]
PREDICTION_COLUMNS = ["prediction", "Prediction", "pred", "predicted_class",
                      "EmoClass"]


def _detect_column(df, candidates, kind: str) -> str:
    for c in candidates:
        if c in df.columns:
            return c
    raise ValueError(
        f"could not find a {kind} column in predictions; "
        f"looked for {candidates}, got {list(df.columns)}"
    )


def _normalize_prediction(value) -> Optional[str]:
    """Letter code, class name, or class index → letter code."""
    names_to_code = {
        "anger": "A", "happiness": "H", "sadness": "S", "fear": "F",
        "surprise": "U", "disgust": "D", "contempt": "C", "neutral": "N",
    }
    s = str(value).strip()
    if s in VALID_EMOTIONS_MAP:
        return s
    if s.lower() in names_to_code:
        return names_to_code[s.lower()]
    try:
        idx = int(float(s))
        inv = {v: k for k, v in VALID_EMOTIONS_MAP.items()}
        return inv.get(idx)
    except ValueError:
        return None


def score_predictions(predictions_csv: str, ground_truth_csv: str,
                      output_dir: str, split: Optional[str] = None) -> Dict:
    import pandas as pd
    from sklearn.metrics import (
        accuracy_score,
        classification_report,
        confusion_matrix,
        f1_score,
    )

    os.makedirs(output_dir, exist_ok=True)
    preds_df = pd.read_csv(predictions_csv)
    gt_df = pd.read_csv(ground_truth_csv)

    if split:
        if "Split_Set" in gt_df.columns:
            gt_df = gt_df[gt_df["Split_Set"] == split]
        else:
            print("Warning: 'Split_Set' column not found in ground truth. "
                  "Cannot filter by split.")

    # keep valid 8-class ground truth only (X/O filtered)
    gt_df = gt_df[gt_df["EmoClass"].isin(VALID_EMOTIONS_MAP.keys())]
    gt_map = dict(zip(gt_df["FileName"], gt_df["EmoClass"]))

    fname_col = _detect_column(preds_df, FILENAME_COLUMNS, "filename")
    pred_col = _detect_column(preds_df, PREDICTION_COLUMNS, "prediction")

    y_true, y_pred, missing = [], [], 0
    for _, row in preds_df.iterrows():
        base = clean_filename(str(row[fname_col]))
        gt = gt_map.get(base)
        pred = _normalize_prediction(row[pred_col])
        if gt is None or pred is None:
            missing += 1
            continue
        y_true.append(VALID_EMOTIONS_MAP[gt])
        y_pred.append(VALID_EMOTIONS_MAP[pred])
    if missing:
        print(f"Skipped {missing} predictions without ground truth / valid class")
    if not y_true:
        raise ValueError("no overlapping (prediction, ground-truth) pairs")

    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    # score over classes actually present (sklearn default semantics —
    # macro-F1 shouldn't be diluted by classes absent from this list)
    present = sorted(set(y_true.tolist()) | set(y_pred.tolist()))
    all_names = list(VALID_EMOTIONS_MAP.keys())
    class_names = [all_names[i] for i in present]
    metrics = {
        "accuracy": float(accuracy_score(y_true, y_pred)),
        "macro_f1": float(f1_score(y_true, y_pred, average="macro",
                                   labels=present, zero_division=0)),
        "weighted_f1": float(f1_score(y_true, y_pred, average="weighted",
                                      labels=present, zero_division=0)),
        "n_scored": int(len(y_true)),
    }

    report = classification_report(
        y_true, y_pred, labels=present, target_names=class_names,
        output_dict=True, zero_division=0,
    )
    pd.DataFrame(report).T.to_csv(os.path.join(output_dir, "class_report.csv"))

    dist = pd.Series(y_true).value_counts().sort_index()
    dist.index = [all_names[i] for i in dist.index]
    dist.to_csv(os.path.join(output_dir, "class_distribution.csv"),
                header=["count"])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    cm = confusion_matrix(y_true, y_pred, labels=present)
    plt.figure(figsize=(10, 8))
    sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                xticklabels=class_names, yticklabels=class_names)
    plt.xlabel("Predicted")
    plt.ylabel("True")
    plt.title("Confusion Matrix")
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "confusion_matrix.png"))
    plt.close()

    f1s = [report[name]["f1-score"] for name in class_names]
    plt.figure(figsize=(10, 5))
    plt.bar(class_names, f1s)
    plt.ylabel("F1")
    plt.title("Per-class F1")
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "per_class_f1.png"))
    plt.close()

    with open(os.path.join(output_dir, "metrics.txt"), "w") as f:
        for k, v in metrics.items():
            f.write(f"{k}: {v}\n")
    print(f"accuracy={metrics['accuracy']:.4f} "
          f"macro_f1={metrics['macro_f1']:.4f} "
          f"weighted_f1={metrics['weighted_f1']:.4f} "
          f"(n={metrics['n_scored']})")
    return metrics


def main(argv=None):
    parser = argparse.ArgumentParser(description="Score SER predictions")
    parser.add_argument("--predictions", required=True)
    parser.add_argument("--ground_truth", required=True)
    parser.add_argument("--output_dir", default="metrics_out")
    parser.add_argument("--split", default=None)
    args = parser.parse_args(argv)
    return score_predictions(args.predictions, args.ground_truth,
                             args.output_dir, args.split)


if __name__ == "__main__":
    main()
