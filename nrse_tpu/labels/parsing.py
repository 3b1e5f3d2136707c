"""MSP-Podcast label parsing.

Covers both label surfaces the reference consumes:

* Semicolon label lists ``path; EmoClass; A:x; V:y; D:z;``
  (reference parser ``baseline/eval_cat_ser_weighted_with_list.py:57-120``,
  list fixtures under ``labels/*.txt``).
* The ``labels_consensus.csv`` table with columns FileName, EmoClass,
  EmoAct/EmoVal/EmoDom, Split_Set, SpkrID, Gender
  (reference ``src/data/emotion_dataset.py:32-120``).

Two emotion→index orderings exist in the reference and both are preserved:

* ``VALID_EMOTIONS_MAP`` — the NRSE ordering A,H,S,F,U,D,C,N
  (``src/data/emotion_dataset.py:13-22``).
* ``BASELINE_EMOTIONS_MAP`` — the Odyssey-2024 challenge ordering
  A,S,H,U,F,D,C,N (``baseline/eval_cat_ser_weighted_with_list.py:86-96``).

Also includes the SNR-suffix filename normalisation used by the offline
scorer (``src/metrics/categorical_metrics.py:51-58``) and label reformat
tooling (``labels/processed/reformat_txt_baseline_gt.py:30-59``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# NRSE ordering (reference src/data/emotion_dataset.py:13-22)
VALID_EMOTIONS_MAP: Dict[str, int] = {
    "A": 0,  # Anger
    "H": 1,  # Happiness
    "S": 2,  # Sadness
    "F": 3,  # Fear
    "U": 4,  # Surprise
    "D": 5,  # Disgust
    "C": 6,  # Contempt
    "N": 7,  # Neutral
}
INVALID_EMOTIONS_MAP: Dict[str, int] = {
    "X": 8,  # No agreement
    "O": 9,  # Other
}
EMOTIONS_MAP: Dict[str, int] = {**VALID_EMOTIONS_MAP, **INVALID_EMOTIONS_MAP}

# Odyssey-2024 challenge ordering (reference baseline/...:86-96)
BASELINE_EMOTIONS_MAP: Dict[str, int] = {
    "A": 0,  # Anger
    "S": 1,  # Sadness
    "H": 2,  # Happiness
    "U": 3,  # Surprise
    "F": 4,  # Fear
    "D": 5,  # Disgust
    "C": 6,  # Contempt
    "N": 7,  # Neutral
}

EMOTION_NAMES: Dict[str, str] = {
    "A": "Anger",
    "H": "Happiness",
    "S": "Sadness",
    "F": "Fear",
    "U": "Surprise",
    "D": "Disgust",
    "C": "Contempt",
    "N": "Neutral",
    "X": "NoAgreement",
    "O": "Other",
}


@dataclass
class LabelEntry:
    """One row of a semicolon label list."""

    path: str
    emo_class: str
    emotion: int  # index in the chosen ordering, -1 if unknown/invalid
    arousal: Optional[float] = None
    valence: Optional[float] = None
    dominance: Optional[float] = None
    extra: Dict[str, float] = field(default_factory=dict)


def parse_label_list(
    list_path: str,
    audio_dir: Optional[str] = None,
    emotion_map: Optional[Dict[str, int]] = None,
    drop_invalid: bool = False,
) -> List[LabelEntry]:
    """Parse a semicolon label list into LabelEntry rows.

    Format per line: ``path; EmoClass; A:x; V:y; D:z;``.  Unknown emotion
    codes map to index -1 (reference parity:
    ``baseline/eval_cat_ser_weighted_with_list.py:97``).  With
    ``drop_invalid`` the X/O rows are removed, reproducing the
    ``labels/processed`` filtering (``labels/processed/process_txt_label.py``).
    """
    emotion_map = emotion_map or BASELINE_EMOTIONS_MAP
    entries: List[LabelEntry] = []
    with open(list_path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(";")
            if len(parts) < 2:
                continue
            path = parts[0].strip()
            if audio_dir and not os.path.isabs(path):
                path = os.path.join(audio_dir, path)
            emo = parts[1].strip()
            if drop_invalid and emo in INVALID_EMOTIONS_MAP:
                continue
            entry = LabelEntry(path=path, emo_class=emo,
                               emotion=emotion_map.get(emo, -1))
            for seg in parts[2:]:
                seg = seg.strip()
                if not seg or ":" not in seg:
                    continue
                key, value = seg.split(":", 1)
                key, value = key.strip(), value.strip()
                try:
                    fval = float(value)
                except ValueError:
                    entry.extra[key] = value
                    continue
                if key == "A":
                    entry.arousal = fval
                elif key == "V":
                    entry.valence = fval
                elif key == "D":
                    entry.dominance = fval
                else:
                    entry.extra[key] = fval
            entries.append(entry)
    return entries


def write_label_list(entries: Sequence[LabelEntry], out_path: str) -> None:
    """Write entries back in the semicolon list format."""
    with open(out_path, "w") as f:
        for e in entries:
            f.write(
                f"{e.path}; {e.emo_class}; A:{e.arousal}; V:{e.valence}; "
                f"D:{e.dominance};\n"
            )


def parse_consensus_csv(
    labels_file: str,
    split: Optional[str] = None,
    categorical_only: bool = True,
    emotion_map: Optional[Dict[str, int]] = None,
):
    """Load ``labels_consensus.csv`` as a pandas DataFrame, filtered.

    Mirrors the reference EmotionDataset's filtering
    (``src/data/emotion_dataset.py:77-86``): optional split filter, then keep
    only rows whose EmoClass is in the chosen emotion map (the valid 8 when
    ``categorical_only``, otherwise all 10 including X/O).
    """
    import pandas as pd

    emotion_map = emotion_map or (
        VALID_EMOTIONS_MAP if categorical_only else EMOTIONS_MAP
    )
    df = pd.read_csv(labels_file)
    if split:
        df = df[df["Split_Set"] == split]
    df = df[df["EmoClass"].isin(emotion_map.keys())]
    return df


def filter_consensus_csv(in_path: str, out_path: str) -> int:
    """Drop X/O rows from a consensus CSV; returns rows kept.

    Equivalent of ``labels/processed/process_csv_label.py:15-58``.
    """
    df = parse_consensus_csv(in_path, categorical_only=True)
    df.to_csv(out_path, index=False)
    return len(df)


def filter_label_list(in_path: str, out_path: str) -> int:
    """Drop X/O lines from a semicolon list; returns lines kept.

    Equivalent of ``labels/processed/process_txt_label.py:14-60``.
    """
    entries = parse_label_list(in_path, drop_invalid=True)
    write_label_list(entries, out_path)
    return len(entries)


def clean_filename(filename: str) -> str:
    """Strip path + ``_snrN_...`` suffix, restoring the base ``.wav`` name.

    Equivalent of the scorer's normalisation
    (``src/metrics/categorical_metrics.py:51-58``).
    """
    base = os.path.basename(filename)
    if "_snr" in base:
        base = base.split("_snr")[0] + ".wav"
    return base


def base_filename_candidates(filename: str) -> List[str]:
    """Candidate base names for an augmented MSP-PODCAST filename.

    Augmented names look like ``MSP-PODCAST_0133_0459_snr2_IPb6u22cLIo.wav``;
    some utterance IDs have 3 underscore segments, some 4, so both are
    returned (equivalent of
    ``labels/processed/reformat_txt_baseline_gt.py:30-59``).
    """
    if "_snr" not in filename:
        return [filename]
    base_part = os.path.basename(filename).split("_snr")[0]
    segments = base_part.split("_")
    if len(segments) < 3:
        return [filename]
    candidates = ["_".join(segments[:3]) + ".wav"]
    if len(segments) >= 4:
        candidates.append("_".join(segments[:4]) + ".wav")
    return candidates


def reformat_lists_to_onehot_csv(list_paths: Sequence[str],
                                 consensus_csv: Optional[str],
                                 out_csv: str,
                                 preserve_path: bool = False) -> int:
    """Semicolon label lists → baseline one-hot CSV with Split_Set lookup.

    Equivalent of ``labels/processed/reformat_txt_baseline_gt.py:61-139``:
    each list row becomes ``FileName, A,S,H,U,F,D,C,N [, Split_Set]``
    (Odyssey column order); augmented ``_snrN_`` names resolve their
    Split_Set via the base-name candidates against the consensus CSV.
    Returns rows written.
    """
    import pandas as pd

    split_lookup = {}
    if consensus_csv:
        gt = pd.read_csv(consensus_csv)
        if "Split_Set" in gt.columns:
            split_lookup = dict(zip(gt["FileName"], gt["Split_Set"]))

    rows = []
    for list_path in list_paths:
        for e in parse_label_list(list_path, emotion_map=BASELINE_EMOTIONS_MAP):
            one_hot = emotion_to_one_hot(e.emo_class)
            split = None
            for cand in base_filename_candidates(e.path):
                split = split_lookup.get(os.path.basename(cand))
                if split is not None:
                    break
            name = e.path if preserve_path else os.path.basename(e.path)
            row = {"FileName": name}
            row.update({code: one_hot[i]
                        for code, i in BASELINE_EMOTIONS_MAP.items()})
            if split_lookup:
                row["Split_Set"] = split
            rows.append(row)
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    return len(rows)


def emotion_to_one_hot(emo_class: str,
                       emotion_map: Optional[Dict[str, int]] = None,
                       num_classes: int = 8) -> np.ndarray:
    """One-hot encode an emotion code (unknown codes give all-zeros).

    Equivalent of ``labels/processed/reformat_txt_baseline_gt.py:10-28``.
    """
    emotion_map = emotion_map or BASELINE_EMOTIONS_MAP
    one_hot = np.zeros(num_classes, dtype=np.float32)
    idx = emotion_map.get(emo_class, -1)
    if 0 <= idx < num_classes:
        one_hot[idx] = 1.0
    return one_hot
