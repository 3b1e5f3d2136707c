from nrse_tpu.labels.parsing import (
    VALID_EMOTIONS_MAP,
    INVALID_EMOTIONS_MAP,
    EMOTIONS_MAP,
    BASELINE_EMOTIONS_MAP,
    EMOTION_NAMES,
    parse_label_list,
    parse_consensus_csv,
    clean_filename,
    base_filename_candidates,
    emotion_to_one_hot,
)

__all__ = [
    "VALID_EMOTIONS_MAP",
    "INVALID_EMOTIONS_MAP",
    "EMOTIONS_MAP",
    "BASELINE_EMOTIONS_MAP",
    "EMOTION_NAMES",
    "parse_label_list",
    "parse_consensus_csv",
    "clean_filename",
    "base_filename_candidates",
    "emotion_to_one_hot",
]
