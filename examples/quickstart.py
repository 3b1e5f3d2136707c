"""Quickstart: the full nrse-tpu workflow on a synthetic corpus.

Covers what the reference's dev notebook drives ad hoc (corpus validation,
BYOL pretraining, SER training, robustness eval, offline scoring), end to
end on mock data, small enough for CPU:

    python examples/quickstart.py [workdir]

On TPU, drop `--device cpu` and point the YAML at a real corpus.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str = "/tmp/nrse_quickstart"):
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # 1. synthetic corpus (stands in for the Demucs-cleaned speech + AudioSet
    #    noise corpora) + corpus validation
    from nrse_tpu.data.mock import create_mock_corpus
    from nrse_tpu.utils.preprocess_audio_files import preprocess_audio_files

    clean_dir, noise_dir = create_mock_corpus("corpus", n_clean=12, n_noise=4)
    good, bad = preprocess_audio_files(clean_dir)
    print(f"[1] corpus: {len(good)} healthy files, {len(bad)} flagged")

    # 2. BYOL pretraining (tiny encoder; swap name to microsoft/wavlm-large
    #    on TPU)
    cfg = {
        "model": {"name": "wavlm-tiny", "projection_dim": 32,
                  "prediction_dim": 64, "ema_decay": 0.99},
        "training": {"batch_size": 8, "num_workers": 2, "num_epochs": 2,
                     "learning_rate": 1e-3, "weight_decay": 1e-5,
                     "checkpoint_dir": "ckpts/byol", "log_dir": "logs",
                     "seed": 42, "early_stopping_metric": "val_loss",
                     "early_stopping_patience": 5,
                     "early_stopping_min_delta": 0.0},
        "data": {"clean_data_path": clean_dir, "noise_data_path": noise_dir,
                 "sample_rate": 16000, "max_audio_length": 1.0,
                 "snr_range": [0, 5, 10], "validation_ratio": 0.34},
        "logging": {"wandb_mode": "disabled", "level": "ERROR",
                    "console_level": "ERROR", "visualization_interval": 2},
        "tpu": {"mesh": {"data": -1, "model": 1}, "prefetch_depth": 0},
    }
    yaml.safe_dump(cfg, open("byol.yaml", "w"))

    import train_byol

    print("[2] BYOL pretraining...")
    train_byol.main(["--config", "byol.yaml", "--device", "cpu"])

    # 3. SER training on a mock MSP-Podcast layout, initialised from the
    #    BYOL encoder
    import pandas as pd

    from nrse_tpu.audio.io import save_wav

    rng = np.random.default_rng(0)
    os.makedirs("msp/Audios", exist_ok=True)
    rows = []
    for i in range(14):
        name = f"MSP-PODCAST_{1000+i}_{i:04d}.wav"
        t = np.arange(int(16000 * rng.uniform(0.5, 1.0))) / 16000
        x = 0.4 * np.sin(2 * np.pi * rng.uniform(90, 350) * t)
        save_wav(f"msp/Audios/{name}", x.astype(np.float32), 16000)
        rows.append({"FileName": name,
                     "EmoClass": ["A", "H", "S", "N"][i % 4],
                     "EmoAct": rng.uniform(1, 7), "EmoVal": rng.uniform(1, 7),
                     "EmoDom": rng.uniform(1, 7),
                     "Split_Set": "Development" if i < 10 else "Test1",
                     "SpkrID": i, "Gender": "Male"})
    pd.DataFrame(rows).to_csv("msp/labels_consensus.csv", index=False)

    cfg["emotion"] = {
        "labels_file": "msp/labels_consensus.csv", "audio_dir": "msp/Audios",
        "encoder_checkpoint": "ckpts/byol/best_val_loss",
        "checkpoint_dir": "ckpts/emotion",
        "train_dataset_split": "Development",
        "validataion_dataset_split": "Test1",
        "hidden_dim": 32, "batch_size": 4, "learning_rate": 1e-3,
        "fine_tuning_lr": 1e-4, "scheduler_patience": 2,
        "weight_decay": 1e-4, "dropout_rate": 0.1,
        "classifier_epochs": 1, "fine_tuning_epochs": 1, "patience": 5,
        "unfreeze_encoder": False, "add_noise_during_training": True,
        "use_class_weights": True, "categorical_only": True,
    }
    cfg["tpu"]["compute_dtype"] = "float32"
    yaml.safe_dump(cfg, open("emotion.yaml", "w"))

    import train_emotion

    print("[3] SER training (categorical)...")
    train_emotion.main(["--config", "emotion.yaml", "--device", "cpu",
                        "--task", "categorical"])

    # 4. clean-vs-noisy robustness report
    import evaluate_emotion

    print("[4] robustness evaluation...")
    evaluate_emotion.main(["--config", "emotion.yaml",
                           "--checkpoint", "ckpts/emotion/best_classifier_model",
                           "--device", "cpu"])
    print("\nQuickstart complete; artifacts in", workdir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nrse_quickstart")
