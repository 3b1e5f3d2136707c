"""Regression tests for the rebuilt ``evaluate_emotion.py``.

The reference's ``evaluate_emotion.py`` is BROKEN upstream (wrong
``get_config`` signature, ctor mismatch, phantom dataset key —
``/root/reference/evaluate_emotion.py:28,47-53`` / SURVEY.md §2 #24); this
locks the rebuilt working capability: a clean-vs-noisy robustness report
over a trained EmotionClassifier checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def eval_config(mock_msp_dir, tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("eval_emo")
    return {
        "model": {"name": "wavlm-tiny", "projection_dim": 32,
                  "prediction_dim": 64, "ema_decay": 0.99},
        "training": {"batch_size": 4, "num_workers": 2, "seed": 0,
                     "log_dir": str(ckpt / "logs")},
        "data": {
            "noise_data_path": str(mock_msp_dir / "noise"),
            "sample_rate": 16000, "max_audio_length": 1.0,
            "snr_range": [5, 10], "validation_ratio": 0.2,
        },
        "logging": {"wandb_mode": "disabled", "level": "ERROR",
                    "console_level": "ERROR"},
        "emotion": {
            "labels_file": str(mock_msp_dir / "labels_consensus.csv"),
            "audio_dir": str(mock_msp_dir / "Audios"),
            "encoder_checkpoint": None,
            "checkpoint_dir": str(ckpt / "cat"),
            "train_dataset_split": "Development",
            "validataion_dataset_split": "Test1",
            "hidden_dim": 32, "batch_size": 4, "learning_rate": 1e-3,
            "dropout_rate": 0.1, "categorical_only": True,
            "add_noise_during_training": False,
        },
        "tpu": {"compute_dtype": "float32", "flash_attention": False},
    }


@pytest.fixture(scope="module")
def saved_checkpoint(eval_config, tmp_path_factory):
    """An untrained-but-valid EmotionClassifier checkpoint on disk."""
    from nrse_tpu.models.emotion import EmotionClassifier
    from nrse_tpu.train.categorical_emotions import _encoder_config_from
    from nrse_tpu.train.checkpoint import save_checkpoint
    from nrse_tpu.train.emotion_trainer import create_emotion_state
    from nrse_tpu.train.schedules import make_emotion_optimizer

    em = eval_config["emotion"]
    model = EmotionClassifier(
        _encoder_config_from(eval_config), hidden_dim=em["hidden_dim"],
        dropout=em["dropout_rate"], num_emotions=8,
    )
    bs = em["batch_size"]
    t = int(eval_config["data"]["max_audio_length"]
            * eval_config["data"]["sample_rate"])
    state = create_emotion_state(
        model, jax.random.PRNGKey(0),
        {"input_values": jnp.zeros((bs, t)),
         "attention_mask": jnp.ones((bs, t))},
        make_emotion_optimizer(1e-4),
    )
    d = tmp_path_factory.mktemp("eval_ckpt")
    save_checkpoint(str(d), "best_classifier_model", state,
                    {"epoch": 1, "val_f1": 0.5})
    return str(d / "best_classifier_model")


def test_evaluate_emotion_report_fields(eval_config, saved_checkpoint):
    import evaluate_emotion

    report = evaluate_emotion.evaluate(
        eval_config, saved_checkpoint, task="categorical"
    )
    assert set(report) == {"clean", "noisy"}
    for cond in ("clean", "noisy"):
        assert 0.0 <= report[cond]["accuracy"] <= 1.0
        assert 0.0 <= report[cond]["macro_f1"] <= 1.0
    # the noisy pass genuinely augments: its inputs differ, so (untrained
    # random classifier on different inputs) metrics need not agree — but
    # both must be computed over the same VALID label set (finite)
    assert np.isfinite(list(report["clean"].values())).all()
    assert np.isfinite(list(report["noisy"].values())).all()


def test_evaluate_emotion_dimensional(eval_config, saved_checkpoint):
    import evaluate_emotion

    report = evaluate_emotion.evaluate(
        eval_config, saved_checkpoint, task="dimensional"
    )
    for cond in ("clean", "noisy"):
        assert {"ccc_arousal", "ccc_valence", "ccc_dominance"} <= \
            set(report[cond])
        for v in report[cond].values():
            assert -1.0 <= v <= 1.0


def test_evaluate_emotion_cli(eval_config, saved_checkpoint, tmp_path):
    """The CLI surface (--config/--checkpoint/--task) drives the same
    report — the reference's intended but broken entry point."""
    import yaml

    import evaluate_emotion

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(eval_config))
    report = evaluate_emotion.main([
        "--config", str(cfg_path), "--checkpoint", saved_checkpoint,
        "--task", "categorical", "--device", "cpu",
    ])
    assert "clean" in report and "accuracy" in report["clean"]
