import os

from nrse_tpu.config import get_config, load_config, preset_path

PRESETS = [
    "default_wavlm-large_byol",
    "default_wavlm-large_emotion_dim",
    "default_wavlm-large_emotion_dim_ft",
    "dev_wavlm-large_byol",
    "dev_wavlm-large_emotion_cat",
    "dev_wavlm-large_emotion_dim",
]


def test_presets_exist_and_load():
    for name in PRESETS:
        cfg = load_config(preset_path(name))
        assert cfg["model"]["name"] == "microsoft/wavlm-large"
        assert cfg["model"]["projection_dim"] == 1024
        assert "snr_range" in cfg["data"]
        # reference YAML surface incl. the misspelled key must be present
        assert "validataion_dataset_split" in cfg["emotion"]


def test_cli_overrides():
    cfg = get_config([
        "--config", preset_path("dev_wavlm-large_byol"),
        "--batch_size", "8", "--epochs", "3", "--lr", "0.001",
        "--device", "cpu", "--task", "categorical",
    ])
    assert cfg["training"]["batch_size"] == 8
    assert cfg["training"]["num_epochs"] == 3
    assert cfg["training"]["learning_rate"] == 0.001
    assert cfg["device"] == "cpu"
    assert cfg["task"] == "categorical"


def test_default_device_autodetect():
    cfg = get_config(["--config", preset_path("dev_wavlm-large_byol")])
    assert cfg["device"] in ("cpu", "tpu", "gpu")


def test_default_device_unknown_plugin(monkeypatch):
    """Only KNOWN TPU tunnel plugins map to 'tpu'; an arbitrary plugin name
    (e.g. METAL) must be reported verbatim, not misreported as TPU
    (ADVICE r2)."""
    from nrse_tpu.config.config_utils import default_device

    monkeypatch.setenv("JAX_PLATFORMS", "METAL")
    assert default_device() == "metal"
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert default_device() == "tpu"
    monkeypatch.setenv("JAX_PLATFORMS", "cuda")
    assert default_device() == "gpu"


def test_validate_fills_defaults():
    cfg = load_config(preset_path("dev_wavlm-large_byol"))
    del cfg["training"]["early_stopping_metric"]
    from nrse_tpu.config.config_utils import validate_config

    cfg = validate_config(cfg)
    assert cfg["training"]["early_stopping_metric"] == "val_loss"
    # misspelled key mirrored to corrected spelling and vice versa
    assert cfg["emotion"]["validation_dataset_split"] == \
        cfg["emotion"]["validataion_dataset_split"]
