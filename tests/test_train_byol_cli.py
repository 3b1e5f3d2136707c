"""End-to-end CLI test: train_byol on a mock corpus (BASELINE.json config 1)."""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def byol_cfg(tmp_path_factory):
    from nrse_tpu.data.mock import create_mock_corpus

    root = tmp_path_factory.mktemp("byol_e2e")
    clean, noise = create_mock_corpus(str(root / "corpus"), n_clean=12,
                                      n_noise=4, max_seconds=1.5)
    cfg = {
        "model": {"name": "wavlm-tiny", "projection_dim": 32,
                  "prediction_dim": 64, "ema_decay": 0.99},
        "training": {"batch_size": 8, "num_workers": 2, "num_epochs": 1,
                     "learning_rate": 1e-3, "weight_decay": 1e-5,
                     "checkpoint_dir": str(root / "ckpts"),
                     "log_dir": str(root / "logs"), "seed": 42,
                     "early_stopping_metric": "val_loss",
                     "early_stopping_patience": 5,
                     "early_stopping_min_delta": 0.0},
        "data": {"clean_data_path": clean, "noise_data_path": noise,
                 "sample_rate": 16000, "max_audio_length": 1.0,
                 "snr_range": [0, 5, 10], "validation_ratio": 0.34},
        "logging": {"wandb_mode": "disabled", "level": "ERROR",
                    "console_level": "ERROR", "visualization_interval": 100},
        "tpu": {"mesh": {"data": -1, "model": 1}, "prefetch_depth": 0},
    }
    path = root / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path), cfg


def test_train_byol_cli_end_to_end(byol_cfg):
    import train_byol

    path, cfg = byol_cfg
    train_byol.main(["--config", path, "--device", "cpu"])
    ck = cfg["training"]["checkpoint_dir"]
    for name in ("best_val_loss", "best_val_similarity", "last_model"):
        assert os.path.isdir(os.path.join(ck, name)), name


def test_train_byol_cli_resume(byol_cfg):
    import train_byol

    path, cfg = byol_cfg
    train_byol.main(["--config", path, "--device", "cpu", "--resume",
                     "--epochs", "2"])
    import json

    meta = json.load(open(os.path.join(
        cfg["training"]["checkpoint_dir"], "last_model", "meta.json")))
    assert meta["epoch"] == 1  # continued into epoch index 1
    assert "best" in meta  # best-so-far metrics persisted


def test_main_does_not_leak_mesh_registry(byol_cfg):
    """Round-3 regression: ``train_byol.main`` registered the process-global
    Pallas mesh and never cleared it, so any later flash-attention call in
    the same process inherited a stale ``data=8`` mesh and died on batch
    divisibility (10/239 stock-suite failures).  ``main`` is now scoped
    via ``flash_tp_mesh_scope``; this pins it: run the trainer, then make
    a bare flash call with a batch that does NOT divide 8."""
    import jax.numpy as jnp

    import train_byol
    from nrse_tpu.ops.flash_attention import flash_gated_attention
    from nrse_tpu.parallel.mesh import get_flash_tp_mesh

    path, _ = byol_cfg
    train_byol.main(["--config", path, "--device", "cpu"])
    assert get_flash_tp_mesh() is None, (
        "train_byol.main leaked the global flash/TP mesh registry"
    )
    # batch=3 is indivisible by the 8-wide virtual mesh main used — this
    # call only works if the registry was actually cleared
    b, h, t, d = 3, 4, 16, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    gate = jnp.ones((b, h, t), jnp.float32)
    bias = jnp.zeros((h, 2 * t), jnp.float32)
    out = flash_gated_attention(q, q, q, gate, bias)
    assert out.shape == q.shape


def test_batch_size_mesh_validation(byol_cfg, tmp_path):
    import train_byol

    path, cfg = byol_cfg
    bad = dict(cfg)
    bad["training"] = dict(cfg["training"], batch_size=3)
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(bad))
    with pytest.raises(ValueError, match="divisible by the mesh"):
        train_byol.main(["--config", str(p), "--device", "cpu"])
