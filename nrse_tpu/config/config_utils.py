"""YAML config loading with CLI overrides.

API parity with the reference config system (``config/config_utils.py:6,21,39``
in the upstream repo): ``load_config`` reads a YAML file into a nested dict,
``parse_args`` exposes the same fixed CLI override surface
(``--config/--device/--batch_size/--epochs/--lr/--task``), and ``get_config``
combines them.  The YAML schema (including the upstream misspelling
``validataion_dataset_split``, ``default_wavlm-large_byol.yaml:45``) is
accepted verbatim so the reference's six presets work unchanged.

TPU-native differences:
  * ``device`` defaults to the best available JAX backend instead of
    ``cuda``/``cpu``; the value is a JAX platform name (``tpu``/``cpu``).
  * a light ``validate_config`` pass fills defaults and normalises known
    key variants so downstream code never needs ``dict.get`` chains.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional

import yaml

_PRESET_DIR = os.path.join(os.path.dirname(__file__), "presets")


def preset_path(name: str) -> str:
    """Resolve a preset name (e.g. ``dev_wavlm-large_byol``) to its YAML path."""
    if not name.endswith(".yaml"):
        name = name + ".yaml"
    return os.path.join(_PRESET_DIR, name)


def load_config(config_path: str) -> Dict[str, Any]:
    """Load configuration from a YAML file (reference ``config_utils.py:6``)."""
    if not os.path.exists(config_path):
        candidate = preset_path(os.path.basename(config_path))
        if os.path.exists(candidate):
            config_path = candidate
    with open(config_path, "r") as f:
        config = yaml.safe_load(f)
    return config


def parse_args(argv=None) -> argparse.Namespace:
    """Parse command line arguments (reference ``config_utils.py:21``)."""
    parser = argparse.ArgumentParser(
        description="nrse_tpu: TPU-native noise-robust speech embeddings"
    )
    parser.add_argument("--config", type=str, default="nrse_tpu/config/presets/default_wavlm-large_byol.yaml",
                        help="Path to configuration file (or a preset name)")
    parser.add_argument("--device", type=str, default=None,
                        help="JAX platform to use (tpu or cpu)")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="Batch size for training")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Number of training epochs")
    parser.add_argument("--lr", type=float, default=None,
                        help="Learning rate")
    parser.add_argument("--task", type=str, default="both",
                        choices=["categorical", "dimensional", "both"],
                        help="Which emotion recognition task to train")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest checkpoint in "
                             "checkpoint_dir (rebuild addition; the "
                             "reference has no resume path)")
    return parser.parse_args(argv)


def default_device() -> str:
    """Best available JAX platform name — WITHOUT initializing the backend
    when the platform is pinned by environment/config.

    ``jax.default_backend()`` initializes the runtime; in multi-host mode
    that must not happen before ``jax.distributed.initialize`` (called
    from the train entry AFTER config loading), so prefer the declared
    platform list and only fall back to real backend detection when
    nothing is pinned (single-host case, where early init is harmless).
    """
    import os

    try:
        import jax

        plats = os.environ.get("JAX_PLATFORMS") or \
            (jax.config.jax_platforms or "")
        first = plats.split(",")[0].strip().lower()
        if first in ("cpu", "gpu", "cuda", "rocm", "tpu"):
            return {"cuda": "gpu", "rocm": "gpu"}.get(first, first)
        if first in ("axon", "libtpu", "tpu_driver"):
            # KNOWN TPU tunnel/plugin names only — an arbitrary plugin
            # (e.g. METAL) must not be misreported as TPU and trip
            # TPU-only config branches
            return "tpu"
        if first:
            return first  # unknown pinned plugin: report it verbatim
        return jax.default_backend()
    except Exception:  # pragma: no cover - jax should always import
        return "cpu"


def validate_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Fill defaults and normalise the reference YAML surface in place.

    Accepts both the upstream misspelled ``validataion_dataset_split`` and the
    corrected ``validation_dataset_split`` spelling, preferring whichever is
    present (reference ``emotion_dataset.py:287`` reads the misspelled key).
    """
    config.setdefault("model", {})
    config["model"].setdefault("name", "microsoft/wavlm-large")
    config["model"].setdefault("projection_dim", 1024)
    config["model"].setdefault("prediction_dim", 2048)
    config["model"].setdefault("ema_decay", 0.997)

    config.setdefault("training", {})
    tr = config["training"]
    tr.setdefault("batch_size", 36)
    tr.setdefault("num_workers", 8)
    tr.setdefault("num_epochs", 100)
    tr.setdefault("learning_rate", 1.0e-5)
    tr.setdefault("weight_decay", 1.0e-5)
    tr.setdefault("seed", 42)
    tr.setdefault("checkpoint_dir", "checkpoints/byol/default")
    tr.setdefault("log_dir", "outputs/byol/default")
    tr.setdefault("early_stopping_metric", "val_loss")
    tr.setdefault("early_stopping_patience", 5)
    tr.setdefault("early_stopping_min_delta", 0.0)

    config.setdefault("data", {})
    d = config["data"]
    d.setdefault("sample_rate", 16000)
    d.setdefault("max_audio_length", 5.0)
    d.setdefault("snr_range", [0, 5, 10, 15, 20])
    d.setdefault("validation_ratio", 0.15)

    config.setdefault("logging", {})
    lg = config["logging"]
    lg.setdefault("wandb_mode", "disabled")
    lg.setdefault("level", "INFO")
    lg.setdefault("console_level", "ERROR")
    lg.setdefault("metric_logging_interval", 4)
    lg.setdefault("visualization_interval", 2)

    if "emotion" in config:
        em = config["emotion"]
        if "validation_dataset_split" in em and "validataion_dataset_split" not in em:
            em["validataion_dataset_split"] = em["validation_dataset_split"]
        if "validataion_dataset_split" in em:
            em.setdefault("validation_dataset_split", em["validataion_dataset_split"])
        em.setdefault("hidden_dim", 1024)
        em.setdefault("batch_size", tr["batch_size"])
        em.setdefault("dropout_rate", 0.3)
        em.setdefault("categorical_only", True)
        em.setdefault("use_class_weights", True)
        em.setdefault("add_noise_during_training", False)
        em.setdefault("unfreeze_encoder", False)

    if "device" not in config:
        # lazy: default_device() initializes the JAX backend, which must not
        # happen before jax.distributed.initialize in multi-host mode
        config["device"] = default_device()
    return config


def get_config(argv=None) -> Dict[str, Any]:
    """YAML config + CLI overrides (reference ``config_utils.py:39``).

    Command line arguments override YAML configuration.
    """
    args = parse_args(argv)
    config = load_config(args.config)

    if args.device is not None:
        config["device"] = args.device
    # else: validate_config fills it via default_device() (which must not
    # initialize the backend when a platform is pinned — multi-host trap)

    config.setdefault("training", {})
    if args.batch_size is not None:
        config["training"]["batch_size"] = args.batch_size
    if args.epochs is not None:
        config["training"]["num_epochs"] = args.epochs
    if args.lr is not None:
        config["training"]["learning_rate"] = args.lr
    config["task"] = args.task
    config["resume"] = bool(getattr(args, "resume", False))

    return validate_config(config)
