"""Emotion training dispatcher (CLI parity with reference
``train_emotion.py:6-34``): runs the categorical and/or dimensional SER
trainers per ``--task``.

Usage:
    python train_emotion.py --config <yaml> --task categorical
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    from nrse_tpu.config import get_config

    config = get_config(argv)

    import jax

    if config.get("device") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    task = config.get("task", "both")
    results = {}
    if task in ("categorical", "both"):
        from nrse_tpu.train.categorical_emotions import train_categorical_emotions

        print("Training categorical emotion recognition model...")
        results["categorical"] = train_categorical_emotions(config)
    if task in ("dimensional", "both"):
        from nrse_tpu.train.dimentional_emotions import train_dimensional_emotions

        print("Training dimensional emotion recognition model...")
        results["dimensional"] = train_dimensional_emotions(config)
    print("Emotion training complete:", results)
    return results


if __name__ == "__main__":
    main()
