"""Odyssey-2024 MSP-Podcast challenge pipeline equivalents.

The reference's ``baseline/`` scripts depend on an *external* fork
(MSP-Podcast_Challenge) imported via ``sys.path.append`` for its ``net`` and
``utils`` modules (``train_ft_cat_ser_weighted_checkpoint.py:28-31``).  This
package provides self-contained TPU-native equivalents:

  * ``net``     — EmotionRegression head + ASP pooling wrapper.
  * ``wavset``  — corpus z-normalisation stats (train_norm_stat) + LogManager.
  * ``train_ft_cat_ser`` — frozen/e2e fine-tune with gradient accumulation.
  * ``eval_cat_ser``     — list-based timed inference → inference_results.csv.
"""

from nrse_tpu.baseline.net import EmotionRegression
from nrse_tpu.baseline.wavset import WavNormStats, LogManager

__all__ = ["EmotionRegression", "WavNormStats", "LogManager"]
