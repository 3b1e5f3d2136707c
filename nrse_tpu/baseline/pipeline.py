"""Composed baseline SER pipeline: WavLM → ASP pooling → EmotionRegression.

This is the model the challenge scripts assemble from three torch modules
(``ssl_model``/``pool_model``/``ser_model``,
``baseline/eval_cat_ser_weighted_with_list.py:153-206``), expressed as one
Flax module so the whole inference path is a single jitted program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from nrse_tpu.baseline.net import EmotionRegression
from nrse_tpu.models.emotion import AttentiveStatisticsPooling
from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


class BaselineSER(nn.Module):
    """ssl → pool → ser, with parameter subtrees named like the baseline's
    three torch modules (``ssl``/``pool``/``ser``) for checkpoint clarity."""

    encoder_config: WavLMConfig
    head_dim: int = 1024
    num_classes: int = 8
    head_layers: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, input_values, attention_mask=None,
                 deterministic: bool = True):
        seq, _ = WavLMModel(self.encoder_config, name="ssl")(
            input_values, attention_mask, deterministic
        )
        pooled = AttentiveStatisticsPooling(
            self.encoder_config.hidden_size, name="pool"
        )(seq, attention_mask)
        logits = EmotionRegression(
            hidden_dim=self.head_dim, num_layers=self.head_layers,
            output_dim=self.num_classes, dropout=self.dropout, name="ser",
        )(pooled, deterministic)
        return logits


def make_baseline_forward(model: BaselineSER):
    """Jitted (params, waveforms [B,T], mask [B,T]) → logits [B,K]."""

    def forward(params, input_values, attention_mask):
        return model.apply({"params": params}, input_values, attention_mask,
                           deterministic=True)

    return jax.jit(forward)


def bucket_length(n: int, bucket_s: float = 5.0, sample_rate: int = 16000,
                  max_s: float = 30.0) -> int:
    """Pad a length to the next bucket so variable-length inference reuses
    a handful of compiled shapes instead of one per file (XLA static
    shapes; the torch reference runs one file at a time at native length)."""
    bucket = int(bucket_s * sample_rate)
    cap = int(max_s * sample_rate)
    n = min(n, cap)
    return min(((n + bucket - 1) // bucket) * bucket, cap)
