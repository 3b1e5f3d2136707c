"""Baseline model heads (external ``net`` module equivalents).

The challenge pipeline composes: frozen/fine-tuned WavLM → pooling →
``EmotionRegression(feat_dim*2, head_dim, 1, 8, dropout=0.5)``
(reference usage ``baseline/eval_cat_ser_weighted_with_list.py:166-186``).
``EmotionRegression`` here is a functionally equivalent MLP classifier head
(num_layers × [Dense→LayerNorm→ReLU→Dropout] → Dense(out)); the pooling is
our vectorised masked ASP.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from nrse_tpu.models.emotion import AttentiveStatisticsPooling  # re-export

__all__ = ["EmotionRegression", "AttentiveStatisticsPooling"]


class EmotionRegression(nn.Module):
    """MLP emotion head: input_dim → hidden (×num_layers) → output_dim."""

    hidden_dim: int = 1024
    num_layers: int = 1
    output_dim: int = 8
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x.astype(jnp.float32)
        for i in range(self.num_layers):
            h = nn.Dense(self.hidden_dim, name=f"fc_{i}")(h)
            h = nn.LayerNorm(name=f"norm_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="out")(h)
