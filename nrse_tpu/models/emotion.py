"""Emotion classifier (categorical SER + dimensional A/V/D regression).

Capability parity with reference ``src/models/emotion.py:8-133``
(``EmotionClassifier``: encoder → attentive-statistics pooling (2×dim) →
shared FC+LayerNorm+ReLU+Dropout → categorical branch (FC + out to
``num_emotions``) and dimensional branch (FC + out to 3);
``task ∈ {categorical, dimensional, both}``; freeze / gradual-unfreeze
helpers) and ``src/models/pool.py:24-58`` (ASP).

TPU-native design:
  * ASP pooling is the vectorised masked kernel in
    ``nrse_tpu/ops/asp_pooling.py`` — no per-sample Python loop.
  * Freezing is an *optimizer* concern in JAX: ``trainable_mask`` builds a
    boolean pytree for ``optax.masked`` / zeroed gradients instead of
    mutating ``requires_grad``.  Gradual unfreezing of the top-k transformer
    layers works on the scanned (stacked ``[L, ...]``) encoder parameters by
    multiplying their gradient with a per-layer 0/1 vector —
    ``layer_gradient_scale``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from nrse_tpu.ops.asp_pooling import attentive_stats_pool, frame_mask_from_wav_mask
from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


class AttentiveStatisticsPooling(nn.Module):
    """ASP layer: parameters per reference ``pool.py:30-35`` (tanh linear +
    attention vector, N(0,1) init), math via the batched masked op."""

    input_size: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, wav_mask=None):
        w = self.param(
            "sap_linear_kernel",
            nn.initializers.lecun_normal(),
            (self.input_size, self.input_size), self.param_dtype,
        )
        b = self.param(
            "sap_linear_bias", nn.initializers.zeros,
            (self.input_size,), self.param_dtype,
        )
        v = self.param(
            "attention", nn.initializers.normal(stddev=1.0),
            (self.input_size, 1), self.param_dtype,
        )
        t = x.shape[1]
        if wav_mask is None:
            frame_mask = jnp.ones((x.shape[0], t), dtype=bool)
        elif wav_mask.shape[1] == t:
            frame_mask = wav_mask.astype(bool)
        else:
            frame_mask = frame_mask_from_wav_mask(wav_mask, t)
        return attentive_stats_pool(
            x, frame_mask, w.astype(x.dtype), b.astype(x.dtype),
            v.astype(x.dtype),
        )


class EmotionClassifier(nn.Module):
    """Encoder + ASP + shared trunk + two task branches."""

    encoder_config: WavLMConfig
    hidden_dim: int = 1024
    dropout: float = 0.5
    num_emotions: int = 8

    @nn.compact
    def __call__(self, input_values, attention_mask=None, task: str = "both",
                 deterministic: bool = True):
        cfg = self.encoder_config
        seq, _ = WavLMModel(cfg, name="encoder")(
            input_values, attention_mask, deterministic
        )
        features = AttentiveStatisticsPooling(
            cfg.hidden_size, name="pooling"
        )(seq, attention_mask)
        features = features.astype(jnp.float32)

        def trunk(name):
            def f(x):
                h = nn.Dense(self.hidden_dim, name=f"{name}_dense")(x)
                h = nn.LayerNorm(name=f"{name}_norm")(h)
                h = nn.relu(h)
                return nn.Dropout(self.dropout)(h, deterministic=deterministic)
            return f

        shared = trunk("shared")(features)

        categorical_logits = None
        dimensional_values = None
        if task in ("categorical", "both"):
            h = trunk("categorical")(shared)
            categorical_logits = nn.Dense(
                self.num_emotions, name="categorical_out"
            )(h)
        if task in ("dimensional", "both"):
            h = trunk("dimensional")(shared)
            dimensional_values = nn.Dense(3, name="dimensional_out")(h)
        return categorical_logits, dimensional_values


# ---------------------------------------------------------------------------
# Freeze / unfreeze as optimizer masks (reference emotion.py:104-129)
# ---------------------------------------------------------------------------

def trainable_mask(params: Dict[str, Any], train_encoder: bool) -> Dict[str, Any]:
    """Boolean pytree: heads always trainable; encoder per ``train_encoder``
    (reference ``freeze_encoder``/``unfreeze_encoder``)."""
    def mark(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return train_encoder or top != "encoder"

    return jax.tree_util.tree_map_with_path(mark, params)


def layer_gradient_scale(num_layers: int, unfrozen: Sequence[int]):
    """0/1 vector ``[L]`` for scaling stacked per-layer encoder gradients —
    the JAX equivalent of unfreezing ``layer.{i}`` parameter groups
    (reference ``unfreeze_encoder_gradually``, ``emotion.py:114-129``)."""
    scale = jnp.zeros((num_layers,), jnp.float32)
    if len(unfrozen):
        scale = scale.at[jnp.asarray(list(unfrozen), jnp.int32)].set(1.0)
    return scale


def gradually_unfrozen_layers(epoch: int, total_epochs: int,
                              total_layers: int = 24) -> list:
    """Top-down unfreeze schedule: at epoch ``e`` of ``E``, layers from
    ``total_layers·(1−(e+1)/E)`` upward are trainable (reference
    ``categorical_emotions.py:206-226``)."""
    start = int(total_layers * (1 - (epoch + 1) / total_epochs))
    return list(range(max(0, start), total_layers))


def apply_layer_unfreeze_to_grads(grads: Dict[str, Any], scale,
                                  encoder_key: str = "encoder",
                                  rest_scale=0.0) -> Dict[str, Any]:
    """Scale the stacked transformer-layer grads by the per-layer 0/1
    vector; all other encoder grads (frontend, projections, pos-conv) are
    multiplied by ``rest_scale`` — 0.0 (default) matches the reference's
    gradual-unfreeze path, which only ever re-enables ``layer.{i}``
    parameter groups (``emotion.py:114-129``); 1.0 is the baseline-e2e
    ``--freeze_ssl=False`` semantics, where EVERY ssl parameter gets an
    optimizer (``train_ft_cat_ser_weighted_checkpoint.py:209-214``).
    ``rest_scale`` may be a traced scalar so switching it never
    recompiles the train step."""
    rest_scale = jnp.asarray(rest_scale, jnp.float32)

    def mark(path, g):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if encoder_key not in keys[:2]:
            return g  # heads untouched
        if "layers" in keys:  # stacked [L, ...] scan params
            extra = (1,) * (g.ndim - 1)
            return g * scale.reshape((-1,) + extra).astype(g.dtype)
        return g * rest_scale.astype(g.dtype)

    return jax.tree_util.tree_map_with_path(mark, grads)
