"""Masked attentive statistics pooling (vectorised).

Capability parity with reference ``src/models/pool.py:24-58``
(``AttentiveStatisticsPooling``: tanh(Linear)·w attention over the valid
frames of each utterance, output = concat(μ, σ) of the attention-weighted
statistics) and ``compute_length_from_mask`` (``pool.py:11-19``: frame count
from the waveform mask at a 20 ms frame shift).

TPU-native design: the reference iterates per sample in Python, slicing each
sequence to its true length — a dynamic-shape, scalar-loop pattern XLA can't
tile.  Here the same math is one batched masked-softmax: padding frames get
-inf logits, so the softmax weights are exactly zero there and μ/σ match the
loop version bit-for-bit (up to summation order) while running as fused
batched matmuls on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def frame_lengths_from_mask(mask, sample_rate: int = 16000,
                            frame_shift_s: float = 0.02):
    """Waveform mask ``[B, T_wav]`` → per-utterance frame counts ``[B]``.

    Reference formula (``pool.py:16-18``): ``(wav_len - 1) // 320 + 1`` at
    16 kHz / 20 ms.
    """
    wav_lens = jnp.sum(mask, axis=1)
    hop = int(sample_rate * frame_shift_s)
    return (wav_lens - 1) // hop + 1


def frame_mask_from_wav_mask(mask, num_frames: int, sample_rate: int = 16000,
                             frame_shift_s: float = 0.02):
    """Waveform mask ``[B, T_wav]`` → boolean frame mask ``[B, num_frames]``."""
    feat_lens = frame_lengths_from_mask(mask, sample_rate, frame_shift_s)
    idx = jnp.arange(num_frames)[None, :]
    return idx < feat_lens[:, None]


def attentive_stats_pool(x, frame_mask, w_attn, b_attn, v_attn,
                         var_floor: float = 1e-5):
    """Batched masked attentive statistics pooling.

    Args:
      x: ``[B, T, D]`` frame features.
      frame_mask: ``[B, T]`` boolean (True = valid frame).
      w_attn, b_attn: the tanh projection ``D -> D`` (reference
        ``sap_linear``).
      v_attn: ``[D, 1]`` attention vector (reference ``attention``).
      var_floor: variance clamp (reference ``pool.py:55``).

    Returns:
      ``[B, 2*D]`` = concat(μ, σ).
    """
    h = jnp.tanh(jnp.einsum("btd,de->bte", x, w_attn) + b_attn)
    logits = jnp.einsum("btd,dk->btk", h, v_attn)[..., 0]  # [B, T]
    logits = jnp.where(frame_mask, logits, NEG_INF)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(x.dtype)
    w = w[..., None]
    mu = jnp.sum(x * w, axis=1)
    var = jnp.sum((x**2) * w, axis=1) - mu**2
    sigma = jnp.sqrt(jnp.clip(var, min=var_floor))
    return jnp.concatenate([mu, sigma], axis=1)
