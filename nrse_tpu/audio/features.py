"""Waveform feature normalisation (HF feature-extractor equivalent).

The reference feeds waveforms through
``AutoFeatureExtractor.from_pretrained("microsoft/wavlm-large")``
(``train_byol.py:134``), which for WavLM is a Wav2Vec2-style extractor doing
per-utterance zero-mean/unit-variance normalisation (``do_normalize=True``,
variance epsilon 1e-7) and producing an attention mask from true lengths.

This module is the jit-able JAX equivalent; there is no torch/HF dependency
on the hot path.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def zero_mean_unit_var(x, mask=None, eps: float = 1e-7):
    """Per-utterance z-normalisation over the last axis.

    With ``mask`` (1 = valid), statistics are computed over valid samples
    only and padding stays exactly zero — matching HF's masked normalisation.
    """
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if mask is None:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + eps)
    mask = jnp.asarray(mask, dtype=x.dtype)
    count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(x * mask, axis=-1, keepdims=True) / count
    var = jnp.sum(((x - mean) * mask) ** 2, axis=-1, keepdims=True) / count
    return (x - mean) / jnp.sqrt(var + eps) * mask


class FeatureExtractor:
    """Minimal API-compatible stand-in for the HF WavLM feature extractor.

    ``__call__`` accepts a 1-D waveform (or [B, T] batch) and returns a dict
    with ``input_values`` (z-normalised float32) and ``attention_mask``.
    Runs in numpy on the host; the batched on-device path should use
    ``zero_mean_unit_var`` directly inside the jitted preprocessing graph.
    """

    def __init__(self, sampling_rate: int = 16000, do_normalize: bool = True,
                 return_attention_mask: bool = True):
        self.sampling_rate = sampling_rate
        self.do_normalize = do_normalize
        self.return_attention_mask = return_attention_mask

    @classmethod
    def from_pretrained(cls, model_name: str) -> "FeatureExtractor":
        # All WavLM checkpoints use 16 kHz and (for large) z-normalisation.
        return cls(sampling_rate=16000, do_normalize=True)

    def __call__(self, raw_speech, sampling_rate: Optional[int] = None,
                 return_tensors: Optional[str] = None) -> Dict[str, np.ndarray]:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"expected {self.sampling_rate} Hz input, got {sampling_rate}"
            )
        x = np.asarray(raw_speech, dtype=np.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        if self.do_normalize:
            mean = x.mean(axis=-1, keepdims=True)
            var = x.var(axis=-1, keepdims=True)
            x = (x - mean) / np.sqrt(var + 1e-7)
        out = {"input_values": x}
        if self.return_attention_mask:
            out["attention_mask"] = np.ones_like(x, dtype=np.int32)
        return _DictWithAttrs(out)


class _DictWithAttrs(dict):
    """dict that also exposes keys as attributes (HF BatchFeature parity)."""

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(item) from e
