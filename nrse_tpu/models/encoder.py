"""Reference-API-compatible encoder wrapper.

The reference exposes ``WavLMEncoder(model_name)`` with an ``output_dim``
attribute and a forward that accepts ``[B, T]`` or ``[B, 1, T]`` waveforms
(optionally an attention mask) and returns the last hidden state
(``src/models/encoder.py:5-32``).  This module provides that exact surface
over the functional Flax model, for users migrating call sites verbatim;
new code should use ``nrse_tpu.models.wavlm.WavLMModel`` directly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


class WavLMEncoder:
    """Stateful convenience wrapper: holds params, jits the forward."""

    def __init__(self, model_name: str = "microsoft/wavlm-large",
                 params: Optional[Any] = None, seed: int = 0,
                 config: Optional[WavLMConfig] = None,
                 sample_seconds: float = 1.0):
        self.config = config or WavLMConfig.from_model_name(model_name)
        self.model = WavLMModel(self.config)
        self.output_dim = self.config.hidden_size
        if params is None:
            sample = jnp.zeros((1, int(16000 * sample_seconds)))
            params = self.model.init(
                {"params": jax.random.PRNGKey(seed)}, sample
            )
        self.variables = params if "params" in params else {"params": params}
        self._fwd = jax.jit(
            lambda v, x, m: self.model.apply(v, x, m, True)
        )

    @classmethod
    def from_hf_checkpoint(cls, model_name_or_path: str,
                           config: Optional[WavLMConfig] = None
                           ) -> "WavLMEncoder":
        """Build from an HF torch checkpoint via the converter."""
        from nrse_tpu.models.convert import load_hf_wavlm

        cfg = config or WavLMConfig.from_model_name(model_name_or_path)
        params = load_hf_wavlm(model_name_or_path, cfg)
        return cls(model_name_or_path, params=params, config=cfg)

    def __call__(self, input_values, attention_mask=None):
        """[B, T] or [B, 1, T] waveforms → last hidden state [B, T', C].

        Unlike the reference (which accepts but ignores the mask in the
        BYOL path, ``encoder.py:23-25``), the mask is honoured when given.
        """
        x = jnp.asarray(input_values)
        seq, _ = self._fwd(self.variables, x,
                           None if attention_mask is None
                           else jnp.asarray(attention_mask))
        return seq

    def encode_pooled(self, input_values, attention_mask=None):
        """Masked mean-pooled utterance embeddings [B, C]."""
        x = jnp.asarray(input_values)
        _, pooled = self._fwd(self.variables, x,
                              None if attention_mask is None
                              else jnp.asarray(attention_mask))
        return pooled
