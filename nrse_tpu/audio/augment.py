"""SNR-controlled noise mixing and waveform normalisation.

Parity with reference ``src/data/augment.py:4-66`` (``add_noise_to_speech``:
tile/truncate noise to the speech length, scale by
``sqrt(Ps / (Pn * 10^(snr/10)))``, guard degenerate inputs) and the peak
normalisation in ``src/data/noisy_speech_dataset.py:89-103``.

TPU-native design: the mixing math is pure, batched ``jnp`` so it jits into
the preprocessing graph and runs on-device.  Degenerate inputs can't return
``None`` inside XLA, so the batched kernels return a per-item validity flag
instead; ``add_noise_to_speech`` is the host-facing wrapper that preserves
the reference's ``None``-on-failure contract.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from nrse_tpu.utils.logging_utils import logger


def fit_noise_to_length(noise: np.ndarray, length: int) -> np.ndarray:
    """Tile or truncate noise [..., T] to exactly ``length`` samples.

    Host-side (variable shapes); parity with ``augment.py:16-22``.
    """
    n = noise.shape[-1]
    if n >= length:
        return noise[..., :length]
    reps = length // n + 1
    return np.tile(noise, reps)[..., :length]


def mix_at_snr(speech, noise, snr_db, eps_power: float = 1e-10):
    """Batched, jit-able SNR mixing.

    Args:
      speech: [B, T] (or [T]) clean waveforms.
      noise:  same shape, already length-matched.
      snr_db: scalar or [B] target SNR in dB.

    Returns:
      (noisy, valid): mixed waveforms and a boolean per-item validity flag
      (False where speech/noise power is degenerate or the scaling explodes,
      mirroring the reference's None-returns at ``augment.py:30-51``).
    """
    import jax.numpy as jnp

    speech = jnp.asarray(speech)
    noise = jnp.asarray(noise)
    batched = speech.ndim == 2
    axes = -1

    speech_power = jnp.mean(speech**2, axis=axes)
    noise_power = jnp.mean(noise**2, axis=axes)
    snr_linear = 10.0 ** (jnp.asarray(snr_db, dtype=speech.dtype) / 10.0)
    scaling = jnp.sqrt(speech_power / (noise_power * snr_linear + eps_power))

    valid = (
        (speech_power >= 1e-10)
        & (noise_power >= 1e-10)
        & jnp.isfinite(scaling)
        & (scaling <= 1e6)
    )
    scaling = jnp.where(valid, scaling, 0.0)
    if batched:
        scaling = scaling[:, None]
    noisy = speech + noise * scaling
    return noisy, valid


def add_noise_to_speech(speech, noise, snr_db) -> Optional[np.ndarray]:
    """Host-facing wrapper with the reference's None-on-failure contract.

    Accepts [1, T] arrays like the reference (``augment.py:4``); tiles or
    truncates noise, mixes at ``snr_db``, returns None when the inputs are
    degenerate (NaN, near-silent, exploding scale).
    """
    speech = np.asarray(speech, dtype=np.float32)
    noise = np.asarray(noise, dtype=np.float32)
    if np.isnan(speech).any():
        logger.warning("Original speech contains NaN values!")
        return None
    if np.isnan(noise).any():
        logger.warning("Original noise contains NaN values!")
        return None
    noise = fit_noise_to_length(noise, speech.shape[-1])

    speech_power = float(np.mean(speech**2))
    noise_power = float(np.mean(noise**2))
    if speech_power < 1e-10:
        logger.warning(f"Speech power too small: {speech_power}")
        return None
    if noise_power < 1e-10:
        logger.warning(f"Noise power too small: {noise_power}")
        return None
    snr_linear = 10.0 ** (float(snr_db) / 10.0)
    scaling = float(np.sqrt(speech_power / (noise_power * snr_linear)))
    if not np.isfinite(scaling):
        logger.warning(f"Invalid noise scaling: {scaling}")
        return None
    if scaling > 1e6:
        logger.warning(f"Extremely large noise scaling: {scaling}")
        return None
    noisy = speech + noise * scaling
    if np.isnan(noisy).any():
        logger.warning("Resulting noisy speech contains NaN values!")
        return None
    return noisy


def peak_normalize(x, eps: float = 1e-8):
    """x / (max |x| + eps) along the last axis (``noisy_speech_dataset.py:100``)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return x / (peak + eps)


def crop_or_pad(x: np.ndarray, max_samples: int, start: int = 0) -> np.ndarray:
    """Host-side crop (from ``start``) or zero-pad to ``max_samples``."""
    n = x.shape[-1]
    if n > max_samples:
        return x[..., start : start + max_samples]
    if n < max_samples:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, max_samples - n)]
        return np.pad(x, pad)
    return x


def make_byol_views(clean, noise, snr_db):
    """Fused jit-able graph producing the BYOL clean/noisy training views.

    clean, noise: [B, T]; snr_db: [B].  Performs SNR mixing, peak
    normalisation of both views (``noisy_speech_dataset.py:89-103``), then
    per-utterance zero-mean/unit-variance feature normalisation (the HF
    feature-extractor equivalent).  Returns (clean_views, noisy_views, valid).
    """
    from nrse_tpu.audio.features import zero_mean_unit_var

    noisy, valid = mix_at_snr(clean, noise, snr_db)
    clean_n = peak_normalize(clean)
    noisy_n = peak_normalize(noisy)
    return zero_mean_unit_var(clean_n), zero_mean_unit_var(noisy_n), valid
