"""Polyphase sample-rate conversion.

Replaces the reference's ``torchaudio.transforms.Resample``
(``src/utils/audio_utils.py:35``).  Two paths:

* ``resample`` — host numpy path (scipy ``resample_poly``), used during
  decode when a file isn't already at the target rate.
* ``resample_jax`` — jit-compiled JAX implementation expressed as a strided,
  input-dilated convolution with a windowed-sinc kernel, so XLA lowers it to
  the conv units; use this when resampling must run on-device as part of a
  fused preprocessing graph.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np


def _gcd_ratio(orig_sr: int, new_sr: int):
    g = math.gcd(int(orig_sr), int(new_sr))
    return new_sr // g, orig_sr // g  # up, down


def resample(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resample on host. x: [..., samples] float32."""
    if orig_sr == new_sr:
        return x
    from scipy.signal import resample_poly

    up, down = _gcd_ratio(orig_sr, new_sr)
    return resample_poly(x, up, down, axis=-1).astype(np.float32)


@lru_cache(maxsize=16)
def _sinc_kernel(up: int, down: int, zeros: int = 24, rolloff: float = 0.9475937167399596):
    """Windowed-sinc lowpass kernel for rational resampling (numpy, cached).

    Cutoff at ``rolloff * min(1, up/down) * Nyquist`` with a Hann window,
    matching standard kaiser/hann sinc-interpolation resamplers.
    """
    ratio = up / down
    cutoff = rolloff * min(1.0, ratio)
    width = int(math.ceil(zeros / cutoff))
    # kernel taps at phase p, tap k: t = (-width + k) + p/up, scaled by cutoff
    idx = np.arange(-width * up, width * up + 1, dtype=np.float64) / up
    t = idx * cutoff
    window = np.cos(np.clip(t / zeros * math.pi / 2, -math.pi / 2, math.pi / 2)) ** 2
    kernel = np.where(np.abs(t) < zeros, np.sinc(t) * window, 0.0) * cutoff
    return kernel.astype(np.float32), width


@lru_cache(maxsize=16)
def _polyphase_bank(up: int, down: int):
    """Per-phase filter bank [up, 1, 2*width + down] for one strided conv.

    Output sample ``m = a*up + b`` interpolates the input at
    ``a*down + b*down/up`` original samples.  Splitting the dense up-rate
    sinc kernel into its ``up`` phases and embedding each phase's integer
    offset ``q_b = floor(b*down/up)`` into a shared window of length
    ``2*width + down`` turns rational resampling into a single standard
    strided convolution with ``up`` output channels — far cheaper for XLA
    than an input-dilated conv, and it maps onto the TPU conv units.
    """
    dense, width = _sinc_kernel(up, down)
    W = width * up
    dense = np.concatenate([dense, np.zeros(up, np.float32)])
    L = 2 * width + down
    bank = np.zeros((up, 1, L), np.float32)
    for b in range(up):
        s = b * down
        q, r = divmod(s, up)
        # taps i = -width..width hit dense[i*up + r + W]; reversed for
        # correlation semantics, placed at offset q within the window.
        taps = dense[np.arange(-width, width + 1) * up + r + W][::-1]
        bank[b, 0, q : q + 2 * width + 1] = taps
    return bank, width


def resample_jax(x, orig_sr: int, new_sr: int):
    """Rational polyphase resample as one XLA strided conv. x: [batch, samples].

    The dense windowed-sinc kernel (DC gain ``up``) is decomposed into its
    ``up`` polyphase components, evaluated as a single conv with ``up``
    output channels and stride ``down``, then interleaved.
    """
    import jax.numpy as jnp
    from jax import lax

    if orig_sr == new_sr:
        return x
    up, down = _gcd_ratio(orig_sr, new_sr)
    bank_np, width = _polyphase_bank(up, down)
    bank = jnp.asarray(bank_np)

    b, n = x.shape
    target_len = int(math.ceil(n * up / down))
    a_max = (target_len + up - 1) // up  # phase-block count
    lhs = x[:, None, :]  # NCW
    # phase block a taps x[a*down - width + t], t in [0, 2*width + down)
    pad_left = width
    need = (a_max - 1) * down + (2 * width + down)
    pad_right = max(0, need - pad_left - n)
    out = lax.conv_general_dilated(
        lhs,
        bank,
        window_strides=(down,),
        padding=[(pad_left, pad_right)],
        dimension_numbers=("NCW", "OIW", "NCW"),
    )  # [B, up, A]
    y = jnp.transpose(out, (0, 2, 1)).reshape(b, -1)
    return y[:, :target_len]
