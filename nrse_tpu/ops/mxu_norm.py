"""Channel LayerNorm with MXU-computed statistics.

The WavLM conv frontend applies a per-channel LayerNorm after every conv
layer (HF ``feat_extract_norm="layer"``; our ``models/wavlm.py::
ConvFeatureEncoder``).  At 5 s × bs 36 those tensors are
``[36, 16000..500, 512]`` and the profiler shows XLA's lane-dim reduce
running at ~78 GB/s — ~10% of the step (``tools/analyze_profile.py``,
docs/round2_status.md).  Computing Σx and Σx² as a single thin matmul
against a ``[C, 2]`` constant streams the tensor once through the MXU at
full HBM bandwidth instead.

Numerics match ``flax.linen.LayerNorm`` (f32 stats, fast-variance
``E[x²] − E[x]²``, ε inside the rsqrt); parameters keep the same
names/shapes ("scale", "bias") so checkpoints and the HF converter are
layout-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MXUChannelLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` over the trailing (channel) axis."""

    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)

        xf = x.astype(jnp.float32)
        # Σx and Σx² as thin [.., C] @ [C, 1] dots.  Measured caveat
        # (docs/round2_status.md): XLA canonicalises dot-with-constant-ones
        # back into a lane reduce, so the MXU doesn't actually run these —
        # but the rewritten form still measured best of the three variants
        # tried (459.3 vs 454.0 plain LN vs 457.1 with an
        # optimization_barrier forcing a real dot), so it ships as-is.
        ones = jnp.ones((c, 1), jnp.float32)
        s1 = jnp.matmul(xf, ones, preferred_element_type=jnp.float32)
        s2 = jnp.matmul(xf * xf, ones, preferred_element_type=jnp.float32)
        mean = s1 / c
        var = jnp.maximum(s2 / c - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (xf - mean) * inv
        return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
