"""Gated relative-position-bias self-attention (WavLM style).

Semantics parity with HF ``WavLMAttention`` (transformers
``modeling_wavlm.py``): scores = q·kᵀ/√d + gate ⊙ pos_bias, key-padding
masked, softmaxed, applied to v.  The *gate* is a per-(batch, head, query)
scalar computed from the attention input; HF materialises the gated bias as
a ``[B*H, T, T]`` tensor before calling torch MHA — here the factored form
``gate[B,H,T,1] * pos_bias[H,T,T]`` is consumed directly, so the full gated
bias never hits HBM.

Two interchangeable implementations:
  * ``gated_bias_attention`` — pure XLA (this module): jnp einsums that XLA
    fuses; numerically the reference for tests and the CPU path.
  * ``nrse_tpu.ops.flash_attention.flash_gated_attention`` — blockwise
    Pallas TPU kernel (streaming softmax, fwd+bwd) computing the gated bias
    per block in VMEM.

Selection happens in the model via the ``tpu.flash_attention`` config flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite mask value: keeps fully-masked rows NaN-free


def gated_bias_attention(q, k, v, gate, pos_bias, key_padding_mask=None,
                         *, softmax_dtype=jnp.float32):
    """Multi-head self-attention with a query-gated additive bias.

    Args:
      q, k, v: ``[B, H, T, D]``.
      gate: ``[B, H, T]`` per-query bias gate.
      pos_bias: ``[H, T, T]`` batch-shared relative position bias.
      key_padding_mask: optional ``[B, T]`` (1 = valid key).

    Returns:
      ``[B, H, T, D]`` attention output (same dtype as v).
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=softmax_dtype))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=softmax_dtype
    ) * scale
    scores = scores + gate[..., None].astype(softmax_dtype) * pos_bias[None].astype(
        softmax_dtype
    )
    if key_padding_mask is not None:
        keep = key_padding_mask[:, None, None, :].astype(bool)
        scores = jnp.where(keep, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=v.dtype,
    )
    return out
