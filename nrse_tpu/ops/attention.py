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


@jax.custom_jvp
def _exp_bf16(x):
    """``exp(x)`` stored (and differentiated through) at bfloat16.

    Plain ``jnp.exp(x).astype(bf16)`` keeps the f32 exp output alive as
    the autodiff residual — a full [B,H,T,T] f32 materialisation in the
    backward pass.  The custom JVP uses the *rounded* output as its own
    derivative (d exp = exp), so the only residual is the bf16 tensor the
    forward stores anyway; the gradient differs from exact by one bf16
    rounding, the same error already accepted on the forward values.
    """
    return jnp.exp(x).astype(jnp.bfloat16)


@_exp_bf16.defjvp
def _exp_bf16_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    p = _exp_bf16(x)
    return p, p * dx.astype(jnp.bfloat16)


def gated_bias_attention(q, k, v, gate, pos_bias, key_padding_mask=None,
                         *, softmax_dtype=jnp.float32, score_dtype=None):
    """Multi-head self-attention with a query-gated additive bias.

    Args:
      q, k, v: ``[B, H, T, D]``.
      gate: ``[B, H, T]`` per-query bias gate.
      pos_bias: ``[H, T, T]`` batch-shared relative position bias.
      key_padding_mask: optional ``[B, T]`` (1 = valid key).
      softmax_dtype: accumulation dtype for the softmax reductions
        (max/exp/sum stay in this dtype inside the fusion registers).
      score_dtype: *storage* dtype for the two materialised ``[B, H, T, T]``
        tensors (raw QK scores and the softmax probabilities).  The step is
        HBM-bandwidth-bound on exactly these tensors (profile: four f32
        passes/layer ≈ 20% of the round-3 step), so ``bfloat16`` halves
        that traffic while every reduction still runs in ``softmax_dtype``:
        the upcast + bias-add + mask chain fuses into the softmax pass and
        never hits HBM at f32.  ``None`` (default) stores at
        ``softmax_dtype`` — bit-identical to the pre-knob behaviour and the
        HF-parity path.

    Returns:
      ``[B, H, T, D]`` attention output (same dtype as v).
    """
    d = q.shape[-1]
    sd = softmax_dtype if score_dtype is None else score_dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=softmax_dtype))
    scores_raw = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=sd)
    if sd != softmax_dtype:
        # without the barrier XLA's algebraic simplifier rewrites
        # convert_f32(dot→bf16) into an f32-output dot (precision-raising,
        # legal) and the bf16 storage silently never happens — measured:
        # bit-identical loss to the f32 path.
        scores_raw = jax.lax.optimization_barrier(scores_raw)
    scores = scores_raw.astype(softmax_dtype) * scale
    scores = scores + gate[..., None].astype(softmax_dtype) * pos_bias[None].astype(
        softmax_dtype
    )
    if key_padding_mask is not None:
        keep = key_padding_mask[:, None, None, :].astype(bool)
        scores = jnp.where(keep, scores, NEG_INF)
    if sd == softmax_dtype:
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
            preferred_element_type=v.dtype,
        )
        return out
    # Bandwidth-optimised storage path: materialise the two [B,H,T,T]
    # tensors at sd (bf16) with the softmax *reductions* still in
    # softmax_dtype registers.  The naive ``softmax(...).astype(bf16)``
    # form is a no-op on TPU — XLA's algebraic simplifier rewrites
    # ``convert_f32(dot_bf16)`` back to an f32-output dot and the probs
    # were already rounded to v.dtype before the PV einsum — so this path
    # restructures the dataflow flash-style instead: store unnormalised
    # ``exp(s−m)`` at sd, keep ``m``/``z`` as tiny f32 [B,H,T] tensors in
    # the same fusion, and rescale by ``1/z`` AFTER the PV dot (the
    # deferred normalisation is exact up to rounding; the dot accumulates
    # f32 on the MXU either way).
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    if sd == jnp.bfloat16:
        p = _exp_bf16(scores - m)   # [B,H,T,T]; only bf16 residual saved
    else:
        p = jnp.exp(scores - m).astype(sd)
    z = jnp.sum(p.astype(softmax_dtype), axis=-1)  # f32 [B,H,T]
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=softmax_dtype,
    )
    out = out / z[..., None].astype(softmax_dtype)
    return out.astype(v.dtype)
