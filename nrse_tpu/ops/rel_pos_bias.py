"""WavLM bucketed relative position bias.

The reference relies on HF's ``WavLMAttention.compute_bias`` /
``_relative_positions_bucket`` (transformers ``modeling_wavlm.py``; the
T5-style log-spaced bucketing with ``num_buckets=320``, ``max_distance=800``).

TPU-native design notes:
  * For a fixed sequence length the bucket matrix is a compile-time
    constant — it is computed in numpy (cached) and baked into the program,
    so the only device work is one embedding gather per forward.
  * The bias is kept in its factored form ``pos_bias[H, T, T]`` shared
    across the batch; the per-(batch, head, query) *gate* is applied inside
    the attention op (see ``nrse_tpu/ops/attention.py``) instead of
    materialising HF's ``[B*H, T, T]`` gated tensor — an O(B) HBM-traffic
    saving.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=32)
def relative_position_buckets(
    query_length: int,
    key_length: int,
    num_buckets: int = 320,
    max_distance: int = 800,
) -> np.ndarray:
    """[T_q, T_k] int32 bucket indices (bidirectional T5-style bucketing).

    Half the buckets encode sign (key after query), half the magnitude;
    magnitudes below ``num_buckets//4`` are exact, larger distances are
    log-spaced up to ``max_distance``.
    """
    half = num_buckets // 2
    ctx = np.arange(query_length, dtype=np.int64)[:, None]
    mem = np.arange(key_length, dtype=np.int64)[None, :]
    rel = mem - ctx

    buckets = (rel > 0).astype(np.int64) * half
    rel_abs = np.abs(rel)

    max_exact = half // 2
    is_small = rel_abs < max_exact

    # log-spaced buckets for large distances
    rel_large = rel_abs.astype(np.float64) / max_exact
    with np.errstate(divide="ignore"):
        rel_large = np.log(np.maximum(rel_large, 1e-20))
    rel_large = rel_large / math.log(max_distance / max_exact)
    rel_large = (max_exact + rel_large * (half - max_exact)).astype(np.int64)
    rel_large = np.minimum(rel_large, half - 1)

    buckets += np.where(is_small, rel_abs, rel_large)
    return buckets.astype(np.int32)


def compute_position_bias(rel_attn_embed, query_length: int, key_length: int,
                          num_buckets: int = 320, max_distance: int = 800):
    """Gather the bias table into ``[num_heads, T_q, T_k]``.

    ``rel_attn_embed``: [num_buckets, num_heads] embedding table (the
    encoder-level parameter; HF stores it inside layer 0 — the converter
    re-homes it).
    """
    import jax.numpy as jnp

    buckets = jnp.asarray(
        relative_position_buckets(query_length, key_length, num_buckets, max_distance)
    )
    values = jnp.take(rel_attn_embed, buckets, axis=0)  # [T_q, T_k, H]
    return jnp.transpose(values, (2, 0, 1))


@lru_cache(maxsize=32)
def bucket_of_relative_position(
    seq_length: int,
    num_buckets: int = 320,
    max_distance: int = 800,
) -> np.ndarray:
    """[2·T] int32: bucket index for relative position ``rel = k − q``
    at vector index ``T − 1 + rel`` (rel ∈ [−(T−1), T−1]; the last slot is
    padding that repeats the final bucket).

    The bucket function depends ONLY on ``rel``, so the full ``[T, T]``
    bucket matrix (and therefore the ``[H, T, T]`` position bias) is
    Toeplitz — one [2T] vector per head determines it.  The flash kernel
    exploits this: it consumes the gathered ``bias_rel [H, 2T]`` vector and
    shears blocks out of it on-chip, so the O(T²) bias never exists in HBM.
    """
    t = seq_length
    rel = np.concatenate([
        np.arange(-(t - 1), t, dtype=np.int64),
        np.array([t - 1], dtype=np.int64),  # pad slot (never addressed)
    ])
    half = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * half
    rel_abs = np.abs(rel)
    max_exact = half // 2
    is_small = rel_abs < max_exact
    rel_large = rel_abs.astype(np.float64) / max_exact
    with np.errstate(divide="ignore"):
        rel_large = np.log(np.maximum(rel_large, 1e-20))
    rel_large = rel_large / math.log(max_distance / max_exact)
    rel_large = (max_exact + rel_large * (half - max_exact)).astype(np.int64)
    rel_large = np.minimum(rel_large, half - 1)
    buckets += np.where(is_small, rel_abs, rel_large)
    return buckets.astype(np.int32)


def rel_bias_vector(rel_attn_embed, seq_length: int,
                    num_buckets: int = 320, max_distance: int = 800):
    """Gather the bias table into the Toeplitz generator ``[H, 2T]``.

    ``bias[h, q, k] == rel_bias_vector(...)[h, T − 1 + k − q]``.  The gather
    is O(T); its autodiff adjoint is a scatter-add onto the ``[buckets, H]``
    table — the scan cotangent for the shared bias is 2.5 KB instead of the
    ``[H, T, T]`` tensor.
    """
    import jax.numpy as jnp

    buckets = jnp.asarray(bucket_of_relative_position(
        seq_length, num_buckets, max_distance))
    return jnp.transpose(jnp.take(rel_attn_embed, buckets, axis=0))  # [H,2T]


def dense_bias_from_rel(bias_rel, seq_length: int):
    """Expand the Toeplitz generator ``[H, 2T]`` to dense ``[H, T, T]``
    (``out[h, q, k] = bias_rel[h, T − 1 + k − q]``).  Used by the XLA
    attention path and as the oracle in kernel tests; the flash kernel
    never materialises this."""
    import jax.numpy as jnp

    t = seq_length
    idx = (t - 1) + (jnp.arange(t)[None, :] - jnp.arange(t)[:, None])
    return jnp.take(bias_rel, idx, axis=1)  # [H, T, T]


def relative_position_buckets_jnp(query_length: int, key_length: int,
                                  num_buckets: int = 320,
                                  max_distance: int = 800):
    """On-device bucket matrix from iota (same math as the numpy version).

    Computed inside jit so no giant [T, T] integer *literal* is baked into
    the program — XLA fuses the index math into the downstream gather
    (a materialised int32 constant gets a catastrophically padded layout).
    """
    import jax
    import jax.numpy as jnp

    half = num_buckets // 2
    ctx = jax.lax.broadcasted_iota(jnp.int32, (query_length, key_length), 0)
    mem = jax.lax.broadcasted_iota(jnp.int32, (query_length, key_length), 1)
    rel = mem - ctx

    buckets = jnp.where(rel > 0, half, 0)
    rel_abs = jnp.abs(rel)
    max_exact = half // 2
    is_small = rel_abs < max_exact

    rel_large = jnp.log(jnp.maximum(rel_abs.astype(jnp.float32), 1.0)
                        / max_exact)
    rel_large = rel_large / math.log(max_distance / max_exact)
    rel_large = (max_exact + rel_large * (half - max_exact)).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, half - 1)

    return buckets + jnp.where(is_small, rel_abs, rel_large)
