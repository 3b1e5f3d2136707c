"""Blockwise Pallas TPU flash attention with WavLM's gated relative
position bias (forward + backward).

Why a custom kernel (vs XLA attention in ``ops/attention.py``):
  * The reference's attention materialises per-layer ``[B·H, T, T]`` score
    and probability tensors (HF WavLM via torch MHA); under a scanned
    24-layer stack the saved probabilities alone are
    ``f32[24, B, H, T, T]`` — 3.4 GB at batch 36 — which OOMs a v5e chip.
    This kernel streams K/V blocks with an online softmax and saves only
    ``out`` + per-row logsumexp, recomputing probabilities in the backward:
    O(T) memory per row instead of O(T²).
  * WavLM's bias is *factored*: ``bias[b,h,q,k] = gate[b,h,q] ·
    pos_bias[h,q,k]``.  The kernel consumes the factors and forms the bias
    per VMEM block, so the gated ``[B,H,T,T]`` tensor never exists in HBM —
    in any dtype, in either pass.

Grid layout: ALL heads are processed per grid step (an unrolled loop inside
the kernel) — per-(batch, head) grids are launch-bound at speech-scale
T≈250 (576 tiny steps per call).  Forward/dq grids iterate (batch,
q-blocks); dk/dv iterates (batch, k-blocks); the dpos_bias output
accumulates across the batch-innermost grid axis.

Numerics: scores/softmax in f32, matmuls via MXU with
``preferred_element_type=f32``; key-padding enters as an additive 0/-1e9
row so fully-padded rows stay finite.  Per-row vectors carry a trailing
unit dim ([..., T, 1]) — TPU block specs need two real trailing dims.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward: grid (B, num_q_blocks); kernel loops heads (unrolled) and k-blocks
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref,
                o_ref, lse_ref, *, block_k: int, scale: float):
    # q/o: [H, BQ, D]; k/v: [H, T, D]; gate/lse: [H, BQ, 1];
    # bias: [H, BQ, T]; madd: [1, T]
    h, bq, d = q_ref.shape
    t = k_ref.shape[1]
    nk = t // block_k
    # matmuls run at the input precision (bf16 inputs -> full MXU rate,
    # f32 accumulation via preferred_element_type); softmax math is f32
    mm = q_ref.dtype

    for hi in range(h):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)  # [BQ, 1]

        def body(ik, carry, hi=hi, q=q, gate=gate):
            m_prev, l_prev, acc = carry
            ks = ik * block_k
            k = k_ref[hi, pl.ds(ks, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [BQ, BK]
            s += gate * bias_ref[hi, :, pl.ds(ks, block_k)].astype(jnp.float32)
            s += madd_ref[:, pl.ds(ks, block_k)].astype(jnp.float32)

            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_cur)
            p = jnp.exp(s - m_cur)
            l_cur = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            v = v_ref[hi, pl.ds(ks, block_k), :]
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(mm), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_cur, l_cur, acc

        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))

        l_safe = jnp.maximum(l, 1e-30)
        o_ref[hi] = (acc / l_safe).astype(o_ref.dtype)
        lse_ref[hi] = (m + jnp.log(l_safe)).astype(jnp.float32)


def _head_group(h: int, t: int = 256, block_q: int = 256,
                d: int = 64) -> int:
    """Heads per grid step, sized to the VMEM budget.

    Dominant per-head block bytes (bwd_dq worst case): two f32
    [block_q, t] bias tiles + bf16 K/V [t, d] + assorted row blocks;
    Pallas double-buffers inputs, so target ~5 MB of single-buffered
    blocks within the 16 MB VMEM.
    """
    per_head = block_q * t * 4 * 2 + t * d * 2 * 2 + block_q * d * 10
    budget = 5 * 1024 * 1024
    for g in (8, 4, 2, 1):
        if h % g == 0 and g * per_head <= budget:
            return g
    return 1


def _fwd(q, k, v, gate, pos_bias, mask_add, *, block_q: int, block_k: int,
         interpret: bool):
    b, h, t, d = q.shape
    nq = t // block_q
    g = _head_group(h, t, block_q, d)
    grid = (b, h // g, nq)
    kernel = functools.partial(
        _fwd_kernel, block_k=block_k, scale=1.0 / (d ** 0.5)
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, block_q, d),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), lambda b_, g_, i: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), lambda b_, g_, i: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_q, t), lambda b_, g_, i: (g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, t), lambda b_, g_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, g, block_q, d),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, gate, pos_bias, mask_add)
    return out, lse


# ---------------------------------------------------------------------------
# backward: dq, dgate, dpos_bias — grid (q-blocks, batch-innermost) so the
# dpos_bias block accumulates over contiguous grid steps
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, gate_ref, bias_ref, madd_ref, do_ref,
                   v_ref, lse_ref, delta_ref,
                   dq_ref, dgate_ref, dbias_ref, *, block_k: int,
                   scale: float):
    h, bq, d = q_ref.shape
    t = k_ref.shape[1]
    nk = t // block_k
    ib = pl.program_id(2)  # batch (innermost)

    @pl.when(ib == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    mm = q_ref.dtype
    for hi in range(h):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)
        lse = lse_ref[hi].astype(jnp.float32)
        delta = delta_ref[hi].astype(jnp.float32)
        do = do_ref[hi]

        def body(ik, carry, hi=hi, q=q, gate=gate, lse=lse, delta=delta,
                 do=do):
            dq_acc, dgate_acc = carry
            ks = ik * block_k
            k = k_ref[hi, pl.ds(ks, block_k), :]
            bias = bias_ref[hi, :, pl.ds(ks, block_k)].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s += gate * bias
            s += madd_ref[:, pl.ds(ks, block_k)].astype(jnp.float32)
            p = jnp.exp(s - lse)
            v = v_ref[hi, pl.ds(ks, block_k), :]
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)  # [BQ, BK], f32
            dq_acc += jax.lax.dot_general(
                ds.astype(mm), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dgate_acc += jnp.sum(ds * bias, axis=1, keepdims=True)
            dbias_ref[hi, :, pl.ds(ks, block_k)] += (gate * ds).astype(
                dbias_ref.dtype
            )
            return dq_acc, dgate_acc

        dq0 = jnp.zeros((bq, d), jnp.float32)
        dg0 = jnp.zeros((bq, 1), jnp.float32)
        dq, dgate = jax.lax.fori_loop(0, nk, body, (dq0, dg0))
        dq_ref[hi] = dq.astype(dq_ref.dtype)
        dgate_ref[hi] = dgate.astype(dgate_ref.dtype)


def _bwd_dq(q, k, v, gate, pos_bias, mask_add, do, lse, delta, *,
            block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    nq = t // block_q
    g = _head_group(h, t, block_q, d)
    # batch innermost: the dbias block accumulates over contiguous steps
    grid = (h // g, nq, b)
    kernel = functools.partial(
        _bwd_dq_kernel, block_k=block_k, scale=1.0 / (d ** 0.5)
    )

    def qb(g_, i, b_):
        return (b_, g_, i, 0)

    dq, dgate, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), lambda g_, i, b_: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_q, t), lambda g_, i, b_: (g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, t), lambda g_, i, b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), lambda g_, i, b_: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_q, t), lambda g_, i, b_: (g_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, t, t), pos_bias.dtype),
        ],
        interpret=interpret,
    )(q, k, gate, pos_bias, mask_add, do, v, lse, delta)
    return dq, dgate, dbias


# ---------------------------------------------------------------------------
# backward: dk, dv — grid (batch, k-blocks); q streamed per head
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref,
                    do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, scale: float):
    h, t, d = q_ref.shape
    bk = k_ref.shape[1]
    nq = t // block_q

    mm = q_ref.dtype
    for hi in range(h):
        k = k_ref[hi]
        madd = madd_ref[:].astype(jnp.float32)  # [1, BK]

        def body(iq, carry, hi=hi, k=k, madd=madd):
            dk_acc, dv_acc = carry
            qs = iq * block_q
            q = q_ref[hi, pl.ds(qs, block_q), :]
            gate = gate_ref[hi, pl.ds(qs, block_q), :].astype(jnp.float32)
            bias = bias_ref[hi, pl.ds(qs, block_q), :].astype(jnp.float32)
            lse = lse_ref[hi, pl.ds(qs, block_q), :].astype(jnp.float32)
            delta = delta_ref[hi, pl.ds(qs, block_q), :].astype(jnp.float32)
            do = do_ref[hi, pl.ds(qs, block_q), :]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s += gate * bias + madd
            p = jnp.exp(s - lse)  # [BQ, BK]
            dv_acc += jax.lax.dot_general(
                p.astype(mm), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            v = v_ref[hi]
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)
            dk_acc += (jax.lax.dot_general(
                ds.astype(mm), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale)
            return dk_acc, dv_acc

        dk0 = jnp.zeros((bk, d), jnp.float32)
        dv0 = jnp.zeros((bk, d), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
        dk_ref[hi] = dk.astype(dk_ref.dtype)
        dv_ref[hi] = dv.astype(dv_ref.dtype)


def _bwd_dkv(q, k, v, gate, pos_bias, mask_add, do, lse, delta, *,
             block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    nk = t // block_k
    g = _head_group(h, t, block_k, d)
    grid = (b, h // g, nk)
    kernel = functools.partial(
        _bwd_dkv_kernel, block_q=block_q, scale=1.0 / (d ** 0.5)
    )
    dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, t, d), lambda b_, g_, i: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, 1), lambda b_, g_, i: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, block_k), lambda b_, g_, i: (g_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k), lambda b_, g_, i: (b_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), lambda b_, g_, i: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, 1), lambda b_, g_, i: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, 1), lambda b_, g_, i: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, g, block_k, d),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d),
                         lambda b_, g_, i: (b_, g_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, gate, pos_bias, mask_add, do, lse, delta)
    return dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash_core(q, k, v, gate, pos_bias, mask_add, block_q, block_k):
    out, _ = _fwd(q, k, v, gate, pos_bias, mask_add,
                  block_q=block_q, block_k=block_k,
                  interpret=_interpret())
    return out


def _flash_core_fwd(q, k, v, gate, pos_bias, mask_add, block_q, block_k):
    out, lse = _fwd(q, k, v, gate, pos_bias, mask_add,
                    block_q=block_q, block_k=block_k,
                    interpret=_interpret())
    return out, (q, k, v, gate, pos_bias, mask_add, out, lse)


def _flash_core_bwd(block_q, block_k, res, g):
    q, k, v, gate, pos_bias, mask_add, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [B,H,T,1]
    interp = _interpret()
    dq, dgate, dbias = _bwd_dq(
        q, k, v, gate, pos_bias, mask_add, g, lse, delta,
        block_q=block_q, block_k=block_k, interpret=interp,
    )
    dk, dv = _bwd_dkv(
        q, k, v, gate, pos_bias, mask_add, g, lse, delta,
        block_q=block_q, block_k=block_k, interpret=interp,
    )
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dgate.astype(gate.dtype), dbias.astype(pos_bias.dtype),
            jnp.zeros_like(mask_add))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def flash_gated_attention(q, k, v, gate, pos_bias,
                          key_padding_mask: Optional[jnp.ndarray] = None,
                          block_q: int = 128, block_k: int = 128):
    """Drop-in replacement for ``ops.attention.gated_bias_attention``.

    Args:
      q, k, v: ``[B, H, T, D]``; gate: ``[B, H, T]``; pos_bias ``[H, T, T]``;
      key_padding_mask: optional ``[B, T]`` (1 = valid).
    Returns ``[B, H, T, D]`` in v's dtype.
    """
    b, h, t, d = q.shape
    t_pad = _ceil_to(t, LANE)
    # short sequences (the 5 s / 249-frame workload) run as one q block —
    # no streaming-softmax overhead; longer audio streams in chunks
    if t_pad <= 512:
        block_q = block_k = t_pad
    else:
        t_pad = _ceil_to(t, block_q)
        block_q = min(block_q, t_pad)
        block_k = min(block_k, t_pad)
    pad_t = t_pad - t

    if key_padding_mask is None:
        valid = jnp.ones((b, t), bool)
    else:
        valid = key_padding_mask.astype(bool)
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        gate = jnp.pad(gate, ((0, 0), (0, 0), (0, pad_t)))
        pos_bias = jnp.pad(pos_bias, ((0, 0), (0, pad_t), (0, pad_t)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_t)))
    # per-row vectors carry a trailing/unit dim (TPU block constraints)
    gate4 = gate[..., None]                               # [B,H,Tp,1]
    mask_add = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    out = _flash_core(q, k, v, gate4, pos_bias, mask_add, block_q, block_k)
    if pad_t:
        out = out[:, :, :t, :]
    return out
