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
    pos_bias[h,q,k]`` — and the positional part is **Toeplitz**: the bucket
    function depends only on the relative offset ``k − q``
    (``ops/rel_pos_bias.py::bucket_of_relative_position``), so one
    ``bias_rel [H, 2T]`` vector generates the whole ``[H, T, T]`` tensor.
    The kernels consume that vector and *shear* each ``[BQ, BK]`` bias block
    out of it on-chip (log2(BQ) static-shift roll passes on the VPU); the
    backward accumulates ``dbias`` back onto the ``[H, 2T]`` vector with the
    adjoint shear.  The O(T²) bias never exists in HBM — in any dtype, in
    either pass — and neither does its gradient.

Grid layout: ALL heads of a VMEM-sized group are processed per grid step
(an unrolled loop inside the kernel) — per-(batch, head) grids are
launch-bound at speech-scale T≈250.  Forward/dq grids iterate (batch,
q-blocks); dk/dv iterates (batch, k-blocks); the dbias_rel output
accumulates across the (q-block, batch) grid axes.

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
# Toeplitz shear: build bias blocks from the [2T] relative-offset vector
# ---------------------------------------------------------------------------

def _roll_left(m, s: int):
    """Static circular left-shift along lanes: out[:, j] = m[:, (j+s) % n]."""
    if s == 0:
        return m
    return jnp.concatenate([m[:, s:], m[:, :s]], axis=1)


def _shear_rows(w, bq: int):
    """[1, n] window → [bq, n] Toeplitz rows: out[i, j] = w[0, bq-1-i+j].

    Valid for j ≤ n − bq (later columns wrap circularly — callers only read
    the leading columns).  Row ``i`` is the window left-rolled by
    ``bq-1-i``; the per-row shift is applied as log2(bq) masked
    static-shift roll passes (power-of-two decomposition of the shift).
    """
    n = w.shape[-1]
    m = jnp.broadcast_to(w, (bq, n))
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, n), 0)
    r = (bq - 1) - row
    s = 1
    while s < bq:
        m = jnp.where((r & s) != 0, _roll_left(m, s), m)
        s *= 2
    return m


def _shear_rows_adjoint(ds, n: int):
    """Adjoint of ``_shear_rows``: scatter [bq, bk] block diagonals into a
    [1, n] vector: out[0, p] = Σ_{i,j: bq-1-i+j = p} ds[i, j].

    Requires n ≥ bq + bk − 1 (no wraparound of real contributions).
    """
    bq, bk = ds.shape
    m = jnp.pad(ds, ((0, 0), (0, n - bk)))
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, n), 0)
    r = (bq - 1) - row
    s = 1
    while s < bq:
        # right-roll by s == left-roll by n - s
        m = jnp.where((r & s) != 0, _roll_left(m, n - s), m)
        s *= 2
    return jnp.sum(m, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# forward: grid (B, head-groups, q-blocks); kernel loops heads and k-blocks
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, gate_ref, brel_ref, madd_ref,
                o_ref, lse_ref, *, block_k: int, scale: float):
    # q/o: [H, BQ, D]; k/v: [H, T, D]; gate/lse: [H, BQ, 1];
    # brel: [H, 2T]; madd: [1, T]
    h, bq, d = q_ref.shape
    t = k_ref.shape[1]
    nk = t // block_k
    qs = pl.program_id(2) * bq
    # matmuls run at the input precision (bf16 inputs -> full MXU rate,
    # f32 accumulation via preferred_element_type); softmax math is f32
    mm = q_ref.dtype

    for hi in range(h):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)  # [BQ, 1]
        # hoisted Toeplitz shear: bias rows for this q-block over ALL keys
        # (bias_row[i, j] = brel[(t-bq-qs) + bq-1-i+j] = bias[qs+i, j])
        start = t - bq - qs
        w = brel_ref[hi, 0, pl.ds(start, bq + t)].reshape(1, bq + t)
        bias_row = _shear_rows(w, bq)  # [BQ, BQ+T]; cols [0, T) valid

        def body(ik, carry, hi=hi, q=q, gate=gate, bias_row=bias_row):
            m_prev, l_prev, acc = carry
            ks = ik * block_k
            k = k_ref[hi, pl.ds(ks, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [BQ, BK]
            s += gate * jax.lax.dynamic_slice_in_dim(
                bias_row, ks, block_k, axis=1).astype(jnp.float32)
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

    Dominant per-head bytes: double-buffered K/V/dO [t, d] streams plus
    q/o/row blocks; the sheared bias temp [block_q, block_q + t] f32 is
    per-kernel (heads run sequentially), counted once.  Target ~6 MB of
    the 16 MB VMEM.
    """
    per_head = 3 * t * d * 2 * 2 + block_q * d * 4 * 8 + 2 * t * 4
    shared = block_q * (block_q + t) * 4 * 2
    budget = 6 * 1024 * 1024
    for g in (16, 8, 4, 2, 1):
        if h % g == 0 and g * per_head + shared <= budget:
            return g
    return 1


def _fwd(q, k, v, gate, bias_rel, mask_add, *, block_q: int, block_k: int,
         interpret: bool):
    b, h, t, d = q.shape
    bias_rel = bias_rel.reshape(h, 1, 2 * t)  # unit sublane dim for Mosaic
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
            pl.BlockSpec((g, 1, 2 * t), lambda b_, g_, i: (g_, 0, 0),
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
    )(q, k, v, gate, bias_rel, mask_add)
    return out, lse


# ---------------------------------------------------------------------------
# backward: dq, dgate, dbias_rel — grid (q-blocks, batch innermost) so the
# dbias_rel block accumulates across contiguous grid steps
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, gate_ref, brel_ref, madd_ref, do_ref,
                   v_ref, lse_ref, delta_ref,
                   dq_ref, dgate_ref, dbrel_ref, *, block_k: int,
                   scale: float):
    h, bq, d = q_ref.shape
    t = k_ref.shape[1]
    nk = t // block_k
    iq = pl.program_id(1)
    ib = pl.program_id(2)  # batch (innermost)
    qs = iq * bq

    @pl.when((ib == 0) & (iq == 0))
    def _():
        dbrel_ref[:] = jnp.zeros_like(dbrel_ref)

    mm = q_ref.dtype
    for hi in range(h):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)
        lse = lse_ref[hi].astype(jnp.float32)
        delta = delta_ref[hi].astype(jnp.float32)
        do = do_ref[hi]
        start = t - bq - qs
        w = brel_ref[hi, 0, pl.ds(start, bq + t)].reshape(1, bq + t)
        bias_row = _shear_rows(w, bq)  # [BQ, BQ+T]

        def body(ik, carry, hi=hi, q=q, gate=gate, lse=lse, delta=delta,
                 do=do, bias_row=bias_row):
            dq_acc, dgate_acc, drel_acc = carry
            ks = ik * block_k
            k = k_ref[hi, pl.ds(ks, block_k), :]
            bias = jax.lax.dynamic_slice_in_dim(
                bias_row, ks, block_k, axis=1).astype(jnp.float32)
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
            # dbias block → diagonal sums onto the relative-offset vector
            dvec = _shear_rows_adjoint(gate * ds, bq + block_k)  # [1, BQ+BK]
            seg = jax.lax.dynamic_slice(drel_acc, (0, ks), (1, bq + block_k))
            drel_acc = jax.lax.dynamic_update_slice(
                drel_acc, seg + dvec, (0, ks))
            return dq_acc, dgate_acc, drel_acc

        dq0 = jnp.zeros((bq, d), jnp.float32)
        dg0 = jnp.zeros((bq, 1), jnp.float32)
        dr0 = jnp.zeros((1, bq + t), jnp.float32)
        dq, dgate, drel = jax.lax.fori_loop(0, nk, body, (dq0, dg0, dr0))
        dq_ref[hi] = dq.astype(dq_ref.dtype)
        dgate_ref[hi] = dgate.astype(dgate_ref.dtype)
        dbrel_ref[hi, :, pl.ds(start, bq + t)] += drel


def _bwd_dq(q, k, v, gate, bias_rel, mask_add, do, lse, delta, *,
            block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    bias_rel = bias_rel.reshape(h, 1, 2 * t)
    nq = t // block_q
    g = _head_group(h, t, block_q, d)
    # batch innermost: the dbias_rel block accumulates over contiguous steps
    grid = (h // g, nq, b)
    kernel = functools.partial(
        _bwd_dq_kernel, block_k=block_k, scale=1.0 / (d ** 0.5)
    )

    def qb(g_, i, b_):
        return (b_, g_, i, 0)

    dq, dgate, dbrel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), lambda g_, i, b_: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, 2 * t), lambda g_, i, b_: (g_, 0, 0),
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
            pl.BlockSpec((g, 1, 2 * t), lambda g_, i, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, 2 * t), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, gate, bias_rel, mask_add, do, v, lse, delta)
    return dq, dgate, dbrel.reshape(h, 2 * t)


# ---------------------------------------------------------------------------
# backward: dk, dv — grid (batch, k-blocks); q streamed per head
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, gate_ref, brel_ref, madd_ref,
                    do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, scale: float):
    h, t, d = q_ref.shape
    bk = k_ref.shape[1]
    nq = t // block_q
    ik = pl.program_id(2)
    ks = ik * bk

    mm = q_ref.dtype
    for hi in range(h):
        k = k_ref[hi]
        madd = madd_ref[:].astype(jnp.float32)  # [1, BK]

        def body(iq, carry, hi=hi, k=k, madd=madd):
            dk_acc, dv_acc = carry
            qs = iq * block_q
            q = q_ref[hi, pl.ds(qs, block_q), :]
            gate = gate_ref[hi, pl.ds(qs, block_q), :].astype(jnp.float32)
            start = t - block_q + ks - qs
            w = brel_ref[hi, 0, pl.ds(start, block_q + bk)].reshape(
                1, block_q + bk)
            bias = _shear_rows(w, block_q)[:, :bk].astype(jnp.float32)
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


def _bwd_dkv(q, k, v, gate, bias_rel, mask_add, do, lse, delta, *,
             block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    bias_rel = bias_rel.reshape(h, 1, 2 * t)
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
            pl.BlockSpec((g, 1, 2 * t), lambda b_, g_, i: (g_, 0, 0),
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
    )(q, k, v, gate, bias_rel, mask_add, do, lse, delta)
    return dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash_core(q, k, v, gate, bias_rel, mask_add, block_q, block_k):
    out, _ = _fwd(q, k, v, gate, bias_rel, mask_add,
                  block_q=block_q, block_k=block_k,
                  interpret=_interpret())
    return out


def _flash_core_fwd(q, k, v, gate, bias_rel, mask_add, block_q, block_k):
    out, lse = _fwd(q, k, v, gate, bias_rel, mask_add,
                    block_q=block_q, block_k=block_k,
                    interpret=_interpret())
    return out, (q, k, v, gate, bias_rel, mask_add, out, lse)


def _flash_core_bwd(block_q, block_k, res, g):
    q, k, v, gate, bias_rel, mask_add, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [B,H,T,1]
    interp = _interpret()
    dq, dgate, dbrel = _bwd_dq(
        q, k, v, gate, bias_rel, mask_add, g, lse, delta,
        block_q=block_q, block_k=block_k, interpret=interp,
    )
    dk, dv = _bwd_dkv(
        q, k, v, gate, bias_rel, mask_add, g, lse, delta,
        block_q=block_q, block_k=block_k, interpret=interp,
    )
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dgate.astype(gate.dtype), dbrel.astype(bias_rel.dtype),
            jnp.zeros_like(mask_add))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def flash_gated_attention(q, k, v, gate, bias_rel,
                          key_padding_mask: Optional[jnp.ndarray] = None,
                          block_q: int = 128, block_k: int = 128):
    """Drop-in replacement for ``ops.attention.gated_bias_attention``,
    consuming the position bias in Toeplitz-generator form.

    Args:
      q, k, v: ``[B, H, T, D]``; gate: ``[B, H, T]``;
      bias_rel: ``[H, 2T]`` relative-offset bias vector
        (``ops.rel_pos_bias.rel_bias_vector``: entry ``[h, T-1+k-q]`` is the
        bias for query q / key k; the dense ``[H, T, T]`` equivalent is
        ``dense_bias_from_rel``);
      key_padding_mask: optional ``[B, T]`` (1 = valid).
    Returns ``[B, H, T, D]`` in v's dtype.
    """
    b, h, t, d = q.shape
    assert bias_rel.ndim == 2 and bias_rel.shape == (h, 2 * t), (
        f"bias_rel must be [H, 2T]=({h},{2*t}), got {bias_rel.shape}"
    )
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
        # re-centre the [H, 2T] vector at the padded length; padded
        # positions are masked, values only need to be finite (edge-pad)
        bias_rel = jnp.pad(bias_rel, ((0, 0), (pad_t, pad_t)), mode="edge")
        valid = jnp.pad(valid, ((0, 0), (0, pad_t)))
    # per-row vectors carry a trailing/unit dim (TPU block constraints)
    gate4 = gate[..., None]                               # [B,H,Tp,1]
    mask_add = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    out = _flash_core(q, k, v, gate4, bias_rel, mask_add, block_q, block_k)
    if pad_t:
        out = out[:, :, :t, :]
    return out
