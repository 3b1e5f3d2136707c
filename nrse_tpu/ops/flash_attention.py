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
    The host wrapper gathers per-block *windows* of that vector (an O(T)
    tensor per block row), the kernels shear each ``[BQ, BK]`` bias block
    out of the window on-chip (log2(BQ) masked static-shift roll passes on
    the VPU), and the backward emits per-window ``dbias`` rows that the
    wrapper folds back onto the ``[H, 2T]`` vector.  The O(T²) bias never
    exists in HBM — in any dtype, in either pass — and neither does its
    gradient.

Mosaic constraints shaping the design (learned the hard way — interpret
mode accepts more than the TPU compiler):
  * no ``dynamic_slice`` on *values* — every in-kernel slice offset is a
    Python constant: the k/q inner loops are unrolled (trip counts are
    compile-time constants) and window placement happens via BlockSpec
    index maps instead of runtime offsets;
  * per-row vectors carry a trailing unit dim ([..., T, 1]) and the bias
    windows a unit sublane dim — TPU block specs need two real trailing
    dims.

Grid layout: ALL heads of a VMEM-sized group are processed per grid step
(an unrolled loop inside the kernel) — per-(batch, head) grids are
launch-bound at speech-scale T≈250.  Forward/dq grids iterate (batch,
q-blocks) / (q-blocks, batch); dk/dv iterates (batch, k-blocks); the
per-window dbias output block is revisited across the innermost batch axis
and accumulated in place.

Numerics: scores/softmax in f32, matmuls via MXU with
``preferred_element_type=f32``; key-padding enters as an additive 0/-1e9
row so fully-padded rows stay finite.
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
# Toeplitz shear: build bias blocks from relative-offset windows
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
# window gathers (XLA side, O(T) per block row) and the dbias fold-back
# ---------------------------------------------------------------------------

def _q_windows(bias_rel, t: int, block_q: int):
    """[H, 2T] → [H, NQ, BQ+T]: window i covers queries [i·BQ, (i+1)·BQ)
    against ALL keys; ``win[h, i, p] = bias_rel[h, (t − (i+1)·BQ) + p]`` so
    the sheared rows satisfy ``bias[qs+r, j] = shear(win_i)[r, j]``."""
    nq = t // block_q
    starts = t - block_q * (jnp.arange(nq, dtype=jnp.int32) + 1)
    idx = starts[:, None] + jnp.arange(block_q + t, dtype=jnp.int32)[None, :]
    return jnp.take(bias_rel, idx, axis=1)


def _k_windows(bias_rel, t: int, block_k: int):
    """[H, 2T] → [H, NK, T+BK]: window i covers keys [i·BK, (i+1)·BK)
    against ALL queries; ``win[h, i, p] = bias_rel[h, i·BK + p]``."""
    nk = t // block_k
    starts = block_k * jnp.arange(nk, dtype=jnp.int32)
    idx = starts[:, None] + jnp.arange(t + block_k, dtype=jnp.int32)[None, :]
    return jnp.take(bias_rel, idx, axis=1)


def _fold_q_windows(dwin, t: int, block_q: int):
    """Adjoint of ``_q_windows``: [H, NQ, BQ+T] → [H, 2T] overlap-add."""
    h, nq, w = dwin.shape
    out = jnp.zeros((h, 2 * t), dwin.dtype)
    for i in range(nq):
        start = t - block_q * (i + 1)
        out = out.at[:, start:start + w].add(dwin[:, i, :])
    return out


# ---------------------------------------------------------------------------
# forward: grid (B, head-groups, q-blocks); kernel loops heads and k-blocks
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, gate_ref, win_ref, madd_ref,
                o_ref, lse_ref, *, block_k: int, scale: float):
    # q/o: [H, BQ, D]; k/v: [H, T, D]; gate/lse: [H, BQ, 1];
    # win: [H, 1, BQ+T] (this q-block's bias window); madd: [1, T]
    h, bq, d = q_ref.shape
    t = k_ref.shape[1]
    nk = t // block_k
    # matmuls run at the input precision (bf16 inputs -> full MXU rate,
    # f32 accumulation via preferred_element_type); softmax math is f32
    mm = q_ref.dtype

    for hi in range(h):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)  # [BQ, 1]
        # hoisted Toeplitz shear: bias rows for this q-block over ALL keys
        bias_row = _shear_rows(win_ref[hi], bq)  # [BQ, BQ+T]; cols [0,T)

        if nk == 1:
            # single k-block (the 5 s workload, T≤512): plain softmax —
            # no streaming rescale (alpha multiplies on the [BQ, D]
            # accumulator and the running-max compare are pure overhead
            # when every key is visible at once)
            s = jax.lax.dot_general(
                q, k_ref[hi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s += gate * bias_row[:, :block_k].astype(jnp.float32)
            s += madd_ref[:, :].astype(jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l_safe = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
            acc = jax.lax.dot_general(
                p.astype(mm), v_ref[hi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[hi] = (acc / l_safe).astype(o_ref.dtype)
            lse_ref[hi] = (m + jnp.log(l_safe)).astype(jnp.float32)
            continue

        m = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc = jnp.zeros((bq, d), jnp.float32)
        for ik in range(nk):  # unrolled: every slice offset is static
            ks = ik * block_k
            k = k_ref[hi, ks:ks + block_k, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [BQ, BK]
            s += gate * bias_row[:, ks:ks + block_k].astype(jnp.float32)
            s += madd_ref[:, ks:ks + block_k].astype(jnp.float32)

            m_cur = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_cur)
            p = jnp.exp(s - m_cur)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            v = v_ref[hi, ks:ks + block_k, :]
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(mm), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_cur

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
    nq = t // block_q
    qwin = _q_windows(bias_rel, t, block_q)[:, :, None, :]  # [H,NQ,1,BQ+T]
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
            pl.BlockSpec((g, None, 1, block_q + t),
                         lambda b_, g_, i: (g_, i, 0, 0),
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
    )(q, k, v, gate, qwin, mask_add)
    return out, lse


# ---------------------------------------------------------------------------
# backward: dq, dgate, dbias windows — grid (q-blocks, batch innermost) so
# each (head-group, q-block) dbias window accumulates across batch steps
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, gate_ref, win_ref, madd_ref, do_ref,
                   v_ref, lse_ref, delta_ref,
                   dq_ref, dgate_ref, dwin_ref, *, block_k: int,
                   scale: float):
    h, bq, d = q_ref.shape
    t = k_ref.shape[1]
    nk = t // block_k
    ib = pl.program_id(2)  # batch (innermost; dwin block is revisited)

    @pl.when(ib == 0)
    def _():
        dwin_ref[:] = jnp.zeros_like(dwin_ref)

    mm = q_ref.dtype
    for hi in range(h):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)
        lse = lse_ref[hi].astype(jnp.float32)
        delta = delta_ref[hi].astype(jnp.float32)
        do = do_ref[hi]
        bias_row = _shear_rows(win_ref[hi], bq)  # [BQ, BQ+T]

        dq_acc = jnp.zeros((bq, d), jnp.float32)
        dgate_acc = jnp.zeros((bq, 1), jnp.float32)
        dwin_acc = jnp.zeros((1, bq + t), jnp.float32)
        for ik in range(nk):  # unrolled: static offsets only
            ks = ik * block_k
            k = k_ref[hi, ks:ks + block_k, :]
            bias = bias_row[:, ks:ks + block_k].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s += gate * bias
            s += madd_ref[:, ks:ks + block_k].astype(jnp.float32)
            p = jnp.exp(s - lse)
            v = v_ref[hi, ks:ks + block_k, :]
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
            # dbias block → diagonal sums at window offset ks (static pad)
            dvec = _shear_rows_adjoint(gate * ds, bq + block_k)
            dwin_acc += jnp.pad(dvec, ((0, 0), (ks, t - block_k - ks)))

        dq_ref[hi] = dq_acc.astype(dq_ref.dtype)
        dgate_ref[hi] = dgate_acc.astype(dgate_ref.dtype)
        dwin_ref[hi] += dwin_acc  # accumulates across the batch grid axis


def _bwd_dq(q, k, v, gate, bias_rel, mask_add, do, lse, delta, *,
            block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    nq = t // block_q
    qwin = _q_windows(bias_rel, t, block_q)[:, :, None, :]  # [H,NQ,1,BQ+T]
    g = _head_group(h, t, block_q, d)
    # batch innermost: each (head-group, q-block) dbias window block stays
    # resident and accumulates over contiguous steps
    grid = (h // g, nq, b)
    kernel = functools.partial(
        _bwd_dq_kernel, block_k=block_k, scale=1.0 / (d ** 0.5)
    )

    def qb(g_, i, b_):
        return (b_, g_, i, 0)

    dq, dgate, dwin = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), lambda g_, i, b_: (b_, g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, None, 1, block_q + t),
                         lambda g_, i, b_: (g_, i, 0, 0),
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
            pl.BlockSpec((g, None, 1, block_q + t),
                         lambda g_, i, b_: (g_, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, nq, 1, block_q + t), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, gate, qwin, mask_add, do, v, lse, delta)
    dbrel = _fold_q_windows(dwin[:, :, 0, :], t, block_q)
    return dq, dgate, dbrel


# ---------------------------------------------------------------------------
# backward: dk, dv — grid (batch, k-blocks); q streamed per head
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, gate_ref, kwin_ref, madd_ref,
                    do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, scale: float):
    h, t, d = q_ref.shape
    bk = k_ref.shape[1]
    nq = t // block_q

    mm = q_ref.dtype
    for hi in range(h):
        k = k_ref[hi]
        v = v_ref[hi]
        madd = madd_ref[:].astype(jnp.float32)  # [1, BK]
        # hoisted full-width shear (qs-independent): each q-block below
        # takes a static column slice.  Broadcast-then-slice keeps Mosaic
        # layouts offset-free — shearing a window *slice* puts a vpad
        # offset on the broadcast source, which Mosaic rejects for packed
        # (bf16) dtypes ("Invalid input layout" on vector.broadcast).
        rows = _shear_rows(kwin_ref[hi], block_q)  # [BQ, T+BK]

        dk_acc = jnp.zeros((bk, d), jnp.float32)
        dv_acc = jnp.zeros((bk, d), jnp.float32)
        for iq in range(nq):  # unrolled: static offsets only
            qs = iq * block_q
            q = q_ref[hi, qs:qs + block_q, :]
            gate = gate_ref[hi, qs:qs + block_q, :].astype(jnp.float32)
            start = t - block_q - qs
            bias = rows[:, start:start + bk].astype(jnp.float32)
            lse = lse_ref[hi, qs:qs + block_q, :].astype(jnp.float32)
            delta = delta_ref[hi, qs:qs + block_q, :].astype(jnp.float32)
            do = do_ref[hi, qs:qs + block_q, :]

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
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)
            dk_acc += (jax.lax.dot_general(
                ds.astype(mm), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale)

        dk_ref[hi] = dk_acc.astype(dk_ref.dtype)
        dv_ref[hi] = dv_acc.astype(dv_ref.dtype)


def _bwd_dkv(q, k, v, gate, bias_rel, mask_add, do, lse, delta, *,
             block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    nk = t // block_k
    kwin = _k_windows(bias_rel, t, block_k)[:, :, None, :]  # [H,NK,1,T+BK]
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
            pl.BlockSpec((g, None, 1, t + block_k),
                         lambda b_, g_, i: (g_, i, 0, 0),
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
    )(q, k, v, gate, kwin, mask_add, do, lse, delta)
    return dk, dv


# ---------------------------------------------------------------------------
# streamed-K/V variants: the k-dimension lives IN the Pallas grid
# ---------------------------------------------------------------------------
#
# The kernels above keep full [T, D] K/V/dO streams (and a [BQ, BQ+T]
# sheared-bias temp) resident per grid step — past T≈4-6k that exceeds the
# 16 MB VMEM scoped-allocation limit (round-2's 120 s failure,
# docs/round2_status.md).  These variants make per-step VMEM
# T-INDEPENDENT: K/V/dO arrive as [BK, D] blocks via BlockSpec, the online
# softmax state (m/l/acc) persists in VMEM scratch across the sequential
# k-axis grid steps, bias windows are per-(q-block, k-block) [BQ+BK]
# vectors (sheared on-chip like before, but on O(BQ+BK) temps), and
# dq/dgate/dk/dv accumulate directly in their output blocks, whose index
# is constant along the innermost axis (one writeback per block).
# Requires BQ == BK (the wrapper enforces it for multi-block T anyway).

STREAM_THRESHOLD = 3072  # t_pad above this uses the streamed kernels


def _qk_windows(bias_rel, t: int, bq: int, bk: int):
    """[H, 2T] → [H, NQ, NK, 1, BQ+BK]: window (iq, ik) generates bias
    block (q-rows [iq·BQ, …), k-cols [ik·BK, …)) under ``_shear_rows``:
    ``win[h, iq, ik, 0, p] = bias_rel[h, t − (iq+1)·BQ + ik·BK + p]``."""
    nq, nk = t // bq, t // bk
    starts = (t - bq * (jnp.arange(nq, dtype=jnp.int32)[:, None] + 1)
              + bk * jnp.arange(nk, dtype=jnp.int32)[None, :])
    idx = starts[:, :, None] + jnp.arange(bq + bk, dtype=jnp.int32)
    return jnp.take(bias_rel, idx, axis=1)[:, :, :, None, :]


def _fold_qk_windows(dwin, t: int, bq: int):
    """Adjoint of ``_qk_windows`` for BQ == BK: [H, NQ, NK, W] → [H, 2T].

    Window (iq, ik) starts at ``t − BQ + (ik−iq)·BQ`` — constant along
    diagonals — so the fold is one overlap-add per diagonal, not per pair.
    """
    h, nq, nk, w = dwin.shape
    out = jnp.zeros((h, 2 * t), dwin.dtype)
    for diag in range(-(nq - 1), nk):
        parts = [dwin[:, iq, iq + diag, :] for iq in range(nq)
                 if 0 <= iq + diag < nk]
        acc = parts[0] if len(parts) == 1 else sum(parts)
        start = t - bq + diag * bq
        out = out.at[:, start:start + w].add(acc)
    return out


def _head_group_streamed(h: int) -> int:
    """Per-step buffers are all O(BQ·D) — VMEM fits any group size."""
    for g in (16, 8, 4, 2, 1):
        if h % g == 0:
            return g
    return 1


def _fwd_streamed_kernel(q_ref, k_ref, v_ref, gate_ref, win_ref, madd_ref,
                         o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                         scale: float):
    # q/o: [g, BQ, D]; k/v: [g, BK, D]; gate: [g, BQ, 1];
    # win: [g, 1, BQ+BK]; madd: [1, BK]; scratch m/l: [g, BQ, 1] f32,
    # acc: [g, BQ, D] f32 — persists across the innermost k grid axis
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    g, bq, d = q_ref.shape
    bk = k_ref.shape[1]

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    mm = q_ref.dtype
    madd = madd_ref[:].astype(jnp.float32)  # [1, BK]
    for hi in range(g):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)
        bias = _shear_rows(win_ref[hi], bq)[:, :bk].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_ref[hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s += gate * bias + madd

        m_prev = m_scr[hi]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_scr[hi] = l_scr[hi] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[hi] = acc_scr[hi] * alpha + jax.lax.dot_general(
            p.astype(mm), v_ref[hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[hi] = m_cur

    @pl.when(ik == nk - 1)
    def _():
        for hi in range(g):
            l_safe = jnp.maximum(l_scr[hi], 1e-30)
            o_ref[hi] = (acc_scr[hi] / l_safe).astype(o_ref.dtype)
            lse_ref[hi] = m_scr[hi] + jnp.log(l_safe)


def _fwd_streamed(q, k, v, gate, bias_rel, mask_add, *, block_q: int,
                  block_k: int, interpret: bool):
    b, h, t, d = q.shape
    assert block_q == block_k, "streamed path requires BQ == BK"
    nq, nk = t // block_q, t // block_k
    win = _qk_windows(bias_rel, t, block_q, block_k)
    g = _head_group_streamed(h)
    grid = (b, h // g, nq, nk)
    qb = lambda b_, g_, i, j: (b_, g_, i, 0)  # noqa: E731
    kb = lambda b_, g_, i, j: (b_, g_, j, 0)  # noqa: E731
    out, lse = pl.pallas_call(
        functools.partial(_fwd_streamed_kernel, scale=1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, None, None, 1, block_q + block_k),
                         lambda b_, g_, i, j: (g_, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k),
                         lambda b_, g_, i, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, block_q, 1), jnp.float32),
            pltpu.VMEM((g, block_q, 1), jnp.float32),
            pltpu.VMEM((g, block_q, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_STREAMED_COMPILER_PARAMS,
    )(q, k, v, gate, win, mask_add)
    return out, lse


def _bwd_dq_streamed_kernel(q_ref, k_ref, gate_ref, win_ref, madd_ref,
                            do_ref, v_ref, lse_ref, delta_ref,
                            dq_ref, dgate_ref, dwin_ref, dwin_scr, *,
                            scale: float):
    # grid (head-groups, q-blocks, batch, k-blocks) — innermost k keeps
    # the dq/dgate out-block index constant (accumulate in place, one
    # writeback).  dwin accumulates in a [g, NK, W] VMEM scratch across
    # the whole (batch, k) sweep of each (head-group, q-block) — output
    # blocks may only be revisited on CONSECUTIVE grid steps, and the
    # per-ik dwin rows interleave across batch.  The per-step row update
    # is a one-hot select (no dynamic ref indexing), flushed to the
    # output block once at the sweep's final step.
    ib = pl.program_id(2)
    ik = pl.program_id(3)
    nb = pl.num_programs(2)
    nk = pl.num_programs(3)
    g, bq, d = q_ref.shape
    bk = k_ref.shape[1]

    @pl.when(ik == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
        dgate_ref[:] = jnp.zeros_like(dgate_ref)

    @pl.when(jnp.logical_and(ib == 0, ik == 0))
    def _():
        dwin_scr[:] = jnp.zeros_like(dwin_scr)

    mm = q_ref.dtype
    madd = madd_ref[:].astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nk, bq + bk), 0)
    for hi in range(g):
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)
        lse = lse_ref[hi].astype(jnp.float32)
        delta = delta_ref[hi].astype(jnp.float32)
        do = do_ref[hi]
        k = k_ref[hi]
        bias = _shear_rows(win_ref[hi], bq)[:, :bk].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s += gate * bias + madd
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_ref[hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_ref[hi] += jax.lax.dot_general(
            ds.astype(mm), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dgate_ref[hi] += jnp.sum(ds * bias, axis=1, keepdims=True)
        dvec = _shear_rows_adjoint(gate * ds, bq + bk)  # [1, W]
        dwin_scr[hi] += jnp.where(row_ids == ik, dvec, 0.0)

    @pl.when(jnp.logical_and(ib == nb - 1, ik == nk - 1))
    def _():
        dwin_ref[:] = dwin_scr[:][:, :, None, :]


def _bwd_dq_streamed(q, k, v, gate, bias_rel, mask_add, do, lse, delta, *,
                     block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    assert block_q == block_k
    nq, nk = t // block_q, t // block_k
    win = _qk_windows(bias_rel, t, block_q, block_k)
    g = _head_group_streamed(h)
    grid = (h // g, nq, b, nk)
    qb = lambda g_, i, b_, j: (b_, g_, i, 0)  # noqa: E731
    kb = lambda g_, i, b_, j: (b_, g_, j, 0)  # noqa: E731
    dq, dgate, dwin = pl.pallas_call(
        functools.partial(_bwd_dq_streamed_kernel, scale=1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, None, None, 1, block_q + block_k),
                         lambda g_, i, b_, j: (g_, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k),
                         lambda g_, i, b_, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            # one [g, NK, 1, W] block per (head-group, q-block): index
            # constant across the (batch, k) sweep, written once at its
            # final step from the scratch accumulator
            pl.BlockSpec((g, None, nk, 1, block_q + block_k),
                         lambda g_, i, b_, j: (g_, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, nq, nk, 1, block_q + block_k),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, nk, block_q + block_k), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_STREAMED_COMPILER_PARAMS,
    )(q, k, gate, win, mask_add, do, v, lse, delta)
    dbrel = _fold_qk_windows(dwin[:, :, :, 0, :], t, block_q)
    return dq, dgate, dbrel


def _bwd_dkv_streamed_kernel(q_ref, k_ref, v_ref, gate_ref, win_ref,
                             madd_ref, do_ref, lse_ref, delta_ref,
                             dk_ref, dv_ref, *, scale: float):
    # grid (batch, head-groups, k-blocks, q-blocks) — innermost q keeps
    # the dk/dv out-block index constant (accumulate in place)
    iq = pl.program_id(3)
    g, bk, d = k_ref.shape
    bq = q_ref.shape[1]

    @pl.when(iq == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    mm = q_ref.dtype
    madd = madd_ref[:].astype(jnp.float32)  # [1, BK]
    for hi in range(g):
        k = k_ref[hi]
        v = v_ref[hi]
        q = q_ref[hi]
        gate = gate_ref[hi].astype(jnp.float32)
        lse = lse_ref[hi].astype(jnp.float32)
        delta = delta_ref[hi].astype(jnp.float32)
        do = do_ref[hi]
        bias = _shear_rows(win_ref[hi], bq)[:, :bk].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s += gate * bias + madd
        p = jnp.exp(s - lse)
        dv_ref[hi] += jax.lax.dot_general(
            p.astype(mm), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk_ref[hi] += jax.lax.dot_general(
            ds.astype(mm), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale


def _bwd_dkv_streamed(q, k, v, gate, bias_rel, mask_add, do, lse, delta, *,
                      block_q: int, block_k: int, interpret: bool):
    b, h, t, d = q.shape
    assert block_q == block_k
    nq, nk = t // block_q, t // block_k
    win = _qk_windows(bias_rel, t, block_q, block_k)
    g = _head_group_streamed(h)
    grid = (b, h // g, nk, nq)
    qb = lambda b_, g_, j, i: (b_, g_, i, 0)  # noqa: E731
    kb = lambda b_, g_, j, i: (b_, g_, j, 0)  # noqa: E731
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_streamed_kernel, scale=1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, None, None, 1, block_q + block_k),
                         lambda b_, g_, j, i: (g_, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k),
                         lambda b_, g_, j, i: (b_, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, d), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_q, 1), qb, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, block_k, d), kb, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_STREAMED_COMPILER_PARAMS,
    )(q, k, v, gate, win, mask_add, do, lse, delta)
    return dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _streamed(t: int) -> bool:
    return t > STREAM_THRESHOLD


# The streamed kernels' unrolled head loop plus the [NK, W] dwin update
# temporaries push Mosaic's scoped-VMEM *stack* past its 16 MB default at
# T≈6k (measured: 16.29 MB at T=6016, g=16) — raise the limit; v5e has
# 128 MB VMEM and the block working set is only ~3 MB.
_STREAMED_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash_core(q, k, v, gate, bias_rel, mask_add, block_q, block_k):
    fwd = _fwd_streamed if _streamed(q.shape[2]) else _fwd
    out, _ = fwd(q, k, v, gate, bias_rel, mask_add,
                 block_q=block_q, block_k=block_k,
                 interpret=_interpret())
    return out


def _flash_core_fwd(q, k, v, gate, bias_rel, mask_add, block_q, block_k):
    fwd = _fwd_streamed if _streamed(q.shape[2]) else _fwd
    out, lse = fwd(q, k, v, gate, bias_rel, mask_add,
                   block_q=block_q, block_k=block_k,
                   interpret=_interpret())
    return out, (q, k, v, gate, bias_rel, mask_add, out, lse)


def _flash_core_bwd(block_q, block_k, res, g):
    q, k, v, gate, bias_rel, mask_add, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [B,H,T,1]
    interp = _interpret()
    streamed = _streamed(q.shape[2])
    bwd_dq = _bwd_dq_streamed if streamed else _bwd_dq
    bwd_dkv = _bwd_dkv_streamed if streamed else _bwd_dkv
    dq, dgate, dbrel = bwd_dq(
        q, k, v, gate, bias_rel, mask_add, g, lse, delta,
        block_q=block_q, block_k=block_k, interpret=interp,
    )
    dk, dv = bwd_dkv(
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
        if t_pad % block_k:
            # every kernel iterates nk = t_pad // block_k — a non-divisor
            # would silently drop trailing keys and leave dk/dv rows
            # unwritten.  t_pad is a block_q multiple by construction.
            block_k = block_q
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

    core = _tp_wrapped_core(b, h, block_q, block_k)
    out = core(q, k, v, gate4, bias_rel, mask_add)
    if pad_t:
        out = out[:, :, :t, :]
    return out


def _tp_wrapped_core(b: int, h: int, block_q: int, block_k: int):
    """The flash core, shard_mapped over the registered TP mesh when one is
    active with ``model`` axis > 1.

    GSPMD does not partition ``pallas_call``: under tensor parallelism the
    kernel must be explicitly mapped over the head dimension (heads are
    independent — q/k/v/gate/bias/outputs all split on H with no collectives
    inside; dbias rows land on the shard owning those heads).  The mesh is
    registered by the training entry via
    ``parallel.mesh.set_flash_tp_mesh`` — the kernel cannot observe the
    surrounding jit's shardings on its own.
    """
    from nrse_tpu.parallel.mesh import get_flash_tp_mesh

    ctx = get_flash_tp_mesh()
    if ctx is None:
        return lambda *args: _flash_core(*args, block_q, block_k)
    mesh, data_ax, model_ax = ctx
    n_model = mesh.shape.get(model_ax, 1)
    n_data = mesh.shape.get(data_ax, 1)
    if n_model <= 1 and n_data <= 1:
        return lambda *args: _flash_core(*args, block_q, block_k)
    if h % n_model:
        raise ValueError(
            f"flash attention under TP: {h} heads not divisible by the "
            f"'{model_ax}' mesh axis ({n_model}) — use a head-divisible "
            f"model axis or disable tpu.flash_attention"
        )
    if b % n_data:
        raise ValueError(
            f"flash attention under TP: batch {b} not divisible by the "
            f"'{data_ax}' mesh axis ({n_data})"
        )
    from jax.sharding import PartitionSpec as P

    bhtd = P(data_ax, model_ax, None, None)
    return jax.shard_map(
        lambda q_, k_, v_, g_, br_, ma_: _flash_core(
            q_, k_, v_, g_, br_, ma_, block_q, block_k
        ),
        mesh=mesh,
        in_specs=(bhtd, bhtd, bhtd, bhtd, P(model_ax, None),
                  P(data_ax, None, None)),
        out_specs=bhtd,
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # the body is collective-free (per-head independent), so the
        # replication checker has nothing to verify anyway
        check_vma=False,
    )
