"""One-block Pallas attention for short sequences (dense gated bias).

The streaming flash kernel (``ops/flash_attention.py``) exists for long
audio, where the ``[B,H,T,T]`` tensors cannot live in HBM.  At the
flagship 5 s workload (T≈249) it *loses* to XLA attention — the round-3
measurement (366 vs 459, docs/round3_status.md §7) pinned the gap on
machinery that only pays off when K/V must stream: the on-chip Toeplitz
shear (log2(BQ) VPU roll passes per block) and the streaming-softmax
rescale.  This module is the small-T design those measurements asked
for, with both costs removed:

  * **Dense bias input, no shear.**  At small T the model already
    materialises the position bias ``[H, T, T]`` once per step for the
    XLA path (f32, ~4 MB at T=249 — it is batch-shared, NOT the
    [B,H,T,T] problem tensor).  The kernel streams bias blocks straight
    from HBM; its gradient is accumulated in a revisited f32 output
    block across the batch grid axis, so ``dbias`` is exact and the
    bucket scatter-add stays outside in XLA, identical to the XLA path
    (``ops/rel_pos_bias.py``).
  * **Whole-row softmax.**  One (batch, head-group) grid step holds a
    few heads' full q/k/v plus their [T, T] bias in VMEM (T≤384, g=4 →
    ≤12 MB), so the softmax is a plain max/exp/sum — no running max, no
    accumulator rescale.  Heads are split between the grid and a small
    in-kernel loop (``NRSE_BLOCK_HEAD_GROUP``, default 4): one head is
    only ~17 MFLOP at T=256 (sync-bound as its own grid step), while a
    full 16-head unroll built a Mosaic program the remote compiler never
    returned on.
  * Everything the XLA path round-trips through HBM per layer — four
    f32 ``[36,16,249,249]`` passes in the round-3 profile, ~20% of the
    389 ms step — stays in VMEM registers here.  Only ``out`` and the
    per-row ``lse`` are written; the backward recomputes scores and
    probabilities from the saved q/k/v/gate/bias.

Numerics match ``ops.attention.gated_bias_attention``: scores/softmax
f32, matmuls at the input precision with f32 accumulation, key padding
as an additive 0/−1e9 row (fully-masked rows stay finite).  Padded
*query* rows produce garbage that never escapes: their ``do`` cotangent
is structurally zero (the pad's transpose is a slice), which zeroes
``ds``/``dp`` rows, so dk/dv/dbias contractions over the q axis are
unpolluted; padded o/dq rows are sliced away by the wrapper.

Mosaic constraints honoured (docs/parity.md kernel notes): all slice
offsets static (heads unrolled), per-row vectors carry a trailing unit
dim, single-word PRNG n/a (no RNG in these kernels).

Reference behaviour covered: HF ``WavLMAttention``'s gated relative
position bias (the reference imports it via
``/root/reference/src/models/encoder.py:14``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrse_tpu.ops import kernel_rng

NEG_INF = -1e9
LANE = 128
# selection ceiling for this kernel (wavlm frames: 384 ≈ 7.7 s audio);
# beyond it the streaming flash kernels take over
MAX_T_PAD = 384
_VMEM_LIMIT = 64 * 1024 * 1024
# heads per grid step: one step's MXU work is only ~17 MFLOP per head at
# T=256, so a single-head grid pays a sync per ~1 µs of compute; a small
# Python loop amortises it while keeping the Mosaic program ~g× (a full
# 16-head unroll was never accepted by the remote compiler).  Sweepable
# via NRSE_BLOCK_HEAD_GROUP; must divide the head count.
_HEAD_GROUP = 4


def _head_group(h: int) -> int:
    import os

    g = int(os.environ.get("NRSE_BLOCK_HEAD_GROUP", _HEAD_GROUP))
    while h % g:
        g -= 1
    return max(g, 1)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret(needs_rng: bool = False):
    if jax.default_backend() != "cpu":
        return False
    if not needs_rng:
        return True
    # plain interpret mode has no lowering for the TPU PRNG primitives;
    # the TPU interpreter accepts them (stubbed to zero bits — which is
    # why CPU dropout coverage uses the masked variant)
    return pltpu.InterpretParams()


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, scale: float, g: int, p_drop: float, masked: bool):
    # One (batch, head-group) grid step; refs carry g heads:
    # q/k/v/o: [g, T, D]; gate/lse: [g, T, 1]; bias: [g, T, T];
    # madd: [1, T]; dmask (masked variant): [g, T, D].  g is a small
    # Python loop (one head is ~17 MFLOP at T=256 — sync-bound; a full
    # 16-head unroll was never accepted by the remote compiler).
    #
    # Output dropout (p_drop > 0) applies HF-deviation per-head-output
    # dropout (wavlm.py GatedAttention) INSIDE the kernel: the keep mask
    # comes from the hardware PRNG seeded per (batch, head) and is
    # regenerated bit-exactly in the backward kernel — it never exists in
    # HBM (same design as ops/fused_ffn.py).  The saved ``out`` residual
    # is POST-dropout, which is exactly what the flash delta trick needs:
    # rowsum(do ⊙ out) = rowsum((do·m) ⊙ o_attn) since the mask enters
    # the product once either way.
    if masked:
        q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref, dm_ref = refs[:7]
        o_ref, lse_ref = refs[7:]
        seed_ref = None
    elif p_drop > 0.0:
        seed_ref, q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref = refs[:7]
        o_ref, lse_ref = refs[7:]
        dm_ref = None
    else:
        q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref = refs[:6]
        o_ref, lse_ref = refs[6:]
        seed_ref = dm_ref = None
    ib, ihg = pl.program_id(0), pl.program_id(1)
    mm = q_ref.dtype
    madd = madd_ref[...].astype(jnp.float32)
    for hi in range(g):
        s = jax.lax.dot_general(
            q_ref[hi], k_ref[hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                             # [T, T]
        s += gate_ref[hi].astype(jnp.float32) * bias_ref[hi].astype(
            jnp.float32)
        s += madd
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l_safe = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        acc = jax.lax.dot_general(
            p.astype(mm), v_ref[hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = acc / l_safe
        if masked:
            o = o * dm_ref[hi].astype(jnp.float32)
        elif p_drop > 0.0:
            kernel_rng.seed_mixed(seed_ref[0] ^ seed_ref[1], ib, ihg * g + hi)
            o = o * kernel_rng.keep_mask(o.shape, p_drop)
        o_ref[hi] = o.astype(o_ref.dtype)
        lse_ref[hi] = m + jnp.log(l_safe)


def _bwd_kernel(*refs, scale: float, g: int, p_drop: float, masked: bool):
    # grid (H-groups, B) with batch INNERMOST: the dbias block (indexed
    # by the head group only) is revisited consecutively and accumulated
    # in f32.  With dropout, the incoming ``do`` is the cotangent of the
    # POST-dropout output — the kernel regenerates the keep mask
    # (bit-exactly, same seeding as forward) and folds it into ``do``
    # before any contraction.
    if masked:
        (q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref, dm_ref,
         do_ref, lse_ref, delta_ref) = refs[:10]
        out_refs = refs[10:]
        seed_ref = None
    elif p_drop > 0.0:
        (seed_ref, q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref,
         do_ref, lse_ref, delta_ref) = refs[:10]
        out_refs = refs[10:]
        dm_ref = None
    else:
        (q_ref, k_ref, v_ref, gate_ref, bias_ref, madd_ref,
         do_ref, lse_ref, delta_ref) = refs[:9]
        out_refs = refs[9:]
        seed_ref = dm_ref = None
    dq_ref, dk_ref, dv_ref, dgate_ref, dbias_ref = out_refs
    mm = q_ref.dtype
    ihg, ib = pl.program_id(0), pl.program_id(1)

    @pl.when(ib == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    madd = madd_ref[...].astype(jnp.float32)
    for hi in range(g):
        gate = gate_ref[hi].astype(jnp.float32)               # [T, 1]
        bias = bias_ref[hi].astype(jnp.float32)               # [T, T]
        s = jax.lax.dot_general(
            q_ref[hi], k_ref[hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s += gate * bias + madd
        p = jnp.exp(s - lse_ref[hi])                          # [T, T] f32
        do = do_ref[hi]
        if masked:
            do = (do.astype(jnp.float32)
                  * dm_ref[hi].astype(jnp.float32)).astype(mm)
        elif p_drop > 0.0:
            kernel_rng.seed_mixed(seed_ref[0] ^ seed_ref[1], ib, ihg * g + hi)
            do = (do.astype(jnp.float32)
                  * kernel_rng.keep_mask(do.shape, p_drop)).astype(mm)
        dp = jax.lax.dot_general(                             # do · vᵀ
            do, v_ref[hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[hi])                         # [T, T] f32
        pb = p.astype(mm)
        dsb = ds.astype(mm)
        dv_ref[hi] = jax.lax.dot_general(                     # pᵀ · do
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dq_ref[hi] = (jax.lax.dot_general(                    # ds · k
            dsb, k_ref[hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[hi] = (jax.lax.dot_general(                    # dsᵀ · q
            dsb, q_ref[hi], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)
        dgate_ref[hi] = jnp.sum(ds * bias, axis=1, keepdims=True)
        dbias_ref[hi] += gate * ds


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _fwd_call(q, k, v, gate4, bias, mask_add, seed=None, dmask=None,
              p_drop: float = 0.0):
    b, h, t, d = q.shape
    g = _head_group(h)
    masked = dmask is not None
    vm = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    bh_td = lambda b_, h_: (b_, h_, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((None, g, t, d), bh_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, d), bh_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, d), bh_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, 1), bh_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((g, t, t), lambda b_, h_: (h_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, t), lambda b_, h_: (b_, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, gate4, bias, mask_add]
    if masked:
        in_specs.append(
            pl.BlockSpec((None, g, t, d), bh_td, memory_space=pltpu.VMEM))
        args.append(dmask)
    elif p_drop > 0.0:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, seed)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=1.0 / (d ** 0.5), g=g,
                          p_drop=p_drop, masked=masked),
        grid=(b, h // g),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((None, g, t, d), bh_td, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, 1), bh_td, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
        ],
        compiler_params=vm,
        interpret=_interpret(p_drop > 0.0),
    )(*args)
    return out, lse


def _bwd_call(q, k, v, gate4, bias, mask_add, do, lse, delta,
              seed=None, dmask=None, p_drop: float = 0.0):
    b, h, t, d = q.shape
    g = _head_group(h)
    masked = dmask is not None
    vm = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    # grid (H-groups, B), batch innermost: the per-group dbias output
    # block is revisited on consecutive steps and accumulated in-kernel.
    hb_td = lambda h_, b_: (b_, h_, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, 1), hb_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((g, t, t), lambda h_, b_: (h_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, t), lambda h_, b_: (b_, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, gate4, bias, mask_add]
    if masked:
        in_specs.append(
            pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM))
        args.append(dmask)
    elif p_drop > 0.0:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, seed)
    in_specs += [
        pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, 1), hb_td, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, g, t, 1), hb_td, memory_space=pltpu.VMEM),
    ]
    args += [do, lse, delta]
    dq, dk, dv, dgate, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=1.0 / (d ** 0.5), g=g,
                          p_drop=p_drop, masked=masked),
        grid=(h // g, b),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, d), hb_td, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g, t, 1), hb_td, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, t), lambda h_, b_: (h_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, t, t), jnp.float32),
        ],
        compiler_params=vm,
        interpret=_interpret(p_drop > 0.0),
    )(*args)
    return dq, dk, dv, dgate, dbias


@jax.custom_vjp
def _block_core(q, k, v, gate4, bias, mask_add):
    out, _ = _fwd_call(q, k, v, gate4, bias, mask_add)
    return out


def _block_core_fwd(q, k, v, gate4, bias, mask_add):
    out, lse = _fwd_call(q, k, v, gate4, bias, mask_add)
    return out, (q, k, v, gate4, bias, mask_add, out, lse)


def _block_core_bwd(res, do):
    q, k, v, gate4, bias, mask_add, out, lse = res
    # flash trick: rowsum(dp ⊙ p) == rowsum(do ⊙ o) — a tiny XLA reduce
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dq, dk, dv, dgate, dbias = _bwd_call(
        q, k, v, gate4, bias, mask_add, do, lse, delta)
    return (dq, dk, dv, dgate.astype(gate4.dtype),
            dbias.astype(bias.dtype), jnp.zeros_like(mask_add))


_block_core.defvjp(_block_core_fwd, _block_core_bwd)


# --- in-kernel output-dropout variant (hardware PRNG, TPU path) ----------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _block_core_drop(q, k, v, gate4, bias, mask_add, seed, p_drop):
    out, _ = _fwd_call(q, k, v, gate4, bias, mask_add, seed=seed,
                       p_drop=p_drop)
    return out


def _block_core_drop_fwd(q, k, v, gate4, bias, mask_add, seed, p_drop):
    out, lse = _fwd_call(q, k, v, gate4, bias, mask_add, seed=seed,
                         p_drop=p_drop)
    return out, (q, k, v, gate4, bias, mask_add, seed, out, lse)


def _block_core_drop_bwd(p_drop, res, do):
    q, k, v, gate4, bias, mask_add, seed, out, lse = res
    # out is POST-dropout, so rowsum(do ⊙ out) = rowsum((do·m) ⊙ o_attn):
    # the delta trick holds with the mask folded in exactly once
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dq, dk, dv, dgate, dbias = _bwd_call(
        q, k, v, gate4, bias, mask_add, do, lse, delta, seed=seed,
        p_drop=p_drop)
    return (dq, dk, dv, dgate.astype(gate4.dtype),
            dbias.astype(bias.dtype), jnp.zeros_like(mask_add),
            np.zeros(seed.shape, jax.dtypes.float0))


_block_core_drop.defvjp(_block_core_drop_fwd, _block_core_drop_bwd)


# --- externally-supplied-mask variant (CPU test path: interpret mode
# stubs the hardware PRNG to zero bits) ------------------------------------

@jax.custom_vjp
def _block_core_masked(q, k, v, gate4, bias, mask_add, dmask):
    out, _ = _fwd_call(q, k, v, gate4, bias, mask_add, dmask=dmask)
    return out


def _block_core_masked_fwd(q, k, v, gate4, bias, mask_add, dmask):
    out, lse = _fwd_call(q, k, v, gate4, bias, mask_add, dmask=dmask)
    return out, (q, k, v, gate4, bias, mask_add, dmask, out, lse)


def _block_core_masked_bwd(res, do):
    q, k, v, gate4, bias, mask_add, dmask, out, lse = res
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dq, dk, dv, dgate, dbias = _bwd_call(
        q, k, v, gate4, bias, mask_add, do, lse, delta, dmask=dmask)
    # the mask is a non-differentiable switching constant
    return (dq, dk, dv, dgate.astype(gate4.dtype),
            dbias.astype(bias.dtype), jnp.zeros_like(mask_add),
            jnp.zeros_like(dmask))


_block_core_masked.defvjp(_block_core_masked_fwd, _block_core_masked_bwd)


def dump_block_masks(seed, b, h, t, d, p_drop):
    """Returns the ``[B, H, T, D]`` f32 ``{0, 1/(1-p)}`` keep masks the
    dropout kernels derive for these shapes — bit-identical seeding/
    generation order (per (batch, head): one seed, one [T, D] draw).
    Drives the on-TPU parity check of the RNG path (bench CHECK_ONLY)."""
    g = _head_group(h)

    def kernel(seed_ref, m_ref):
        ib, ihg = pl.program_id(0), pl.program_id(1)
        for hi in range(g):
            kernel_rng.seed_mixed(seed_ref[0] ^ seed_ref[1], ib, ihg * g + hi)
            m_ref[hi] = kernel_rng.keep_mask((t, d), p_drop)

    return pl.pallas_call(
        kernel,
        grid=(b, h // g),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((None, g, t, d), lambda b_, h_: (b_, h_, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, h, t, d), jnp.float32)],
        interpret=_interpret(True),
    )(seed)[0]


def _tp_wrapped(b: int, h: int):
    """shard_map over the registered TP mesh (pallas_call is not GSPMD-
    partitioned) — heads are independent, the dense bias and its gradient
    split on H with the owning shard."""
    from nrse_tpu.parallel.mesh import get_flash_tp_mesh

    ctx = get_flash_tp_mesh()
    if ctx is None:
        return _block_core
    mesh, data_ax, model_ax = ctx
    n_model = mesh.shape.get(model_ax, 1)
    n_data = mesh.shape.get(data_ax, 1)
    if n_model <= 1 and n_data <= 1:
        return _block_core
    if h % n_model:
        raise ValueError(
            f"block attention under TP: {h} heads not divisible by the "
            f"'{model_ax}' mesh axis ({n_model})"
        )
    if b % n_data:
        raise ValueError(
            f"block attention under TP: batch {b} not divisible by the "
            f"'{data_ax}' mesh axis ({n_data})"
        )
    from jax.sharding import PartitionSpec as P

    bhtd = P(data_ax, model_ax, None, None)
    return jax.shard_map(
        _block_core,
        mesh=mesh,
        in_specs=(bhtd, bhtd, bhtd, bhtd, P(model_ax, None, None),
                  P(data_ax, None, None)),
        out_specs=bhtd,
        check_vma=False,
    )


def block_gated_attention(q, k, v, gate, pos_bias,
                          key_padding_mask: Optional[jnp.ndarray] = None,
                          *, p_drop: float = 0.0,
                          dropout_seed: Optional[jnp.ndarray] = None,
                          dropout_mask: Optional[jnp.ndarray] = None):
    """Drop-in replacement for ``ops.attention.gated_bias_attention`` at
    short T, consuming the same *dense* ``[H, T, T]`` position bias.

    Args:
      q, k, v: ``[B, H, T, D]``; gate: ``[B, H, T]``;
      pos_bias: dense ``[H, T, T]`` (``rel_pos_bias.compute_position_bias``);
      key_padding_mask: optional ``[B, T]`` (1 = valid).
      p_drop / dropout_seed: in-kernel per-head-output dropout — keep
        masks come from the hardware PRNG (seed ``[2]`` uint32), never
        exist in HBM, and are regenerated bit-exactly in backward.  TPU
        only (interpret mode stubs the PRNG to zero bits).
      dropout_mask: externally-supplied ``[B, H, T, D]`` ``{0, 1/(1-p)}``
        keep mask — the CPU-testable variant of the same kernels.
    Returns ``[B, H, T, D]`` in v's dtype.
    """
    b, h, t, d = q.shape
    assert pos_bias.shape == (h, t, t), (
        f"pos_bias must be dense [H,T,T]=({h},{t},{t}), got {pos_bias.shape}"
    )
    t_pad = _ceil_to(t, LANE)
    pad_t = t_pad - t

    valid = (jnp.ones((b, t), bool) if key_padding_mask is None
             else key_padding_mask.astype(bool))
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        gate = jnp.pad(gate, ((0, 0), (0, 0), (0, pad_t)))
        pos_bias = jnp.pad(pos_bias, ((0, 0), (0, pad_t), (0, pad_t)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_t)))
        if dropout_mask is not None:
            dropout_mask = jnp.pad(
                dropout_mask, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    gate4 = gate[..., None]                                   # [B,H,Tp,1]
    mask_add = jnp.where(valid, 0.0, NEG_INF).astype(
        jnp.float32)[:, None, :]                              # [B,1,Tp]
    bias_f32 = pos_bias.astype(jnp.float32)

    if dropout_mask is not None:
        out = _block_core_masked(q, k, v, gate4, bias_f32, mask_add,
                                 dropout_mask)
    elif p_drop > 0.0:
        if dropout_seed is None:
            raise ValueError("p_drop > 0 requires dropout_seed")
        from nrse_tpu.parallel.mesh import tp_model_parallel

        if tp_model_parallel():
            raise ValueError(
                "block attention in-kernel dropout under model parallelism "
                "is unsupported (per-shard PRNG streams would collide) — "
                "use the XLA output dropout (attn_dropout_impl='xla')"
            )
        from nrse_tpu.ops.fused_dropout import _dp_ctx

        ctx = _dp_ctx(b)
        if ctx is None:
            out = _block_core_drop(q, k, v, gate4, bias_f32, mask_add,
                                   dropout_seed, p_drop)
        else:
            # pure-DP mesh: shard_map over batch (pallas_call is opaque
            # to GSPMD); per-shard seed mixing keeps masks iid across
            # shards — same pattern as ops/fused_dropout.py
            from jax.sharding import PartitionSpec as P

            from nrse_tpu.ops import kernel_rng

            dpmesh, data_ax = ctx
            bspec = P(data_ax, None, None, None)

            def _drop_body(q_, k_, v_, g_, bias_, m_, seed_):
                idx = jax.lax.axis_index(data_ax).astype(jnp.uint32)
                seed_ = seed_ ^ (jnp.uint32(kernel_rng.MIX_A) * (idx + 1))
                return _block_core_drop(q_, k_, v_, g_, bias_, m_,
                                        seed_, p_drop)

            out = jax.shard_map(
                _drop_body, mesh=dpmesh,
                in_specs=(bspec, bspec, bspec, bspec, P(None, None, None),
                          P(data_ax, None, None), P(None)),
                out_specs=bspec, check_vma=False,
            )(q, k, v, gate4, bias_f32, mask_add, dropout_seed)
    else:
        out = _tp_wrapped(b, h)(q, k, v, gate4, bias_f32, mask_add)
    if pad_t:
        out = out[:, :, :t, :]
    return out
