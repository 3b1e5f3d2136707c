"""Standalone hardware-PRNG dropout Pallas op (fwd + bwd, zero residuals).

The two remaining per-layer XLA dropout sites (the attention-output
dropout and the post-attention hidden dropout — the FFN's two sites
already live inside the fused-FFN kernel, ``ops/fused_ffn.py``) cost
~7.6 ms/step of ``rbg`` bit generation + mask apply in the 486 step
profile (docs/round3_status.md §10), and their masks are stored as
backward residuals.  This op removes both costs:

  * Forward: one pass over the ``[N, C]``-flattened activation; the
    keep mask comes from the TPU hardware PRNG *inside* the kernel
    (``ops/kernel_rng.py`` — same murmur-mixed single-word seeding and
    24-bit-uniform keep rule as the fused-FFN / block-attention
    kernels), so no mask tensor or random bits ever exist in HBM.
  * Backward: ``dx = dy · mask`` with the mask regenerated bit-exactly
    from the same (seed, row-block) stream — the custom VJP saves ONLY
    the seed scalar pair.  XLA's dropout keeps a ``[N, C]`` mask
    residual; this keeps 8 bytes.
  * Semantics: unchanged Bernoulli dropout (keep iff u24 ≥ p, scaled by
    1/(1−p) in f32 before the cast back to the input dtype) — the same
    distribution-preserving ``rbg``-vs-``threefry`` precedent as the
    fused FFN (reference site: ``nn.Dropout`` in HF WavLM layers, the
    stack the reference imports via ``src/models/encoder.py:14``).

Two public variants share the kernels, mirroring ``fused_ffn``:
:func:`hw_dropout` (in-kernel hardware RNG — the TPU training path) and
:func:`hw_dropout_masked` (externally-supplied ``{0, 1/(1-p)}`` mask —
interpret mode stubs ``prng_random_bits`` to zeros on CPU, so the masked
variant carries the CPU test coverage and the on-TPU bench check drives
the RNG variant against :func:`dump_dropout_mask`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrse_tpu.ops import kernel_rng

ROW_BLOCK = 512


def _interpret(needs_rng: bool = False):
    if jax.default_backend() != "cpu":
        return False
    if not needs_rng:
        return True
    return pltpu.InterpretParams()


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _seed(seed_ref, i):
    pltpu.prng_seed(kernel_rng.mix_seed(seed_ref[0], seed_ref[1], i))


def _blk(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _kernel(*refs, p: float, masked: bool):
    if masked:
        x_ref, m_ref, o_ref = refs
        mask = m_ref[:].astype(jnp.float32)
    else:
        seed_ref, x_ref, o_ref = refs
        _seed(seed_ref, pl.program_id(0))
        mask = kernel_rng.keep_mask(x_ref.shape, p)
    o_ref[:] = (x_ref[:].astype(jnp.float32) * mask).astype(o_ref.dtype)


def _call(x, seed, mask, *, p):
    n, c = x.shape
    bt = min(ROW_BLOCK, n)
    ni = n // bt
    masked = mask is not None
    in_specs = [_blk((bt, c), lambda i: (i, 0))]
    args = [x]
    if masked:
        in_specs.append(_blk((bt, c), lambda i: (i, 0)))
        args.append(mask)
    else:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, seed)
    return pl.pallas_call(
        functools.partial(_kernel, p=p, masked=masked),
        grid=(ni,),
        in_specs=in_specs,
        out_specs=_blk((bt, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=_interpret(not masked),
    )(*args)


def _flatten(x):
    rows = x.reshape(-1, x.shape[-1])
    n = rows.shape[0]
    n_pad = _cdiv(n, 8) * 8
    # row blocks must divide the grid: pad to the largest ≤ROW_BLOCK
    # divisor-friendly size (pad rows draw PRNG bits too — harmless)
    bt = min(ROW_BLOCK, n_pad)
    n_pad = _cdiv(n_pad, bt) * bt
    if n_pad != n:
        rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
    return rows, n


def hw_dropout(x, seed, p: float):
    """Bernoulli dropout of ``x`` (any shape, last dim a multiple of 128)
    with in-kernel hardware-PRNG masks; ``seed`` is ``[2]`` uint32 (a
    stream-id pair — derive it per site/step from a JAX key via
    ``jax.random.bits(key, (2,), jnp.uint32)``), ``p`` the static drop
    probability.  The backward pass regenerates the mask bit-exactly; no
    residual tensors are saved.

    Under a registered pure-DP mesh (``parallel.mesh.set_flash_tp_mesh``
    with ``model == 1 < data``) the kernel is shard_mapped over the
    leading (batch) axis — GSPMD does not partition ``pallas_call``, so
    the bare call would be replicated-and-gathered on a pod.  Each data
    shard mixes ``axis_index`` into its seed so masks stay iid across
    shards (the single-device bitstream is NOT reproduced — the rbg
    precedent: same distribution, topology-dependent stream)."""
    ctx = _dp_ctx(x.shape[0])
    if ctx is None:
        return _hw_dropout_p(x, seed, p)
    mesh, data_ax = ctx
    from jax.sharding import PartitionSpec as P

    xspec = P(*((data_ax,) + (None,) * (x.ndim - 1)))

    def body(x_, seed_):
        idx = jax.lax.axis_index(data_ax).astype(jnp.uint32)
        seed_ = seed_ ^ (jnp.uint32(kernel_rng.MIX_A) * (idx + 1))
        return _hw_dropout_p(x_, seed_, p)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(xspec, P(None)), out_specs=xspec,
        check_vma=False,
    )(x, seed)


def _dp_ctx(leading: int):
    """(mesh, data_axis) when a pure-DP mesh is registered and divides the
    leading batch dim; None otherwise (single device, TP — where callers
    already take their XLA fallbacks — or indivisible batch)."""
    from nrse_tpu.parallel.mesh import get_flash_tp_mesh

    ctx = get_flash_tp_mesh()
    if ctx is None:
        return None
    mesh, data_ax, model_ax = ctx
    if mesh.shape.get(model_ax, 1) > 1:
        return None
    n_data = mesh.shape.get(data_ax, 1)
    if n_data <= 1 or leading % n_data:
        return None
    return mesh, data_ax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hw_dropout_p(x, seed, p: float):
    rows, n = _flatten(x)
    out = _call(rows, seed, None, p=p)
    return out[:n].reshape(x.shape)


def _hw_dropout_fwd(x, seed, p):
    return _hw_dropout_p(x, seed, p), (seed, x.shape)


def _hw_dropout_bwd(p, res, g):
    seed, shape = res
    rows, n = _flatten(g)
    dx = _call(rows, seed, None, p=p)
    return (dx[:n].reshape(shape),
            np.zeros(seed.shape, jax.dtypes.float0))


_hw_dropout_p.defvjp(_hw_dropout_fwd, _hw_dropout_bwd)


@jax.custom_vjp
def hw_dropout_masked(x, mask):
    """Same kernel with an externally-supplied ``{0, 1/(1-p)}`` mask of
    ``x``'s shape — the CPU-testable path (interpret mode stubs the
    hardware PRNG)."""
    rows, n = _flatten(x)
    mrows, _ = _flatten(mask)
    out = _call(rows, None, mrows, p=0.0)
    return out[:n].reshape(x.shape)


def _hw_dropout_masked_fwd(x, mask):
    return hw_dropout_masked(x, mask), (mask, x.shape)


def _hw_dropout_masked_bwd(res, g):
    mask, shape = res
    rows, n = _flatten(g)
    mrows, _ = _flatten(mask)
    dx = _call(rows, None, mrows, p=0.0)
    return dx[:n].reshape(shape), jnp.zeros(mask.shape, mask.dtype)


hw_dropout_masked.defvjp(_hw_dropout_masked_fwd, _hw_dropout_masked_bwd)


def dump_dropout_mask(seed, shape, p: float):
    """The exact ``{0, 1/(1-p)}`` f32 mask :func:`hw_dropout` derives for
    this (seed, shape, p) — drives the on-TPU parity check of the RNG
    path (bench ``NRSE_BENCH_CHECK_ONLY``)."""
    n = int(np.prod(shape[:-1]))
    c = shape[-1]
    n_pad = _cdiv(max(n, 8), 8) * 8
    bt = min(ROW_BLOCK, n_pad)
    n_pad = _cdiv(n_pad, bt) * bt
    ni = n_pad // bt

    def kernel(seed_ref, m_ref):
        _seed(seed_ref, pl.program_id(0))
        m_ref[:] = kernel_rng.keep_mask((bt, c), p)

    m = pl.pallas_call(
        kernel,
        grid=(ni,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=_blk((bt, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        interpret=_interpret(True),
    )(seed)
    return m[:n].reshape(shape)
