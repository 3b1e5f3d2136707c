"""Fused conv + channel-LayerNorm + GELU Pallas kernel (fwd + bwd).

The WavLM conv frontend (HF ``feat_extract_norm="layer"``: 7× [Conv1d →
LayerNorm(C) → GELU], ``/root/reference/src/models/encoder.py:14`` imports
it from transformers) costs ~8-10% of the BYOL train step at 5 s × bs 36.
Round-2 profiling (docs/round2_status.md) showed why piecemeal fixes fail:
the f32 channel-LN reduce is HBM-bound in its own fusion (~78 GB/s), a
thin-matmul LN gets canonicalised back to the reduce, and a standalone
Pallas LN *loses* (375.4 vs 454) because the custom-call boundary breaks
XLA's conv→LN→gelu fusion.  The conclusion — "a real win needs the whole
conv+LN+gelu block in one kernel" — is this kernel.

Design (stride-2, kernel-size 2/3, C_in == C_out — layers 1-6 of the
wavlm-large stack; layer 0 (k=10, s=5, 1→512) stays on XLA):

  * A stride-2 conv is tap matmuls on the MXU: the free row-major reshape
    ``[B, T, C] → [B, T/2, 2C]`` makes taps {0,1} ONE ``[2C, C]`` matmul;
    tap 2 is the next pair's first half, fed as a separate (shifted)
    input so every kernel slice is static (Mosaic: no value
    dynamic_slice — see docs/parity.md kernel notes).
  * LN statistics are computed in f32 in registers on the conv
    accumulator — the activation never round-trips HBM between conv, LN
    and GELU.  One bf16 read of the input pairs (+½ for tap 2), one bf16
    write of the output per layer.
  * Custom VJP saves ``x̂`` (bf16) + ``rstd`` (f32 per row) instead of the
    f32 pre-LN activation; the backward kernel fuses GELU' → LN backward →
    conv backward (dX via transposed-tap matmuls; dW/dγ/dβ/db accumulate
    in revisited f32 output blocks across the sequential TPU grid).
  * Cross-block tap-2 scatter (``dy[t+1] += dtap2[t]``) is a single fused
    XLA shift-add outside the kernel.

Numerics match the XLA path: bf16 matmuls with f32 accumulation, flax
fast-variance LN in f32, exact-erf GELU (``tests/test_fused_frontend.py``
asserts fwd+grad parity against the reference composition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrse_tpu.ops.tpu_math import gelu as _gelu
from nrse_tpu.ops.tpu_math import gelu_grad as _gelu_grad

BLOCK_ROWS = 512


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(y_ref, t2_ref, w01_ref, w2_ref, b_ref, g_ref, beta_ref,
                o_ref, xhat_ref, rstd_ref, *, eps: float, has_tap2: bool):
    y = y_ref[0]  # [BT, 2C] bf16
    z = jnp.dot(y, w01_ref[:], preferred_element_type=jnp.float32)
    if has_tap2:
        z += jnp.dot(t2_ref[0], w2_ref[:],
                     preferred_element_type=jnp.float32)
    z += b_ref[:].astype(jnp.float32)  # [1, C] broadcast

    c = z.shape[-1]
    mean = jnp.sum(z, axis=-1, keepdims=True) / c
    var = jnp.maximum(
        jnp.sum(z * z, axis=-1, keepdims=True) / c - mean * mean, 0.0
    )
    inv = jax.lax.rsqrt(var + eps)
    xh = (z - mean) * inv
    ln = xh * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    # erf-form GELU (reference activation; tanh would change numerics) on
    # the A&S erf — Mosaic has no erf lowering (ops/tpu_math.py)
    o = _gelu(ln)
    o_ref[0] = o.astype(o_ref.dtype)
    xhat_ref[0] = xh.astype(xhat_ref.dtype)
    rstd_ref[0] = inv


def _fwd_call(y, t2, w01, w2, bvec, gvec, betavec, *, t_blocks: int,
              eps: float, has_tap2: bool, out_dtype):
    b, _, c2 = y.shape
    c = c2 // 2
    bt = BLOCK_ROWS
    tp = t_blocks * bt
    row_spec = lambda shape_c: pl.BlockSpec(  # noqa: E731
        (1, bt, shape_c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    out, xhat, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, has_tap2=has_tap2),
        grid=(b, t_blocks),
        in_specs=[
            row_spec(c2),
            row_spec(c),
            pl.BlockSpec((c2, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec,
        ],
        out_specs=[
            row_spec(c),
            row_spec(c),
            # [B, T, 1] (not [B, T]): a (1, bt) block on a 2-D array
            # violates Mosaic's 8×128 block-divisibility rule (found on
            # real TPU; interpret mode accepts it) — the trailing
            # singleton makes the last two dims (bt, 1) = (divisible, ==)
            pl.BlockSpec((1, bt, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, c), out_dtype),
            # x̂ residual in the activation dtype: bf16 in training (halves
            # residual HBM), f32 in golden-test mode (exact gradients)
            jax.ShapeDtypeStruct((b, tp, c), y.dtype),
            jax.ShapeDtypeStruct((b, tp, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(y, t2, w01, w2, bvec[None, :], gvec[None, :], betavec[None, :])
    return out, xhat, rstd


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(y_ref, t2_ref, xhat_ref, rstd_ref, w01_ref, w2_ref,
                g_ref, beta_ref, dout_ref,
                dy_ref, dt2_ref, dw01_ref, dw2_ref, db_ref, dg_ref,
                dbeta_ref, *, has_tap2: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dw01_ref[:] = jnp.zeros_like(dw01_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    xh = xhat_ref[0].astype(jnp.float32)                 # [BT, C]
    inv = rstd_ref[0]                                     # [BT, 1]
    gamma = g_ref[:].astype(jnp.float32)                  # [1, C]
    ln = xh * gamma + beta_ref[:].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)

    # GELU'(ln) = Φ(ln) + ln·φ(ln) (A&S erf, ops/tpu_math.py)
    dln = dout * _gelu_grad(ln)

    dg_ref[:] += jnp.sum(dln * xh, axis=0, keepdims=True)
    dbeta_ref[:] += jnp.sum(dln, axis=0, keepdims=True)

    dxh = dln * gamma
    c = dxh.shape[-1]
    m1 = jnp.sum(dxh, axis=-1, keepdims=True) / c
    m2 = jnp.sum(dxh * xh, axis=-1, keepdims=True) / c
    dz = inv * (dxh - m1 - xh * m2)                       # [BT, C] f32
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)

    y = y_ref[0]
    # matmul operand precision follows the activation dtype, exactly like
    # the XLA path (bf16 in training, f32 in golden tests)
    dz_b = dz.astype(y.dtype)
    dw01_ref[:] += jax.lax.dot_general(
        y, dz_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dy_ref[0] = jax.lax.dot_general(
        dz_b, w01_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dy_ref.dtype)
    if has_tap2:
        dw2_ref[:] += jax.lax.dot_general(
            t2_ref[0], dz_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dt2_ref[0] = jax.lax.dot_general(
            dz_b, w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt2_ref.dtype)
    else:
        dt2_ref[0] = jnp.zeros_like(dt2_ref[0])


def _bwd_call(y, t2, xhat, rstd, w01, w2, gvec, betavec, dout, *,
              t_blocks: int, has_tap2: bool):
    b, _, c2 = y.shape
    c = c2 // 2
    bt = BLOCK_ROWS
    tp = t_blocks * bt
    row_spec = lambda shape_c: pl.BlockSpec(  # noqa: E731
        (1, bt, shape_c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda r: pl.BlockSpec((r, c), lambda i, j: (0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    dy, dt2, dw01, dw2, db, dg, dbeta = pl.pallas_call(
        functools.partial(_bwd_kernel, has_tap2=has_tap2),
        grid=(b, t_blocks),
        in_specs=[
            row_spec(c2),
            row_spec(c),
            row_spec(c),
            pl.BlockSpec((1, bt, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            full(c2),
            full(c),
            vec_spec, vec_spec,
            row_spec(c),
        ],
        out_specs=[
            row_spec(c2),
            row_spec(c),
            full(c2),
            full(c),
            vec_spec, vec_spec, vec_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, c2), y.dtype),
            jax.ShapeDtypeStruct((b, tp, c), y.dtype),
            jax.ShapeDtypeStruct((c2, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(y, t2, xhat, rstd, w01, w2, gvec[None, :], betavec[None, :], dout)
    return dy, dt2, dw01, dw2, db[0], dg[0], dbeta[0]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _prepare(x, k: int):
    """[B, T_in, C] → padded pair view + shifted tap-2 view + shape info."""
    b, t_in, c = x.shape
    t_out = (t_in - k) // 2 + 1
    # pair rows the taps reach; at least ceil(T_in/2) so the pad below is
    # never negative (k=2 with odd T_in leaves one unused trailing sample)
    th = max(t_out + (1 if k == 3 else 0), _cdiv(t_in, 2))
    t_blocks = _cdiv(t_out, BLOCK_ROWS)
    rows = max(t_blocks * BLOCK_ROWS, th)  # pair rows incl. block padding
    x = jnp.pad(x, ((0, 0), (0, 2 * rows - t_in), (0, 0)))
    y = x.reshape(b, rows, 2 * c)  # free reshape: row-major pairs
    if k == 3:
        # tap2[t] = x[2t+2] = first half of pair t+1
        t2 = jnp.pad(y[:, 1:, :c], ((0, 0), (0, 1), (0, 0)))
    else:
        t2 = jnp.zeros((b, rows, c), y.dtype)
    return y, t2, t_out, t_blocks, rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_conv_ln_gelu(x, kernel, bias, scale, ln_bias, eps=1e-5):
    """Stride-2 Conv1d (k ∈ {2, 3}, C→C) + channel-LayerNorm + exact GELU.

    Args: x ``[B, T_in, C]``; kernel ``[k, C, C]`` (flax ``nn.Conv``
    layout); bias ``[C]``; scale/ln_bias ``[C]`` (LN affine, f32 math).
    Returns ``[B, T_out, C]`` in x's dtype with ``T_out = (T_in−k)//2+1``.
    """
    out, _ = _fwd(x, kernel, bias, scale, ln_bias, eps)
    return out


def _fwd(x, kernel, bias, scale, ln_bias, eps):
    k, c_in, c = kernel.shape
    assert k in (2, 3) and c_in == c, (k, c_in, c)
    y, t2, t_out, t_blocks, rows = _prepare(x, k)
    w01 = kernel[:2].reshape(2 * c, c).astype(y.dtype)
    w2 = (kernel[2] if k == 3 else jnp.zeros((c, c), kernel.dtype)
          ).astype(y.dtype)
    out, xhat, rstd = _fwd_call(
        y[:, :t_blocks * BLOCK_ROWS], t2[:, :t_blocks * BLOCK_ROWS],
        w01, w2, bias.astype(jnp.float32), scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        t_blocks=t_blocks, eps=eps, has_tap2=(k == 3), out_dtype=x.dtype,
    )
    return out[:, :t_out], (y, t2, xhat, rstd, kernel, scale, ln_bias,
                            t_out, t_blocks, rows, x.shape[1])


def _fused_fwd(x, kernel, bias, scale, ln_bias, eps):
    out, res = _fwd(x, kernel, bias, scale, ln_bias, eps)
    return out, res


def _fused_bwd(eps, res, g):
    (y, t2, xhat, rstd, kernel, scale, ln_bias, t_out, t_blocks, rows,
     t_in) = res
    k, _, c = kernel.shape
    b = y.shape[0]
    tp = t_blocks * BLOCK_ROWS
    w01 = kernel[:2].reshape(2 * c, c).astype(y.dtype)
    w2 = (kernel[2] if k == 3 else jnp.zeros((c, c), kernel.dtype)
          ).astype(y.dtype)
    gpad = jnp.pad(g.astype(y.dtype), ((0, 0), (0, tp - t_out), (0, 0)))
    dy, dt2, dw01, dw2, db, dg, dbeta = _bwd_call(
        y[:, :tp], t2[:, :tp], xhat, rstd, w01, w2,
        scale.astype(jnp.float32), ln_bias.astype(jnp.float32), gpad,
        t_blocks=t_blocks, has_tap2=(k == 3),
    )
    # assemble dX: pair grads + the tap-2 shift (dy[t+1, :C] += dt2[t])
    dy = jnp.pad(dy, ((0, 0), (0, rows - tp), (0, 0))).astype(jnp.float32)
    if k == 3:
        shift = jnp.pad(dt2[:, :t_out], ((0, 0), (1, rows - t_out - 1),
                                         (0, 0))).astype(jnp.float32)
        dy = dy.at[:, :, :c].add(shift)
    dx = dy.reshape(b, 2 * rows, c)[:, :t_in]
    dkernel = jnp.stack(
        [dw01[:c], dw01[c:]] + ([dw2] if k == 3 else []), axis=0
    ).astype(kernel.dtype)
    return dx.astype(y.dtype), dkernel, db.astype(jnp.float32), dg, dbeta


fused_conv_ln_gelu.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# flax param holders — EXACT same tree layout as nn.Conv / nn.LayerNorm so
# checkpoints and the HF converter are untouched
# ---------------------------------------------------------------------------

class ConvParams(nn.Module):
    """Declares ``kernel``/``bias`` with ``nn.Conv``'s names, shapes and
    initialisers (lecun-normal / zeros)."""

    features: int
    kernel_size: int
    in_features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype) \
            if self.use_bias else jnp.zeros((self.features,),
                                            self.param_dtype)
        return kernel, bias


class LNParams(nn.Module):
    """Declares ``scale``/``bias`` with ``nn.LayerNorm``'s layout."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return scale, bias
