"""Pallas channel LayerNorm (forward + backward) for the conv frontend.

WavLM-large applies a LayerNorm over channels after every conv layer
(HF ``feat_extract_norm="layer"``).  At 5 s × bs 36 those tensors are
``[36, 16000..250, 512]`` and profiling shows XLA's f32 lane-dim reduce
fusions running at ~78 GB/s — ~10% of the train step
(docs/round2_status.md; the thin-matmul rewrite in ``ops/mxu_norm.py``
gets canonicalised back into the same reduce).  This kernel streams
``[R, C]`` row blocks once per pass: bf16 load → f32 stats in registers →
normalised bf16 store, with a custom VJP whose dscale/dbias accumulate in
a revisited ``[1, C]`` output block across grid steps.

Numerics match ``flax.linen.LayerNorm`` (f32 stats, fast-variance
``E[x²] − E[x]²``, ε inside the rsqrt).  Padded tail rows are masked by
zero-padding the cotangent (they contribute nothing to dscale/dbias and
their dx rows are sliced off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, inv_ref, *,
                eps: float):
    x = x_ref[:].astype(jnp.float32)  # [R, C]
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / c
    var = jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True) / c
                      - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv
    o_ref[:] = (y * scale_ref[:].astype(jnp.float32)
                + bias_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    mean_ref[:] = mean
    inv_ref[:] = inv


def _bwd_kernel(x_ref, mean_ref, inv_ref, scale_ref, dy_ref,
                dx_ref, dscale_ref, dbias_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    x = x_ref[:].astype(jnp.float32)
    c = x.shape[-1]
    mean = mean_ref[:]
    inv = inv_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    xhat = (x - mean) * inv
    g = dy * scale_ref[:].astype(jnp.float32)
    g_mean = jnp.sum(g, axis=-1, keepdims=True) / c
    gx_mean = jnp.sum(g * xhat, axis=-1, keepdims=True) / c
    dx_ref[:] = (inv * (g - g_mean - xhat * gx_mean)).astype(dx_ref.dtype)
    dscale_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _pad_rows(x2, rows):
    n = x2.shape[0]
    pad = (-n) % rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_core(x2, scale, bias, eps):
    out, _, _ = _ln_fwd_impl(x2, scale, bias, eps)
    return out


def _ln_fwd_impl(x2, scale, bias, eps):
    # callers pad to a BLOCK_ROWS multiple (pallas_channel_layernorm)
    n, c = x2.shape
    rows = min(BLOCK_ROWS, n)
    grid = (n // rows,)
    out, mean, inv = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x2.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2, scale[None, :], bias[None, :])
    return out, mean, inv


def _ln_core_fwd(x2, scale, bias, eps):
    out, mean, inv = _ln_fwd_impl(x2, scale, bias, eps)
    return out, (x2, mean, inv, scale)


def _ln_core_bwd(eps, res, dy):
    x2, mean, inv, scale = res
    n, c = x2.shape
    rows = min(BLOCK_ROWS, n)
    grid = (n // rows,)
    dx, dscale, dbias = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2, mean, inv, scale[None, :], dy)
    return dx, dscale[0], dbias[0]


_ln_core.defvjp(_ln_core_fwd, _ln_core_bwd)


def pallas_channel_layernorm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the trailing (channel) axis of ``x [..., C]``.

    Returns f32 (like the flax LN the frontend used: stats and affine in
    f32; callers cast to the compute dtype).
    """
    c = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    x2, pad = _pad_rows(x2, BLOCK_ROWS)
    out = _ln_core(x2, scale.astype(jnp.float32),
                   bias.astype(jnp.float32), eps)
    if pad:
        out = out[:n]
    return out.reshape(*lead, c).astype(jnp.float32)


class PallasChannelLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` over channels (same param layout)."""

    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        return pallas_channel_layernorm(x, scale, bias, self.epsilon)
