"""Accuracy bounds for the Mosaic-lowerable A&S erf/GELU helpers.

``jax.lax.erf`` has no Mosaic TC lowering (found on real TPU; interpret
mode evaluates it happily), so every in-kernel GELU uses the Abramowitz &
Stegun 7.1.26 rational approximation from ``nrse_tpu/ops/tpu_math.py``.
These tests pin the documented error bounds directly (the fused-kernel
golden tests only cover them transitively at 2e-5 tolerance).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nrse_tpu.ops import tpu_math


def _grid():
    # dense near 0 where GELU curvature peaks, plus tails past saturation
    return np.concatenate([
        np.linspace(-6.0, 6.0, 20001),
        np.linspace(-30.0, 30.0, 997),
    ]).astype(np.float32)


def test_erf_abs_error_bound():
    x = _grid()
    from math import erf as _erf
    ref = np.array([_erf(float(v)) for v in x])
    got = np.asarray(jax.jit(tpu_math.erf)(jnp.asarray(x)), np.float64)
    # A&S 7.1.26 documented max abs err 1.5e-7; allow f32 eval headroom
    assert np.abs(got - ref).max() < 5e-7
    # odd symmetry and exact zero
    assert float(tpu_math.erf(jnp.float32(0.0))) == 0.0
    assert np.allclose(got, -np.asarray(
        jax.jit(tpu_math.erf)(jnp.asarray(-x)), np.float64), atol=1e-12)


def test_gelu_matches_jax_exact_gelu():
    x = _grid()
    ref = np.asarray(jax.nn.gelu(jnp.asarray(x, jnp.float64),
                                 approximate=False), np.float64)
    got = np.asarray(jax.jit(tpu_math.gelu)(jnp.asarray(x)), np.float64)
    # |err| <= 0.75e-7 * |x| on GELU per the module docstring
    assert np.abs(got - ref).max() < 1e-6 * max(1.0, np.abs(x).max())


def test_gelu_grad_matches_autodiff():
    x = _grid()[:4096]
    ref = np.asarray(jax.vmap(jax.grad(
        lambda z: jax.nn.gelu(z, approximate=False)))(
            jnp.asarray(x)), np.float64)
    got = np.asarray(jax.jit(tpu_math.gelu_grad)(jnp.asarray(x)), np.float64)
    assert np.abs(got - ref).max() < 2e-6
