"""Scalar math helpers lowerable inside Pallas TPU kernels.

Mosaic's TC kernel type has no lowering for the ``erf`` primitive (found
on real TPU — interpret mode happily evaluates it, another entry for the
docs/parity.md kernel-trap list).  The fused frontend/FFN kernels need
exact-erf GELU (reference semantics: HF WavLM uses ``gelu`` with the erf
form, not the tanh approximation), so they use the Abramowitz & Stegun
7.1.26 rational approximation instead: max absolute error 1.5e-7 on erf
— i.e. ≤ ``0.75e-7·|x|`` absolute on GELU — far below bf16 resolution
and an order of magnitude below the 2e-5 f32 golden-test tolerance,
while building only on primitives Mosaic lowers (mul/add/div/exp/abs/
sign).  Used on every backend so CPU tests exercise the exact numerics
that run on TPU.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)

# Abramowitz & Stegun 7.1.26 coefficients
_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429


def erf(x):
    """A&S 7.1.26 rational approximation (f32 math, |err| ≤ 1.5e-7)."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + _P * a)
    poly = ((((_A5 * t + _A4) * t + _A3) * t + _A2) * t + _A1) * t
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def gelu(z):
    """Exact-erf-form GELU on the approximated erf (f32 accumulator in)."""
    return 0.5 * z * (1.0 + erf(z * _INV_SQRT2))


def gelu_grad(z):
    """GELU'(z) = Φ(z) + z·φ(z) on the approximated erf."""
    phi_big = 0.5 * (1.0 + erf(z * _INV_SQRT2))
    phi_small = jnp.exp(-0.5 * z * z) * _INV_SQRT2PI
    return phi_big + z * phi_small
