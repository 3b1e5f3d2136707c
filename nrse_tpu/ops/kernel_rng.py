"""Shared in-kernel hardware-PRNG helpers for Pallas TPU kernels.

Used by the fused-FFN and block-attention kernels to derive dropout
masks from ``pltpu.prng_seed``/``prng_random_bits`` *inside* the kernel:
masks never exist in HBM and are regenerated bit-exactly in the backward
kernels (the forward and backward share these exact helpers, so the
bitstreams match by construction).

The seed is mixed into ONE 32-bit word before ``pltpu.prng_seed``: this
libtpu's Mosaic crashes on the multi-operand ``tpu.prng_set_seed_32``
form (internal compiler error, unresolved SSA operands — found on real
TPU; interpret mode accepts it).  See docs/parity.md kernel notes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

U24 = float(2.0 ** -24)

# murmur3-style avalanche constants: distinct PRNG stream per mixed
# (seed-word, a, b) triple
MIX_A = 0x85EBCA6B
MIX_B = 0xC2B2AE35
GOLDEN = 0x9E3779B1


def mix_seed(word, a, b):
    """One 32-bit stream word from (seed word, index a, index b)."""
    s = word ^ (a.astype(jnp.uint32) * jnp.uint32(MIX_A))
    s = s ^ (b.astype(jnp.uint32) * jnp.uint32(MIX_B))
    return s * jnp.uint32(GOLDEN)


def seed_mixed(word, a, b):
    """``pltpu.prng_seed`` with the mixed single-word form."""
    pltpu.prng_seed(mix_seed(word, a, b))


def keep_mask(shape, p: float):
    """Bernoulli keep mask ``{0, 1/(1-p)}`` from the just-seeded hardware
    PRNG: the standard 24-bit uniform (bits >> 8, exactly representable
    in f32) compared against the drop probability."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    u24 = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) * U24
    return (u24 >= p).astype(jnp.float32) / (1.0 - p)
