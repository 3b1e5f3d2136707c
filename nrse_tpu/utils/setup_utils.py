"""Deterministic seeding.

Parity with reference ``src/utils/setup_utils.py:4`` (torch/cuda/numpy seeds).
In JAX randomness is explicit, so ``set_seed`` seeds the host-side generators
(numpy + python ``random``, used by the data pipeline) and returns a root
``jax.random`` key for device-side randomness (dropout, spec-augment).
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42, rng_impl=None):
    """Seed host RNGs and return a root JAX PRNG key.

    ``rng_impl`` (config ``tpu.rng_impl``): 'threefry2x32' | 'rbg' |
    'unsafe_rbg'.  'rbg' generates dropout bits with the TPU hardware RNG —
    profiling showed threefry mask generation fused into the FFN matmuls
    costing ~half their runtime (docs/round2_status.md).  Must be applied
    before the root key is created, hence it lives here.
    """
    random.seed(seed)
    np.random.seed(seed)
    import os

    import jax

    if rng_impl and rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", rng_impl)
    # persistent XLA compile cache: TPU compiles go through a tunnel here
    # and cost minutes — cache them per backend like bench.py does
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("NRSE_COMPILE_CACHE", "/tmp/nrse_jax_cache"),
        )
    return jax.random.PRNGKey(seed)
