"""Deterministic seeding.

Parity with reference ``src/utils/setup_utils.py:4`` (torch/cuda/numpy seeds).
In JAX randomness is explicit, so ``set_seed`` seeds the host-side generators
(numpy + python ``random``, used by the data pipeline) and returns a root
``jax.random`` key for device-side randomness (dropout, spec-augment).
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42):
    """Seed host RNGs and return a root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
