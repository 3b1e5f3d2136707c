"""BYOL projection / prediction heads.

Capability parity with reference ``src/models/multi_layer_heads.py:4-48``
(the heads actually used: Projection = Linear→BN→ReLU→Linear→BN,
Prediction = Linear→BN→ReLU→Linear→BN→ReLU→Linear) and the shallower
experimental variants in ``src/models/single_layer_heads.py:5-46``
(``SingleLayer*`` here).

TPU notes: under ``jit`` over a data-sharded mesh, the BatchNorm batch
statistics are computed over the *global* logical batch (GSPMD inserts the
cross-replica reduction automatically), which reproduces the reference's
single-device BN-over-the-full-batch semantics — the collapse-prevention
behaviour BYOL's heads rely on.  Momentum 0.9 ≙ torch BatchNorm1d's default
``momentum=0.1`` running-average update.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class ProjectionHead(nn.Module):
    """Linear → BN → ReLU → Linear → BN (multi_layer_heads.py:4-24)."""

    hidden_dim: int
    output_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9,
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name=name,
        )
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense_0")(x)
        h = bn("bn_0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.output_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense_1")(h)
        h = bn("bn_1")(h)
        return h


class PredictionHead(nn.Module):
    """Linear → BN → ReLU → Linear → BN → ReLU → Linear
    (multi_layer_heads.py:27-48)."""

    hidden_dim: int
    output_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9,
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name=name,
        )
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense_0")(x)
        h = nn.relu(bn("bn_0")(h))
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense_1")(h)
        h = nn.relu(bn("bn_1")(h))
        h = nn.Dense(self.output_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense_2")(h)
        return h


class SingleLayerProjectionHead(nn.Module):
    """Experimental shallow variant (single_layer_heads.py:5-25)."""

    hidden_dim: int
    output_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense_0")(x)
        h = nn.BatchNorm(use_running_average=use_running_average,
                         momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="bn_0")(h)
        h = nn.relu(h)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="dense_1")(h)


class SingleLayerPredictionHead(SingleLayerProjectionHead):
    """Experimental shallow predictor (single_layer_heads.py:28-46) —
    identical topology to the shallow projection head."""
