"""Device mesh + sharding rules.

The reference is single-GPU (SURVEY.md §2c: no torch.distributed / NCCL /
DDP anywhere) — parallelism is designed fresh here, TPU-native:

  * **DP (primary)**: a 1-D ``data`` mesh axis; batches are sharded on it,
    parameters replicated.  Everything else (gradient all-reduce, global
    BatchNorm statistics for the BYOL heads, metric reductions) falls out of
    GSPMD: ``jnp`` reductions over the batch axis become ICI collectives
    automatically.
  * **TP (available)**: a ``model`` axis shards attention heads and FFN
    hidden dims of the scanned transformer stack.  WavLM-large (316 M
    params) fits one chip, so TP is an extension point, not a requirement
    (SURVEY.md §2c) — but the rules below are real and the multi-chip dry
    run exercises them.
  * PP/EP are non-goals for this model family (documented in SURVEY.md);
    the mesh API leaves room for extra axes.

All sharding is expressed as ``NamedSharding`` constraints consumed by
``jax.jit`` — XLA inserts the collectives (psum over ``data`` for grads,
all-gather/reduce-scatter over ``model`` for TP matmuls) and rides ICI.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``('data', 'model')`` mesh.

    ``data=-1`` consumes all remaining devices (config surface:
    ``tpu.mesh`` in the YAML presets).  Explicit sizes smaller than the
    device count take the first ``data·model`` devices — a config may
    deliberately train on a subset (e.g. a 2-wide data mesh on an 8-chip
    host for small-batch SER fine-tuning).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    if data * model < n:
        # deliberate subset meshes are allowed (small-batch SER configs),
        # but silently idling chips is the classic hidden-slowdown bug —
        # make it visible, and refuse it outright under multi-host where
        # the subset could exclude every device of some process
        import jax as _jax

        if _jax.process_count() > 1:
            raise ValueError(
                f"tpu.mesh {data}x{model} uses only {data * model} of {n} "
                f"devices — subset meshes are not supported in multi-host "
                f"mode (a process could own zero mesh devices)"
            )
        from nrse_tpu.utils.logging_utils import logger

        logger.warning(
            f"mesh {data}x{model} uses {data * model} of {n} devices — "
            f"{n - data * model} chips will idle (intended for small-batch "
            f"fine-tuning configs; set tpu.mesh data: -1 to use all)"
        )
    devices = devices[: data * model]
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# Flash-attention × TP registry
# ---------------------------------------------------------------------------
#
# ``pallas_call`` is NOT auto-partitioned by GSPMD: with tensor parallelism
# (``model`` axis > 1) the flash kernels would be replicated-and-gathered
# (or fail to lower).  Entry points that enable flash attention on a TP mesh
# register the mesh here; ``ops.flash_attention`` then shard_maps the kernel
# over the head dimension (heads are embarrassingly parallel — 16 heads
# divide any power-of-two model axis ≤ 16, no collectives inside).

_FLASH_TP = None  # Optional[Tuple[Mesh, str data_axis, str model_axis]]


def set_flash_tp_mesh(mesh: Optional[Mesh], data_axis: str = "data",
                      model_axis: str = "model") -> None:
    """Register (or clear, with ``None``) the mesh the flash kernels must
    shard_map over.  Call this whenever flash attention runs under a mesh
    with ``model`` axis > 1 — the kernels cannot detect TP on their own."""
    global _FLASH_TP
    _FLASH_TP = None if mesh is None else (mesh, data_axis, model_axis)


def get_flash_tp_mesh():
    """The registered (mesh, data_axis, model_axis), or None."""
    return _FLASH_TP


@contextlib.contextmanager
def flash_tp_mesh_scope(mesh: Optional[Mesh], data_axis: str = "data",
                        model_axis: str = "model"):
    """Scoped registration: restores the previous registry value on exit.

    Entry points (trainer ``main``s, bench loops) MUST use this instead of
    a bare ``set_flash_tp_mesh`` — the registry is process-global, and a
    leaked mesh silently changes Pallas-kernel dispatch for every later
    caller (e.g. a library user who runs a trainer and then evaluates a
    model under a different mesh context would inherit stale shard_maps
    and batch-divisibility errors)."""
    global _FLASH_TP
    prev = _FLASH_TP
    set_flash_tp_mesh(mesh, data_axis, model_axis)
    try:
        yield
    finally:
        _FLASH_TP = prev


def tp_model_parallel() -> bool:
    """True when a mesh with a model axis > 1 is registered — the single
    source of truth for "is tensor parallelism active" used by every
    Pallas-kernel fallback decision (kernels are opaque to GSPMD and
    cannot observe the surrounding jit's shardings)."""
    return _FLASH_TP is not None and \
        _FLASH_TP[0].shape.get(_FLASH_TP[2], 1) > 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays batch-sharded on the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


# ---------------------------------------------------------------------------
# Tensor-parallel partition rules for the WavLM parameter tree
# ---------------------------------------------------------------------------

def param_partition_spec(path, leaf) -> P:
    """PartitionSpec for one WavLM/BYOL parameter leaf by its tree path.

    Megatron-style TP over the scanned transformer stack (leading axis L is
    the layer axis and is never sharded):
      * q/k/v projections   ``[L, C, C]``  → shard out-dim (heads) on 'model'
      * out projection      ``[L, C, C]``  → shard in-dim on 'model'
      * FFN intermediate    ``[L, C, 4C]`` → shard out-dim on 'model'
      * FFN output          ``[L, 4C, C]`` → shard in-dim on 'model'
    Everything else (conv frontend, norms, biases, heads, embeddings) is
    replicated — they are tiny next to the matmul weights.
    """
    keys = [p.key if hasattr(p, "key") else str(p) for p in path]
    name = keys[-1]
    joined = "/".join(keys)
    if name == "kernel" and leaf.ndim == 3:  # stacked [L, in, out]
        if any(k in joined for k in ("q_proj", "k_proj", "v_proj")):
            return P(None, None, "model")
        if "out_proj" in joined:
            return P(None, "model", None)
        if "intermediate_dense" in joined:
            return P(None, None, "model")
        if "output_dense" in joined and "feed_forward" in joined:
            return P(None, "model", None)
    if name == "bias" and leaf.ndim == 2:  # stacked [L, dim]
        if any(k in joined for k in ("q_proj", "k_proj", "v_proj",
                                      "intermediate_dense")):
            return P(None, "model")
    return P()


def byol_param_shardings(mesh: Mesh, tree) -> Any:
    """NamedSharding tree for any parameter/optimizer pytree."""
    def to_sharding(path, leaf):
        return NamedSharding(mesh, param_partition_spec(path, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, tree)
