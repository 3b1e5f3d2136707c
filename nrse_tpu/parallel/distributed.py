"""Multi-host (multi-process / multi-slice) execution support.

The reference is strictly single-process, single-GPU — SURVEY.md §2c
verified no ``torch.distributed``/NCCL anywhere — so this subsystem is the
rebuild's DCN extension point, not a port: one JAX process per host, a
global ``('data','model')`` mesh spanning all hosts' chips (ICI within a
slice, DCN across slices), GSPMD inserting the cross-host collectives.

What lives here:
  * ``initialize`` / ``maybe_initialize`` — ``jax.distributed`` wiring
    (coordinator, process id), driven by the ``tpu.distributed`` config
    block or standard cluster env detection.
  * ``process_local_indices`` — per-process shard of a dataset's index
    space for the host loaders (every process must yield the SAME number
    of batches per epoch, so the shard length is truncated to the global
    minimum — ragged tails would deadlock the collective at the final
    step).
  * ``make_global_batch`` — assemble each host's local batch into global
    arrays sharded over the mesh (``jax.make_array_from_process_local_data``);
    the jitted train step is then identical to the single-host one.
  * ``aggregate_metrics`` / ``broadcast_scalar`` — host-side metric
    all-gather (``multihost_utils``) so validation/early-stopping decisions
    agree across processes.

Testing: CPU-testable end-to-end — each process forces the CPU platform
with N virtual devices and a localhost coordinator
(``tests/test_distributed.py`` runs a 2-process DP train-step smoke, the
multi-host analogue of ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """``jax.distributed.initialize`` with explicit topology.

    Must run before any other JAX call in the process (backend init).
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def maybe_initialize(config: Dict[str, Any]) -> bool:
    """Initialize from the ``tpu.distributed`` config block when present.

    Block schema (all optional — with none set and ``enabled: true`` the
    standard cluster-env autodetection is used, e.g. on Cloud TPU pods):

    .. code-block:: yaml

        tpu:
          distributed:
            enabled: true
            coordinator_address: "10.0.0.2:8476"
            num_processes: 4
            process_id: 0

    Returns True when distributed mode was initialized.
    """
    block = (config.get("tpu", {}) or {}).get("distributed", {}) or {}
    if not block.get("enabled", False):
        return False
    import jax

    addr = block.get("coordinator_address")
    if addr is None:
        jax.distributed.initialize()  # cluster-env autodetection
    else:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=block.get("num_processes"),
            process_id=block.get("process_id"),
        )
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write logs/checkpoint metadata/wandb."""
    return process_index() == 0


def process_local_indices(n_items: int,
                          batch_size_per_process: Optional[int] = None,
                          pid: Optional[int] = None,
                          nproc: Optional[int] = None) -> np.ndarray:
    """This process's strided shard of ``range(n_items)``.

    Strided (``pid::nproc``) rather than contiguous so class/length
    distributions stay balanced.  All shards are truncated to the minimum
    shard length (and optionally to a multiple of the per-process batch
    size) — every process must run the same number of steps per epoch or
    the grad all-reduce at the tail deadlocks.
    """
    pid = process_index() if pid is None else pid
    nproc = process_count() if nproc is None else nproc
    shard = np.arange(pid, n_items, nproc, dtype=np.int64)
    min_len = n_items // nproc
    if batch_size_per_process:
        min_len = (min_len // batch_size_per_process) * batch_size_per_process
    return shard[:min_len]


def make_global_batch(mesh, batch: Dict[str, np.ndarray],
                      batch_axis: str = "data"):
    """Assemble per-process host batches into global mesh-sharded arrays.

    Each process holds ``global_batch / process_count`` rows; the result is
    a pytree of global ``jax.Array``s sharded over ``batch_axis`` — the
    jitted train step consumes it exactly like a single-host sharded batch.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(batch_axis))

    def place(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree.map(place, batch)


def aggregate_metrics(metrics: Dict[str, Any]) -> Dict[str, float]:
    """Mean of host-side scalar metrics across processes
    (``multihost_utils.process_allgather``); single-process: identity."""
    if process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)  # [nproc, K]
    mean = np.asarray(gathered).mean(axis=0)
    return {k: float(m) for k, m in zip(keys, mean)}


def aggregate_sums(metrics: Dict[str, Any]) -> Dict[str, float]:
    """Sum of host-side scalar metrics across processes — for weighted
    means from per-process (sum, count) pairs, where averaging the
    per-process means would let empty-bin placeholders pollute the result."""
    if process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)  # [nproc, K]
    total = np.asarray(gathered).sum(axis=0)
    return {k: float(t) for k, t in zip(keys, total)}


def broadcast_scalar(value: float, source: int = 0) -> float:
    """Agree on one host-side scalar (e.g. the early-stopping decision)."""
    if process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(
        np.asarray(value, np.float32), is_source=process_index() == source
    )
    return float(out)
