"""Multi-host (multi-process) smoke tests on CPU.

The DCN story (SURVEY.md §2c: "DCN for multi-slice later") — exercised
without TPU pods by forming a real ``jax.distributed`` cluster of two local
processes, each owning 2 virtual CPU devices, and running the fused BYOL
train step over the global 4-device DP mesh.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def test_two_process_dp_train_step():
    port = 29000 + (os.getpid() % 900)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = set()
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("DIST_OK")][0]
        losses.add(line.split("loss=")[1].split()[0])
        assert "stop=1.0" in line
    # both processes agree on the aggregated loss
    assert len(losses) == 1, losses


def test_process_local_indices_sharding():
    from nrse_tpu.parallel.distributed import process_local_indices

    a = process_local_indices(103, batch_size_per_process=8, pid=0, nproc=4)
    b = process_local_indices(103, batch_size_per_process=8, pid=3, nproc=4)
    # equal, batch-aligned shard lengths on every process
    assert len(a) == len(b) == 24
    # strided, disjoint coverage
    assert set(a) & set(b) == set()
    assert (a % 4 == 0).all() and (b % 4 == 3).all()


def test_single_process_helpers_are_identity():
    from nrse_tpu.parallel.distributed import (
        aggregate_metrics,
        broadcast_scalar,
        is_primary,
        maybe_initialize,
    )

    assert maybe_initialize({}) is False
    assert maybe_initialize({"tpu": {"distributed": {"enabled": False}}}) is False
    assert is_primary()
    m = aggregate_metrics({"loss": np.float32(1.5)})
    assert m == {"loss": 1.5}
    assert broadcast_scalar(3.0) == 3.0


def test_two_process_pallas_dp_kernel():
    """2-process cluster × shard_mapped fused-FFN Pallas kernel under the
    global DP mesh (VERDICT r3 item 7): loss, psum'd weight grads and the
    local x-grad shards match a single-device reference in each worker."""
    port = 29090 + (os.getpid() % 900)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), "pallas"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    losses = set()
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("PALLAS_OK")][0]
        losses.add(line.split("loss=")[1].split()[0])
    assert len(losses) == 1, losses


def test_two_process_train_byol_e2e(tmp_path, tiny_wav_dir):
    """Full train_byol epoch on a 2-process cluster: process-sharded
    loaders, global batch assembly, aggregated validation, orbax save."""
    port = 29900 + (os.getpid() % 90)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    work = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), "e2e",
             str(tiny_wav_dir), work],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}\n{err[-3000:]}"
        assert "E2E_OK" in out
    assert os.path.isdir(os.path.join(work, "ck", "last_model"))
