"""Worker process for the multi-host CPU smoke tests.

Usage:
    python tests/distributed_worker.py <pid> <nproc> <port>            # one-step smoke
    python tests/distributed_worker.py <pid> <nproc> <port> e2e <corpus> <workdir>

Each worker forces the CPU platform with 2 virtual devices and joins a
localhost coordinator, forming a (nproc·2)-device global DP mesh.  The
default mode runs ONE fused BYOL train step on a globally-sharded batch and
prints the cross-process-aggregated loss — the multi-host analogue of
``__graft_entry__.dryrun_multichip``.  The ``e2e`` mode runs the full
``train_byol.main`` (per-process data shards, global batch assembly,
aggregated validation, orbax checkpointing with global arrays).
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "step"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def run_step_smoke():
    from nrse_tpu.parallel.distributed import (
        aggregate_metrics,
        broadcast_scalar,
        initialize,
        make_global_batch,
        process_local_indices,
    )

    initialize(f"127.0.0.1:{port}", nproc, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nrse_tpu.models.byol import BYOLSpeechModel
    from nrse_tpu.models.wavlm import WavLMConfig
    from nrse_tpu.parallel.mesh import make_mesh
    from nrse_tpu.train.byol_trainer import (
        create_train_state,
        make_byol_train_step,
    )
    from nrse_tpu.train.schedules import make_byol_optimizer

    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2
    mesh = make_mesh(data=-1, model=1)  # global DP mesh across processes

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    model = BYOLSpeechModel(
        {"model": {"projection_dim": 32, "prediction_dim": 64,
                   "ema_decay": 0.99}},
        encoder_config=cfg,
    )
    global_batch, t = 4 * nproc, 8000
    opt = make_byol_optimizer(1e-3, 1e-5, total_steps=10)
    # identical deterministic init on every process → valid replicated state
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((4, t)), opt
    )
    rsh = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rsh, np.asarray(x)),
        state,
    )

    # per-process shard of the (synthetic) corpus index space
    idx = process_local_indices(global_batch, batch_size_per_process=4,
                                pid=pid, nproc=nproc)
    assert len(idx) == 4, idx
    rng = np.random.default_rng(0)
    full_clean = rng.standard_normal((global_batch, t)).astype(np.float32)
    full_noise = 0.2 * rng.standard_normal((global_batch, t)).astype(
        np.float32)
    local = {
        "clean": full_clean[idx],
        "noise": full_noise[idx],
        "snr": np.full((len(idx),), 5.0, np.float32),
    }
    batch = make_global_batch(mesh, local)

    step = make_byol_train_step(model, opt, donate=False)
    new_state, metrics = step(state, batch)
    agg = aggregate_metrics({"loss": float(metrics["loss"])})
    stop = broadcast_scalar(1.0 if agg["loss"] < 10 else 0.0)
    assert int(new_state.step) == 1
    print(f"DIST_OK pid={pid} loss={agg['loss']:.6f} stop={stop}", flush=True)


def run_e2e(corpus: str, workdir: str):
    """Full train_byol.main under the cluster: per-process data shards,
    global-batch assembly, aggregated validation, orbax checkpoints."""
    import yaml

    import train_byol

    cfg = {
        "model": {"name": "wavlm-tiny", "projection_dim": 32,
                  "prediction_dim": 64, "ema_decay": 0.99},
        "training": {"batch_size": 8, "num_workers": 2, "num_epochs": 1,
                     "learning_rate": 1e-3, "weight_decay": 1e-5,
                     "checkpoint_dir": f"{workdir}/ck", "seed": 42,
                     "log_dir": f"{workdir}/logs",
                     "early_stopping_metric": "val_loss",
                     "early_stopping_patience": 5,
                     "early_stopping_min_delta": 0.0},
        "data": {"clean_data_path": f"{corpus}/clean",
                 "noise_data_path": f"{corpus}/noise",
                 "sample_rate": 16000, "max_audio_length": 1.0,
                 "snr_range": [0, 5], "validation_ratio": 0.34},
        "logging": {"wandb_mode": "disabled", "level": "ERROR",
                    "console_level": "ERROR", "visualization_interval": 100},
        "tpu": {"mesh": {"data": -1, "model": 1}, "prefetch_depth": 0,
                "distributed": {
                    "enabled": True,
                    "coordinator_address": f"127.0.0.1:{port}",
                    "num_processes": nproc,
                    "process_id": pid,
                }},
    }
    path = f"{workdir}/cfg_{pid}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_byol.main(["--config", path, "--device", "cpu"])
    print(f"E2E_OK pid={pid}", flush=True)


if mode == "e2e":
    run_e2e(sys.argv[5], sys.argv[6])
else:
    run_step_smoke()
