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


def run_pallas_dp():
    """Multi-process × shard_mapped Pallas kernel (VERDICT r3 item 7).

    The fused-FFN kernel shard_maps over the GLOBAL data axis
    (``ops/fused_ffn.py::fused_ffn``); under a 2-process cluster each
    process executes its local shards and shard_map's AD psums the
    replicated weights' cotangents across processes.  Deterministic path
    (CPU interpret stubs the PRNG): loss, weight grads (replicated) and
    the local x-grad shards must match a process-local single-device run
    bit-for-tolerance.  The dropout seed mixing uses
    ``jax.lax.axis_index('data')`` — by jax semantics the *global* index
    along the mesh axis, so per-shard PRNG streams stay distinct across
    hosts exactly as in the single-process 8-device dryrun."""
    from nrse_tpu.parallel.distributed import initialize

    initialize(f"127.0.0.1:{port}", nproc, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nrse_tpu.ops.fused_ffn import fused_ffn
    from nrse_tpu.parallel.mesh import flash_tp_mesh_scope, make_mesh

    n_dev = 2 * nproc
    assert len(jax.devices()) == n_dev
    rng = np.random.default_rng(11)
    n, c, f = 4 * n_dev, 128, 256
    x = rng.standard_normal((n, 4, c)).astype(np.float32)
    w1 = (0.1 * rng.standard_normal((c, f))).astype(np.float32)
    b1 = (0.1 * rng.standard_normal((f,))).astype(np.float32)
    w2 = (0.1 * rng.standard_normal((f, c))).astype(np.float32)
    b2 = (0.1 * rng.standard_normal((c,))).astype(np.float32)
    seed = jnp.zeros((2,), jnp.uint32)

    def loss(x, w1, b1, w2, b2):
        return jnp.mean(fused_ffn(x, w1, b1, w2, b2, seed, 0.0, 0.0) ** 2)

    # process-local single-device reference (no mesh registered)
    base_v, base_g = jax.value_and_grad(loss, argnums=(0, 1, 3))(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2))

    mesh = make_mesh(data=-1, model=1)  # global DP mesh across processes
    rows_per_proc = n // nproc
    lo = pid * rows_per_proc
    xspec = NamedSharding(mesh, P("data", None, None))
    rep = NamedSharding(mesh, P())
    gx = jax.make_array_from_process_local_data(
        xspec, x[lo:lo + rows_per_proc])
    gw1, gb1, gw2, gb2 = (
        jax.make_array_from_process_local_data(rep, a)
        for a in (w1, b1, w2, b2)
    )
    with flash_tp_mesh_scope(mesh):
        dp_v, dp_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 3)))(
            gx, gw1, gb1, gw2, gb2)

    assert abs(float(dp_v) - float(base_v)) < 1e-6 * abs(float(base_v))
    # replicated weight grads: psum'd across BOTH processes by shard_map AD
    np.testing.assert_allclose(np.asarray(dp_g[1]), np.asarray(base_g[1]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp_g[2]), np.asarray(base_g[2]),
                               rtol=1e-5, atol=1e-6)
    # x-grad is data-sharded: check this process's addressable shards
    for shard in dp_g[0].addressable_shards:
        r0 = shard.index[0].start or 0
        np.testing.assert_allclose(
            np.asarray(shard.data),
            np.asarray(base_g[0][r0:r0 + shard.data.shape[0]]),
            rtol=1e-5, atol=1e-6)
    print(f"PALLAS_OK pid={pid} loss={float(dp_v):.6f}", flush=True)


if mode == "e2e":
    run_e2e(sys.argv[5], sys.argv[6])
elif mode == "pallas":
    run_pallas_dp()
else:
    run_step_smoke()
