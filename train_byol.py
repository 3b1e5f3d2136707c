"""BYOL pretraining entry point (CLI parity with reference ``train_byol.py``).

Usage:
    python train_byol.py --config nrse_tpu/config/presets/default_wavlm-large_byol.yaml

Orchestration parity with reference ``train_byol.py:119-245`` (config →
logger → seed → wandb → dataloaders → model → AdamW + cosine → epoch loop
with fused validation, early stopping, periodic t-SNE, best/last
checkpoints), re-built on the TPU-native machinery:

  * ONE jitted train step fuses on-device SNR mixing + both towers +
    backward + AdamW + EMA with donated buffers.
  * Data-parallel over a ``('data','model')`` mesh from ``tpu.mesh``; the
    host pipeline keeps ``tpu.prefetch_depth`` sharded batches in flight.
  * Orbax checkpoints with true resume (``--resume`` flag; the reference
    saves optimizer state but cannot reload it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    from nrse_tpu.config import get_config

    config = get_config(argv)

    import jax

    if config.get("device") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # multi-host (multi-slice) wiring — must precede backend initialization;
    # no-op unless the config carries tpu.distributed.enabled
    from nrse_tpu.parallel.distributed import (
        aggregate_sums,
        broadcast_scalar,
        is_primary,
        make_global_batch,
        maybe_initialize,
        process_count,
    )

    maybe_initialize(config)

    import jax.numpy as jnp
    import numpy as np

    from nrse_tpu.data.noisy_speech_dataset import create_dataloaders
    from nrse_tpu.data.loader import PrefetchLoader
    from nrse_tpu.eval.evaluate_byol import validate_model, visualize_embeddings
    from nrse_tpu.models.byol import BYOLSpeechModel
    from nrse_tpu.parallel.mesh import batch_sharding, make_mesh
    from nrse_tpu.train.byol_trainer import create_train_state, make_byol_train_step
    from nrse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from nrse_tpu.train.early_stopping import EarlyStopping
    from nrse_tpu.train.schedules import make_byol_optimizer
    from nrse_tpu.utils.logging_utils import logger, setup_logger
    from nrse_tpu.utils.profiling import ThroughputMeter
    from nrse_tpu.utils.setup_utils import set_seed
    from nrse_tpu.utils.wandb_utils import get_wandb

    setup_logger(config)
    root_rng = set_seed(config["training"].get("seed", 42),
                        rng_impl=config.get("tpu", {}).get("rng_impl"))
    os.makedirs(config["training"]["checkpoint_dir"], exist_ok=True)
    os.makedirs(config["training"]["log_dir"], exist_ok=True)

    # experiment tracking only on the primary process in a cluster
    wandb_mode = config["logging"].get("wandb_mode", "disabled") \
        if is_primary() else "disabled"
    wandb = get_wandb(wandb_mode)
    wandb.init(project="noise-robust-speech-embeddings", config=config,
               mode=wandb_mode)

    # mesh + data
    mesh_cfg = config.get("tpu", {}).get("mesh", {"data": -1, "model": 1})
    mesh = make_mesh(mesh_cfg.get("data", -1), mesh_cfg.get("model", 1))
    n_chips = len(jax.devices())
    logger.info(f"mesh: {mesh}; {n_chips} devices")
    # pallas_call is not auto-partitioned by GSPMD — register the mesh so
    # the Pallas kernels can react to a model>1 axis (no-op otherwise):
    # flash attention shard_maps over heads; the fused FFN falls back to
    # the XLA pair (its weights are Megatron-sharded on 'model').
    # Scoped: the registry is process-global, and leaking it would change
    # kernel dispatch for any later caller in the same process (library
    # users, test suites) — the scope restores the previous value on exit.
    from nrse_tpu.parallel.mesh import flash_tp_mesh_scope

    with flash_tp_mesh_scope(mesh):
        batch_size = config["training"]["batch_size"]
        data_axis = mesh.shape["data"]
        if batch_size % data_axis != 0:
            raise ValueError(
                f"training.batch_size={batch_size} must be divisible by the "
                f"mesh 'data' axis ({data_axis} devices); adjust batch_size or "
                f"tpu.mesh in the config"
            )

        train_loader, val_loader = create_dataloaders(config)
        bsh = batch_sharding(mesh)
        prefetch = config.get("tpu", {}).get("prefetch_depth", 2)

        # model + optimizer + state
        model = BYOLSpeechModel(config)
        total_steps = len(train_loader) * config["training"]["num_epochs"]
        from nrse_tpu.train.schedules import cosine_annealing

        schedule = cosine_annealing(
            config["training"]["learning_rate"], total_steps
        ) if total_steps else config["training"]["learning_rate"]
        optimizer = make_byol_optimizer(
            schedule,
            weight_decay=config["training"]["weight_decay"],
            total_steps=total_steps,
        )
        # tpu.optimizer_impl: fused = single-HBM-pass Pallas AdamW+EMA kernel
        # (ops/fused_optimizer.py); checkpointed state layout is unchanged.
        fused_spec = None
        if config.get("tpu", {}).get("optimizer_impl", "xla") == "fused":
            from nrse_tpu.ops.fused_optimizer import FusedAdamWSpec

            fused_spec = FusedAdamWSpec(
                schedule=schedule,
                weight_decay=config["training"]["weight_decay"],
                ema_decay=model.ema_decay,
            )
        clip_seconds = config["data"]["max_audio_length"]
        sample = jnp.zeros((batch_size, int(clip_seconds * config["data"]["sample_rate"])))
        state = create_train_state(model, root_rng, sample, optimizer)

        ckpt_dir = config["training"]["checkpoint_dir"]
        start_epoch = 0
        resumed_best = {}
        if config.get("resume"):
            from nrse_tpu.train.checkpoint import latest_checkpoint

            name = latest_checkpoint(ckpt_dir)
            if name:
                state, meta = restore_checkpoint(ckpt_dir, name, state)
                start_epoch = int(meta.get("epoch", -1)) + 1
                resumed_best = meta.get("best", {})
                logger.info(f"resumed from {name} at epoch {start_epoch}")

        # explicit placement: replicate train state across the mesh (batches are
        # sharded on 'data'; GSPMD inserts the grad/BN collectives)
        from nrse_tpu.parallel.mesh import replicated_sharding

        rsh = replicated_sharding(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, rsh), state)

        train_step = make_byol_train_step(
            model, optimizer, donate=True, fused_optimizer=fused_spec
        )

        metric = config["training"].get("early_stopping_metric", "val_loss")
        early_stopping = EarlyStopping(
            patience=config["training"].get("early_stopping_patience", 5),
            mode="min" if metric == "val_loss" else "max",
            min_delta=config["training"].get("early_stopping_min_delta", 0.0),
        )

        best_val_loss = resumed_best.get("val_loss", float("inf"))
        best_val_similarity = resumed_best.get("val_similarity", 0.0)
        num_epochs = config["training"]["num_epochs"]

        for epoch in range(start_epoch, num_epochs):
            meter = ThroughputMeter(n_chips=n_chips)
            # losses stay on device until epoch end — a per-step float() would
            # force a host sync and stall the async dispatch pipeline
            step_losses = []
            placer = (lambda b: make_global_batch(mesh, b)) \
                if process_count() > 1 else None
            for batch in PrefetchLoader(train_loader, depth=prefetch,
                                        sharding=bsh, placer=placer):
                batch.pop("__count__", None)
                state, metrics = train_step(state, batch)
                step_losses.append(metrics["loss"])
                meter.update(batch_size, clip_seconds)
            epoch_loss = float(jnp.mean(jnp.stack(step_losses))) if step_losses \
                else 0.0
            throughput = meter.audio_sec_per_sec_per_chip

            val_loss, val_metrics = validate_model(model, state, val_loader,
                                                   config, placer=placer)
            if process_count() > 1:
                # each process validated its own shard — pool raw sums/counts
                # so the cluster agrees on WEIGHTED means (a process whose
                # shard misses an SNR bin must not average in a 0.0
                # placeholder) and early stopping / best-checkpoint decisions
                # are identical everywhere
                totals = aggregate_sums(val_metrics["val_stats"])
                val_loss = totals["loss_sum"] / max(totals["loss_cnt"], 1.0)
                similarities = {}
                # iterate the config bins, not the local val_similarities keys —
                # a bin empty on THIS process may be populated on another
                for snr in config["data"]["snr_range"]:
                    cnt = totals[f"snr_{snr}_cnt"]
                    if cnt > 0:
                        similarities[snr] = totals[f"snr_{snr}_sum"] / cnt
                val_metrics = {
                    "val_loss": val_loss,
                    "val_avg_similarity":
                        sum(similarities.values()) / max(len(similarities), 1),
                    "val_similarities": similarities,
                }

            log_dict = {
                "epoch": epoch,
                "train_loss": epoch_loss,
                "val_loss": val_loss,
                "val_avg_similarity": val_metrics["val_avg_similarity"],
                "audio_sec_per_sec_per_chip": throughput,
                "step_time_s": meter.step_time,
            }
            for snr, sim in val_metrics["val_similarities"].items():
                log_dict[f"val_similarity_snr_{snr}"] = sim
            wandb.log(log_dict)
            print(
                f"Epoch {epoch+1}/{num_epochs} - Train Loss: {epoch_loss:.4f}, "
                f"Val Loss: {val_loss:.4f}, Val Avg Similarity: "
                f"{val_metrics['val_avg_similarity']:.4f}, "
                f"{throughput:.1f} audio-sec/sec/chip"
            )

            stop_value = val_loss if metric == "val_loss" else \
                val_metrics["val_avg_similarity"]
            stop = early_stopping(stop_value)
            if process_count() > 1:  # one decision for the whole cluster
                stop = broadcast_scalar(1.0 if stop else 0.0) > 0.5

            viz_every = config["logging"].get("visualization_interval", 2)
            # t-SNE viz is single-host-only: gating the jitted embed pass on one
            # process would deadlock SPMD execution in a multi-host cluster
            if process_count() == 1 and (
                    (epoch + 1) % viz_every == 0 or epoch == num_epochs - 1):
                img = f"tsne_embeddings_epoch_{epoch+1}.png"
                path = visualize_embeddings(
                    model, state, val_loader, config["training"]["log_dir"], img
                )
                wandb.log({"embeddings": wandb.Image(path)})

            meta = {
                "epoch": epoch,
                "loss": val_loss,
                "similarity": val_metrics["val_avg_similarity"],
                "best": {
                    "val_loss": min(best_val_loss, val_loss),
                    "val_similarity": max(best_val_similarity,
                                          val_metrics["val_avg_similarity"]),
                },
            }
            # training.save_checkpoints=false skips the ~5 GB/epoch orbax writes
            # (used by measurement-only runs, e.g. the convergence report)
            save_ckpts = config["training"].get("save_checkpoints", True)
            if val_loss < best_val_loss:
                best_val_loss = val_loss
                if save_ckpts:
                    save_checkpoint(ckpt_dir, "best_val_loss", state, meta)
                    print(f"Saved best model checkpoint with validation loss: {best_val_loss:.4f}")
            if val_metrics["val_avg_similarity"] > best_val_similarity:
                best_val_similarity = val_metrics["val_avg_similarity"]
                if save_ckpts:
                    save_checkpoint(ckpt_dir, "best_val_similarity", state, meta)
                    print(f"Saved best model checkpoint with validation similarity: {best_val_similarity:.4f}")
            if save_ckpts:
                save_checkpoint(ckpt_dir, "last_model", state, meta)

            if stop:
                print(f"Early stopping triggered after epoch {epoch+1}")
                break

        wandb.finish()
        print("Training complete!")


if __name__ == "__main__":
    main()
