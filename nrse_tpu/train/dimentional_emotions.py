"""Dimensional SER trainer (arousal/valence/dominance CCC regression).

Capability parity with reference ``src/train/dimentional_emotions.py:18-303``
(filename spelling preserved): same 2-phase skeleton as the categorical
trainer with CCC loss (``:427-450``), numpy ``compute_ccc`` epoch metrics
(``:453-465``), pred-vs-GT scatter plots (``:468-484``), and the hardcoded
24-layer unfreeze total (``:219``) generalised to the encoder's layer count.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from nrse_tpu.data.emotion_dataset import create_emotion_dataloaders
from nrse_tpu.models.emotion import (
    EmotionClassifier,
    gradually_unfrozen_layers,
    layer_gradient_scale,
)
from nrse_tpu.train.categorical_emotions import (
    _encoder_config_from,
    load_pretrained_encoder,
)
from nrse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from nrse_tpu.train.emotion_trainer import (
    EmotionTrainState,
    ReduceLROnPlateau,
    create_emotion_state,
    load_encoder_into_classifier,
    make_batch_placer,
    make_emotion_eval_step,
    make_emotion_train_step,
)
from nrse_tpu.train.losses import compute_ccc
from nrse_tpu.train.schedules import make_emotion_optimizer
from nrse_tpu.utils.logging_utils import logger, setup_logger
from nrse_tpu.utils.setup_utils import set_seed
from nrse_tpu.utils.wandb_utils import get_wandb

DIMS = ("arousal", "valence", "dominance")


def plot_scatter(predictions, targets, filename, title="Scatter Plot",
                 x_label="Predicted", y_label="Ground Truth"):
    """Pred-vs-GT scatter (reference ``dimentional_emotions.py:468-484``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 8))
    plt.scatter(predictions, targets, alpha=0.4)
    lo = min(float(np.min(predictions)), float(np.min(targets)))
    hi = max(float(np.max(predictions)), float(np.max(targets)))
    plt.plot([lo, hi], [lo, hi], "r--")
    plt.xlabel(x_label)
    plt.ylabel(y_label)
    plt.title(title)
    plt.tight_layout()
    plt.savefig(filename)
    plt.close()


def _validate(params, val_loader, eval_step, place_batch=None):
    """Full-val pass → (ccc_loss_proxy, {dim: ccc}, preds, targets)."""
    from nrse_tpu.train.losses import ccc_loss

    all_preds, all_tgts, losses = [], [], []
    for batch in val_loader:
        count = int(batch.pop("__count__", len(batch["A"])))
        jbatch = (place_batch or (lambda b: jax.tree.map(jnp.asarray, b)))(batch)
        out = eval_step(params, jbatch)
        dims = np.asarray(out["dims"])[:count]
        tgts = np.stack(
            [np.asarray(batch[k])[:count] for k in ("A", "V", "D")], axis=1
        )
        losses.append(float(ccc_loss(jnp.asarray(dims), jnp.asarray(tgts))))
        all_preds.append(dims)
        all_tgts.append(tgts)
    preds = np.concatenate(all_preds)
    tgts = np.concatenate(all_tgts)
    ccc = {
        name: compute_ccc(preds[:, i], tgts[:, i])
        for i, name in enumerate(DIMS)
    }
    return float(np.mean(losses)), ccc, preds, tgts


def train_dimensional_emotions(config) -> Dict:
    setup_logger(config)
    rng = set_seed(config["training"].get("seed", 42),
                   rng_impl=config.get("tpu", {}).get("rng_impl"))
    em = config["emotion"]
    wandb = get_wandb(config["logging"].get("wandb_mode", "disabled"))
    wandb.init(project="nrse-emotion-dimensional", config=config,
               mode=config["logging"].get("wandb_mode", "disabled"))

    ckpt_dir = em["checkpoint_dir"]
    os.makedirs(ckpt_dir, exist_ok=True)
    log_dir = config["training"].get("log_dir", ckpt_dir)
    os.makedirs(log_dir, exist_ok=True)

    train_loader, val_loader = create_emotion_dataloaders(config)

    enc_cfg = _encoder_config_from(config)
    model = EmotionClassifier(
        enc_cfg,
        hidden_dim=em.get("hidden_dim", 1024),
        dropout=em.get("dropout_rate", 0.3),
        num_emotions=8,
    )
    bs = em["batch_size"]
    t = int(config["data"]["max_audio_length"] * config["data"]["sample_rate"])
    optimizer = make_emotion_optimizer(
        em.get("learning_rate", 1e-4), em.get("weight_decay", 1e-4)
    )
    state = create_emotion_state(
        model, rng,
        {"input_values": jnp.zeros((bs, t)), "attention_mask": jnp.ones((bs, t))},
        optimizer,
    )
    encoder_params = load_pretrained_encoder(config, jnp.zeros((2, t)))
    if encoder_params is not None:
        state = EmotionTrainState(
            params=load_encoder_into_classifier(state.params, encoder_params),
            opt_state=state.opt_state, step=state.step, rng=state.rng,
        )

    num_layers = enc_cfg.num_hidden_layers
    train_step = make_emotion_train_step(model, optimizer, "dimensional",
                                         num_layers)
    eval_step = make_emotion_eval_step(model, "dimensional")
    frozen_scale = layer_gradient_scale(num_layers, [])
    place_batch, place_state = make_batch_placer(config, bs)
    state = place_state(state)

    def run_phase(phase: str, epochs: int, lr0: float, state,
                  unfreeze_schedule=None, best_name="best_classifier_model",
                  rest_scale: float = 0.0):
        plateau = ReduceLROnPlateau(
            lr0, mode="max", factor=0.5,
            patience=em.get("scheduler_patience", 2),
        )
        best_ccc, patience_left = -np.inf, em.get("patience", 3)
        lr = lr0
        for epoch in range(epochs):
            if unfreeze_schedule is not None:
                layers = unfreeze_schedule(epoch, epochs)
                scale = layer_gradient_scale(num_layers, layers)
                logger.info(f"[{phase}] epoch {epoch}: unfrozen layers {layers}")
            else:
                scale = frozen_scale
            step_losses = []
            for batch in train_loader:
                batch.pop("__count__", None)
                jbatch = place_batch(batch)
                state, metrics = train_step(state, jbatch, None, scale,
                                            jnp.float32(lr),
                                            jnp.float32(rest_scale))
                step_losses.append(metrics["loss"])  # device-side until epoch end
            epoch_loss = float(jnp.mean(jnp.stack(step_losses))) \
                if step_losses else 0.0
            n = len(step_losses)
            val_loss, ccc, preds, tgts = _validate(state.params, val_loader,
                                                   eval_step, place_batch)
            avg_ccc = float(np.mean(list(ccc.values())))
            lr = plateau.step(avg_ccc)
            log = {f"{phase}/train_loss": epoch_loss,
                   f"{phase}/val_loss": val_loss, f"{phase}/val_ccc": avg_ccc,
                   f"{phase}/lr": lr, "epoch": epoch}
            for name, v in ccc.items():
                log[f"{phase}/ccc_{name}"] = v
            wandb.log(log)
            print(f"[{phase}] epoch {epoch+1}/{epochs} "
                  f"train_loss={epoch_loss:.4f} "
                  f"val_ccc={avg_ccc:.4f} "
                  f"(A={ccc['arousal']:.3f} V={ccc['valence']:.3f} "
                  f"D={ccc['dominance']:.3f}) lr={lr:.2e}")
            if avg_ccc > best_ccc:
                best_ccc = avg_ccc
                patience_left = em.get("patience", 3)
                save_checkpoint(ckpt_dir, best_name, state,
                                {"epoch": epoch, "ccc": avg_ccc, "phase": phase})
                for i, name in enumerate(DIMS):
                    path = os.path.join(log_dir, f"val_scatter_{name}.png")
                    plot_scatter(preds[:, i], tgts[:, i], path,
                                 title=f"Validation {name} (CCC={ccc[name]:.3f})")
                    wandb.log({f"val_scatter_{name}": wandb.Image(path)})
            else:
                patience_left -= 1
                if patience_left <= 0:
                    print(f"[{phase}] early stopping at epoch {epoch+1}")
                    break
        return state, best_ccc

    state, best_ccc = run_phase(
        "classifier", em.get("classifier_epochs", 20),
        em.get("learning_rate", 1e-4), state,
    )
    if em.get("unfreeze_encoder", False):
        restored, _ = restore_checkpoint(ckpt_dir, "best_classifier_model", state)
        # gradual_unfreeze=False IS --freeze_ssl=False (every ssl param
        # trains, conv frontend included) — same semantics as the
        # categorical trainer (train_ft_cat_ser_weighted_checkpoint.py:209-214)
        if em.get("gradual_unfreeze", True):
            schedule = lambda e, total: gradually_unfrozen_layers(  # noqa: E731
                e, total, num_layers)
            full_encoder = False
        else:
            schedule = lambda e, total: list(range(num_layers))  # noqa: E731
            full_encoder = True
        full_encoder = bool(em.get("train_full_encoder", full_encoder))
        state, best_ft = run_phase(
            "fine_tune", em.get("fine_tuning_epochs", 10),
            em.get("fine_tuning_lr", 5e-6), restored,
            unfreeze_schedule=schedule,
            best_name="best_fine_tuned_model",
            rest_scale=1.0 if full_encoder else 0.0,
        )
        best_ccc = max(best_ccc, best_ft)

    wandb.finish()
    return {"best_ccc": best_ccc}
