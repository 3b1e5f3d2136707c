"""Categorical SER trainer (8-class MSP-Podcast).

Capability parity with reference ``src/train/categorical_emotions.py:21-301``:
load BYOL checkpoint → online encoder into an EmotionClassifier → class
weights ``(total/(count·K))^1.5`` → phase 1: ``classifier_epochs`` with the
encoder frozen → phase 2 (if ``unfreeze_encoder``): reload phase-1 best,
lower ``fine_tuning_lr``, gradually unfreeze top→bottom transformer layers
per epoch; AdamW + ReduceLROnPlateau(max) on macro-F1; weighted masked CE;
confusion-matrix + per-class-report plots; best checkpoints per phase.

TPU-shaped: freezing is gradient gating inside one jitted step (no
recompiles across the unfreeze schedule), metrics aggregate on host.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nrse_tpu.data.emotion_dataset import create_emotion_dataloaders
from nrse_tpu.models.emotion import (
    EmotionClassifier,
    gradually_unfrozen_layers,
    layer_gradient_scale,
)
from nrse_tpu.models.wavlm import WavLMConfig
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
from nrse_tpu.train.losses import compute_class_weights
from nrse_tpu.train.schedules import make_emotion_optimizer
from nrse_tpu.utils.logging_utils import logger, setup_logger
from nrse_tpu.utils.setup_utils import set_seed
from nrse_tpu.utils.wandb_utils import get_wandb

EMOTION_NAMES = {
    0: "Anger", 1: "Happiness", 2: "Sadness", 3: "Fear",
    4: "Surprise", 5: "Disgust", 6: "Contempt", 7: "Neutral",
}


def _encoder_config_from(config) -> WavLMConfig:
    tpu_cfg = config.get("tpu", {})
    return WavLMConfig.from_model_name(
        config["model"].get("name", "microsoft/wavlm-large"),
        dtype=jnp.bfloat16
        if tpu_cfg.get("compute_dtype", "bfloat16") == "bfloat16"
        else jnp.float32,
        use_flash_attention=tpu_cfg.get("flash_attention", False),
        frontend_norm=tpu_cfg.get("frontend_norm", "mxu"),
        frontend_conv=tpu_cfg.get("frontend_conv", "xla"),
        ffn_impl=tpu_cfg.get("ffn_impl", "xla"),
        score_dtype=jnp.bfloat16
        if tpu_cfg.get("score_dtype", "float32") == "bfloat16" else None,
        seq_pad_multiple=int(tpu_cfg.get("seq_pad_multiple", 1)),
        attn_dropout_impl=tpu_cfg.get("attn_dropout_impl", "xla"),
        qkv_impl=tpu_cfg.get("qkv_impl", "xla"),
        frontend_remat=bool(tpu_cfg.get("frontend_remat", False)),
        remat=tpu_cfg.get("remat", False),
    )


def load_pretrained_encoder(config, sample_input):
    """Online-encoder params from a BYOL checkpoint dir, or None.

    Parity with ``categorical_emotions.py:45-50`` (torch.load + strip to
    ``get_encoder()``), on orbax checkpoints produced by ``train_byol.py``.
    """
    path = config["emotion"].get("encoder_checkpoint")
    if path and os.path.isfile(path) and path.endswith(".pt"):
        # reference torch checkpoint — bridge it (models/convert.py)
        from nrse_tpu.models.convert import load_reference_byol_checkpoint

        variables = load_reference_byol_checkpoint(
            path, _encoder_config_from(config)
        )
        logger.info(f"bridged reference torch BYOL checkpoint {path}")
        return variables.online["params"]["encoder"]
    if not path or not os.path.isdir(path):
        logger.warning(
            f"encoder checkpoint {path!r} not found — training from scratch"
        )
        return None
    from nrse_tpu.train.checkpoint import restore_checkpoint_raw

    ckpt_dir, name = os.path.split(path.rstrip("/"))
    raw = restore_checkpoint_raw(ckpt_dir, name)
    # BYOLTrainState dataclass serialises by field name; the optimizer
    # structure is irrelevant here — only the online encoder is needed
    # (reference semantics: torch.load → get_encoder(),
    # categorical_emotions.py:45-50)
    encoder = raw["variables"]["online"]["params"]["encoder"]
    logger.info(f"loaded BYOL encoder from {path}")
    return jax.tree.map(jnp.asarray, encoder)


def _validate(model, params, val_loader, eval_step, class_weights,
              place_batch=None):
    """Full-val pass → (loss-proxy, macro_f1, confusion, report, preds)."""
    from sklearn.metrics import classification_report, confusion_matrix, f1_score

    from nrse_tpu.train.losses import ce_weight_category

    all_preds, all_labels, losses = [], [], []
    for batch in val_loader:
        count = int(batch.pop("__count__", len(batch["C"])))
        jbatch = (place_batch or (lambda b: jax.tree.map(jnp.asarray, b)))(batch)
        out = eval_step(params, jbatch)
        logits = np.asarray(out["logits"])[:count]
        labels = np.asarray(batch["C"])[:count]
        losses.append(float(ce_weight_category(
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(class_weights) if class_weights is not None else None,
        )))
        all_preds.append(logits.argmax(-1))
        all_labels.append(labels)
    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    valid = (labels >= 0) & (labels < 8)
    preds, labels = preds[valid], labels[valid]
    f1 = f1_score(labels, preds, average="macro") if len(labels) else 0.0
    cm = confusion_matrix(labels, preds, labels=list(range(8)))
    report = classification_report(
        labels, preds, labels=list(range(8)),
        target_names=[EMOTION_NAMES[i] for i in range(8)],
        output_dict=True, zero_division=0,
    )
    return float(np.mean(losses)), float(f1), cm, report


def plot_confusion_matrix(cm, class_names, filename="confusion_matrix.png",
                          title="Confusion Matrix"):
    """Heatmap plot (reference ``categorical_emotions.py:486-496``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    plt.figure(figsize=(10, 8))
    sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                xticklabels=class_names, yticklabels=class_names)
    plt.xlabel("Predicted")
    plt.ylabel("True")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(filename)
    plt.close()


def train_categorical_emotions(config) -> Dict:
    setup_logger(config)
    rng = set_seed(config["training"].get("seed", 42),
                   rng_impl=config.get("tpu", {}).get("rng_impl"))
    em = config["emotion"]
    wandb = get_wandb(config["logging"].get("wandb_mode", "disabled"))
    wandb.init(project="nrse-emotion-categorical", config=config,
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
    sample_batch = {
        "input_values": jnp.zeros((bs, t)),
        "attention_mask": jnp.ones((bs, t)),
    }
    optimizer = make_emotion_optimizer(
        em.get("learning_rate", 1e-4), em.get("weight_decay", 1e-4)
    )
    state = create_emotion_state(model, rng, sample_batch, optimizer)

    encoder_params = load_pretrained_encoder(config, jnp.zeros((2, t)))
    if encoder_params is not None:
        state = EmotionTrainState(
            params=load_encoder_into_classifier(state.params, encoder_params),
            opt_state=state.opt_state, step=state.step, rng=state.rng,
        )

    class_weights = None
    if em.get("use_class_weights", True):
        class_weights = compute_class_weights(
            train_loader.dataset.class_counts(), num_classes=8
        )
        logger.info(f"class weights: {class_weights}")

    num_layers = enc_cfg.num_hidden_layers
    train_step = make_emotion_train_step(model, optimizer, "categorical",
                                         num_layers)
    eval_step = make_emotion_eval_step(model, "categorical")

    cw = jnp.asarray(class_weights) if class_weights is not None else None
    frozen_scale = layer_gradient_scale(num_layers, [])
    place_batch, place_state = make_batch_placer(config, bs)
    state = place_state(state)

    def run_phase(phase: str, epochs: int, lr0: float, state,
                  unfreeze_schedule=None, best_name: str = "best_classifier_model",
                  rest_scale: float = 0.0):
        plateau = ReduceLROnPlateau(
            lr0, mode="max", factor=0.5,
            patience=em.get("scheduler_patience", 2),
        )
        best_f1, patience_left = -1.0, em.get("patience", 3)
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
                state, metrics = train_step(state, jbatch, cw, scale,
                                            jnp.float32(lr),
                                            jnp.float32(rest_scale))
                step_losses.append(metrics["loss"])  # device-side until epoch end
            epoch_loss = float(jnp.mean(jnp.stack(step_losses))) \
                if step_losses else 0.0
            n = len(step_losses)
            val_loss, f1, cm, report = _validate(
                model, state.params, val_loader, eval_step, class_weights,
                place_batch,
            )
            lr = plateau.step(f1)
            log = {f"{phase}/train_loss": epoch_loss,
                   f"{phase}/val_loss": val_loss, f"{phase}/val_f1": f1,
                   f"{phase}/lr": lr, "epoch": epoch}
            wandb.log(log)
            print(f"[{phase}] epoch {epoch+1}/{epochs} "
                  f"train_loss={epoch_loss:.4f} val_loss={val_loss:.4f} "
                  f"macro_f1={f1:.4f} lr={lr:.2e}")
            if f1 > best_f1:
                best_f1 = f1
                patience_left = em.get("patience", 3)
                save_checkpoint(ckpt_dir, best_name, state,
                                {"epoch": epoch, "f1": f1, "phase": phase})
                cm_path = os.path.join(log_dir, "val_confusion_matrix.png")
                plot_confusion_matrix(
                    cm, [EMOTION_NAMES[i] for i in range(8)],
                    filename=cm_path, title="Validation Confusion Matrix",
                )
                wandb.log({"val_confusion_matrix": wandb.Image(cm_path)})
            else:
                patience_left -= 1
                if patience_left <= 0:
                    print(f"[{phase}] early stopping at epoch {epoch+1}")
                    break
        return state, best_f1

    # Phase 1 — frozen encoder
    state, best_f1 = run_phase(
        "classifier", em.get("classifier_epochs", 20),
        em.get("learning_rate", 1e-4), state,
    )

    # Phase 2 — unfreeze fine-tuning.  gradual_unfreeze=True (default) is
    # the reference src-trainer schedule (top→bottom over the phase,
    # categorical_emotions.py:206-226); False unfreezes every layer from
    # epoch 0 — the reference's *baseline e2e* config (run_train_e2e.sh
    # --freeze_ssl=False trains all params from step 0), the one its
    # headline flat clean→snr4 row was measured with (dev.ipynb cell 52).
    if em.get("unfreeze_encoder", False):
        restored, _ = restore_checkpoint(ckpt_dir, "best_classifier_model", state)
        state = restored
        if em.get("gradual_unfreeze", True):
            schedule = lambda e, total: gradually_unfrozen_layers(  # noqa: E731
                e, total, num_layers)
            full_encoder = False
        else:
            schedule = lambda e, total: list(range(num_layers))  # noqa: E731
            # gradual_unfreeze=False IS --freeze_ssl=False: the reference
            # baseline gives EVERY ssl parameter an optimizer, conv
            # frontend included (train_ft_cat_ser_weighted_checkpoint.py:
            # 209-214) — not just the layer.{i} groups
            full_encoder = True
        full_encoder = bool(em.get("train_full_encoder", full_encoder))
        state, best_f1_ft = run_phase(
            "fine_tune", em.get("fine_tuning_epochs", 10),
            em.get("fine_tuning_lr", 5e-6), state,
            unfreeze_schedule=schedule,
            best_name="best_fine_tuned_model",
            rest_scale=1.0 if full_encoder else 0.0,
        )
        best_f1 = max(best_f1, best_f1_ft)

    wandb.finish()
    return {"best_f1": best_f1}
