"""Shared machinery for the categorical/dimensional SER trainers.

The reference's two trainers (``src/train/categorical_emotions.py``,
``src/train/dimentional_emotions.py``) share a skeleton: load BYOL
checkpoint → build classifier → freeze encoder → phase-1 classifier
training → optional phase-2 gradual unfreeze with a lower LR; AdamW +
ReduceLROnPlateau; per-epoch validation with task metrics.  This module is
that skeleton, TPU-shaped:

  * ONE jitted task step: on-device z-norm of the waveform, classifier
    forward, masked/weighted loss, backward, *gradient gating* (the JAX
    equivalent of requires_grad freezing — a per-layer 0/1 scale on the
    scanned encoder stack, see ``nrse_tpu/models/emotion.py``), AdamW.
  * The per-layer unfreeze scale and the LR are traced inputs, so the
    gradual-unfreeze schedule and ReduceLROnPlateau never trigger
    recompilation.
  * Eval step returns logits/regressions; F1/CCC/plots aggregate on host.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nrse_tpu.audio.features import zero_mean_unit_var
from nrse_tpu.models.emotion import (
    EmotionClassifier,
    apply_layer_unfreeze_to_grads,
)
from nrse_tpu.train.losses import ccc_loss, ce_weight_category
from nrse_tpu.train.schedules import set_injected_learning_rate


@dataclasses.dataclass
class EmotionTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


jax.tree_util.register_dataclass(
    EmotionTrainState,
    data_fields=["params", "opt_state", "step", "rng"],
    meta_fields=[],
)


def create_emotion_state(model: EmotionClassifier, rng, sample_batch,
                         optimizer) -> EmotionTrainState:
    variables = model.init(
        {"params": rng}, sample_batch["input_values"],
        sample_batch["attention_mask"], "both", True,
    )
    params = variables["params"]
    return EmotionTrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def load_encoder_into_classifier(params, encoder_params):
    """Swap the pre-trained BYOL online-encoder subtree into the classifier
    (reference ``categorical_emotions.py:45-50``: load ckpt → get_encoder)."""
    new = dict(params)
    new["encoder"] = encoder_params
    return new


def make_emotion_train_step(
    model: EmotionClassifier,
    optimizer: optax.GradientTransformation,
    task: str,
    num_layers: int,
) -> Callable:
    """Fused SER train step.

    Traced inputs beyond (state, batch): ``class_weights`` [K] (None for
    dimensional), ``layer_scale`` [L] per-layer encoder gradient gate
    (all-zeros = frozen encoder, phase 1), ``learning_rate`` scalar
    (ReduceLROnPlateau feeds it via ``optax.inject_hyperparams``), and
    ``rest_scale`` — the gate on the NON-layer encoder params (conv
    frontend, pos-conv, projections): 0.0 = reference gradual-unfreeze
    semantics, 1.0 = baseline-e2e ``--freeze_ssl=False`` (every ssl
    param trains, ``train_ft_cat_ser_weighted_checkpoint.py:209-214``).
    """

    def train_step(state: EmotionTrainState, batch: Dict[str, Any],
                   class_weights, layer_scale, learning_rate,
                   rest_scale=0.0):
        rng = jax.random.fold_in(state.rng, state.step)
        rngs = {
            "dropout": rng,
            "layerdrop": jax.random.fold_in(rng, 1),
            "spec_augment": jax.random.fold_in(rng, 2),
        }
        x = zero_mean_unit_var(batch["input_values"])
        mask = batch["attention_mask"]

        def loss_fn(params):
            logits, dims = model.apply(
                {"params": params}, x, mask, task=task,
                deterministic=False, rngs=rngs,
            )
            if task == "categorical":
                loss = ce_weight_category(logits, batch["C"], class_weights)
            elif task == "dimensional":
                targets = jnp.stack(
                    [batch["A"], batch["V"], batch["D"]], axis=1
                )
                loss = ccc_loss(dims, targets)
            else:
                raise ValueError(task)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = apply_layer_unfreeze_to_grads(grads, layer_scale,
                                              rest_scale=rest_scale)

        opt_state = state.opt_state
        # dynamic LR (inject_hyperparams exposes it in the chain state)
        set_injected_learning_rate(opt_state, learning_rate)
        updates, new_opt_state = optimizer.update(
            grads, opt_state, state.params
        )
        # Gate the *updates* too: AdamW's decoupled weight decay would
        # otherwise shrink the "frozen" encoder every step, unlike the
        # reference's requires_grad freezing (frozen params stay
        # bit-identical there).
        updates = apply_layer_unfreeze_to_grads(updates, layer_scale,
                                                rest_scale=rest_scale)
        new_params = optax.apply_updates(state.params, updates)
        new_state = EmotionTrainState(
            params=new_params,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=state.rng,
        )
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return jax.jit(
        train_step,
        donate_argnums=(0,) if jax.default_backend() != "cpu" else (),
    )


def make_emotion_eval_step(model: EmotionClassifier, task: str):
    def eval_step(params, batch):
        x = zero_mean_unit_var(batch["input_values"])
        logits, dims = model.apply(
            {"params": params}, x, batch["attention_mask"],
            task=task, deterministic=True,
        )
        out = {}
        if logits is not None:
            out["logits"] = logits
        if dims is not None:
            out["dims"] = dims
        return out

    return jax.jit(eval_step)


def make_batch_placer(config, batch_size: int):
    """(place_batch, place_state) for data-parallel execution.

    Builds the ``('data','model')`` mesh from ``tpu.mesh``; shards batches on
    'data' and replicates state.  Raises when the batch doesn't divide the
    data axis (same contract as ``train_byol.py``) — silently dropping to
    unsharded execution would hide an 8× slowdown.  SER eval loaders pad
    ragged batches, so a divisible ``batch_size`` is always satisfiable.
    """
    import jax

    from nrse_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    mesh_cfg = config.get("tpu", {}).get("mesh", {"data": -1, "model": 1})
    mesh = make_mesh(mesh_cfg.get("data", -1), mesh_cfg.get("model", 1))
    n_data = mesh.shape["data"]
    if batch_size % n_data != 0:
        raise ValueError(
            f"emotion batch_size={batch_size} must be divisible by the "
            f"mesh 'data' axis ({n_data} devices); adjust batch_size or "
            f"tpu.mesh in the config"
        )

    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    def place_batch(batch):
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), bsh),
                            batch)

    def place_state(state):
        return jax.tree.map(lambda x: jax.device_put(x, rsh), state)

    return place_batch, place_state


class ReduceLROnPlateau:
    """Host-side metric-driven LR schedule (torch parity:
    ``ReduceLROnPlateau(mode, factor=0.5, patience)`` at
    ``categorical_emotions.py:90-95``)."""

    def __init__(self, initial_lr: float, mode: str = "max",
                 factor: float = 0.5, patience: int = 2,
                 min_lr: float = 0.0):
        assert mode in ("min", "max")
        self.lr = initial_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if self.best is None:
            self.best = metric
            return self.lr
        improved = (metric > self.best) if self.mode == "max" else \
            (metric < self.best)
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.min_lr, self.lr * self.factor)
                self.bad_epochs = 0
        return self.lr
