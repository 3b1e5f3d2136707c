"""Jitted BYOL training/eval steps.

Capability parity with the reference hot loop (``train_byol.py:20-79``:
forward → ``byol_loss`` → backward → clip-norm 1.0 → AdamW step → explicit
EMA target update → cosine LR step per batch) and the validation pass
(``evaluate_byol.py:68-123``).

TPU-native design:
  * ONE jitted, donated ``train_step`` fuses: on-device SNR mixing +
    normalisation of the two views, both tower forwards, backward, optax
    update, and the EMA lerp.  The reference runs EMA as a Python loop over
    tensors every step (``byol.py:62-73``) and mixes audio in DataLoader
    workers; here both are part of the compiled program.
  * The validation step computes loss AND clean↔noisy cosine similarity in
    a single fused pass — the reference runs two full forward passes over
    the val set per epoch (SURVEY.md §3.1 flags the redundancy).
  * Per-step RNG is derived by folding the step counter into a root key —
    reproducible, resume-safe, no host RNG traffic.
  * All-reduce of grads / global BatchNorm stats over the ``data`` mesh axis
    is implicit: the step is jitted over sharded-batch inputs (GSPMD).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nrse_tpu.audio.augment import make_byol_views
from nrse_tpu.models.byol import (
    BYOLSpeechModel,
    BYOLVariables,
    byol_loss,
    byol_loss_per_sample,
)


@dataclasses.dataclass
class BYOLTrainState:
    """Everything the train step carries (a pytree; donated every step)."""

    variables: BYOLVariables
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    rng: jnp.ndarray   # root PRNG key


jax.tree_util.register_dataclass(
    BYOLTrainState,
    data_fields=["variables", "opt_state", "step", "rng"],
    meta_fields=[],
)


def create_train_state(model: BYOLSpeechModel, rng, sample_input,
                       optimizer) -> BYOLTrainState:
    variables = model.init(rng, sample_input)
    opt_state = optimizer.init(variables.online["params"])
    return BYOLTrainState(
        variables=variables,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def _step_rngs(root, step):
    base = jax.random.fold_in(root, step)
    names = ("dropout", "layerdrop", "spec_augment")
    return {n: jax.random.fold_in(base, i) for i, n in enumerate(names)}


def make_byol_train_step(
    model: BYOLSpeechModel,
    optimizer: optax.GradientTransformation,
    on_device_mixing: bool = True,
    donate: bool = True,
    fused_optimizer: Optional[Any] = None,
) -> Callable[[BYOLTrainState, Dict[str, Any]], Tuple[BYOLTrainState, Dict[str, Any]]]:
    """Build the fused train step.

    Batch formats:
      * raw (``on_device_mixing=True``): ``{"clean": [B,T], "noise": [B,T],
        "snr": [B]}`` — views are built on device (mix → peak-norm → z-norm,
        ``noisy_speech_dataset.py:54-148`` semantics).
      * pre-featurised: ``{"clean_input_values", "noisy_input_values"}``.

    ``fused_optimizer`` (a ``FusedAdamWSpec``) replaces the optax update +
    EMA lerp with the single-HBM-pass Pallas kernel
    (``ops/fused_optimizer.py``); ``optimizer`` still defines the
    checkpointed state layout, which the fused path preserves.
    """

    def train_step(state: BYOLTrainState, batch: Dict[str, Any]):
        rngs = _step_rngs(state.rng, state.step)

        if on_device_mixing:
            clean_views, noisy_views, valid = make_byol_views(
                batch["clean"], batch["noise"], batch["snr"]
            )
        else:
            clean_views = batch["clean_input_values"]
            noisy_views = batch["noisy_input_values"]
            valid = jnp.ones((clean_views.shape[0],), bool)

        def loss_fn(online_params):
            variables = BYOLVariables(
                online={**state.variables.online, "params": online_params},
                target=state.variables.target,
            )
            pred, proj, new_vars = model.apply(
                variables, clean_views, noisy_views,
                deterministic=False, rngs=rngs,
            )
            # invalid mixes (degenerate power / exploding scale) produce a
            # 'noisy' view identical to the clean one — mask them out of the
            # loss rather than training on a collapsed pair
            loss = byol_loss(pred, proj, weights=valid)
            return loss, new_vars

        (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.variables.online["params"]
        )
        grad_norm = optax.global_norm(grads)

        if fused_optimizer is not None:
            from nrse_tpu.ops.fused_optimizer import fused_adamw_ema_update

            # optimizer step + EMA lerp in one Pallas HBM pass per leaf;
            # EMA order matches the XLA branch (after the update,
            # reference train_byol.py:67-71)
            new_online_params, new_opt_state, new_target_params = \
                fused_adamw_ema_update(
                    grads, state.variables.online["params"],
                    state.opt_state, new_vars.target["params"],
                    fused_optimizer, grad_norm=grad_norm,
                )
            new_vars = BYOLVariables(
                online={**new_vars.online, "params": new_online_params},
                target={**new_vars.target, "params": new_target_params},
            )
        else:
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.variables.online["params"]
            )
            new_online_params = optax.apply_updates(
                state.variables.online["params"], updates
            )
            new_vars = BYOLVariables(
                online={**new_vars.online, "params": new_online_params},
                target=new_vars.target,
            )
            # EMA after the optimizer step — reference order
            # (train_byol.py:67-71)
            new_vars = model.ema_update(new_vars)

        new_state = BYOLTrainState(
            variables=new_vars,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=state.rng,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "valid_fraction": jnp.mean(valid.astype(jnp.float32)),
            # on-device health flag (replaces the reference's per-batch host
            # NaN sweeps, debugging_utils.py:4-30 / train_byol.py:52-59)
            "finite": jnp.isfinite(loss) & jnp.isfinite(grad_norm),
        }
        return new_state, metrics

    # Buffer donation halves peak HBM on TPU; on the (virtual multi-device)
    # CPU backend it deadlocks XLA's collective rendezvous — auto-disable.
    if jax.default_backend() == "cpu":
        donate = False
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_byol_eval_step(model: BYOLSpeechModel,
                        on_device_mixing: bool = True):
    """Fused validation step: BYOL loss + per-sample clean↔noisy cosine
    similarity of the (pooled) encoder embeddings in ONE pass.

    Parity: ``evaluate_byol.py:12-66`` (similarity) + ``:95-107`` (loss),
    minus the duplicated forward.
    """

    def eval_step(state: BYOLTrainState, batch: Dict[str, Any]):
        if on_device_mixing:
            clean_views, noisy_views, _ = make_byol_views(
                batch["clean"], batch["noise"], batch["snr"]
            )
        else:
            clean_views = batch["clean_input_values"]
            noisy_views = batch["noisy_input_values"]

        # Three encoder forwards, each used once: online(clean) feeds both
        # the predictor branch and the similarity; target(noisy) feeds the
        # loss's projection.  A device profile of the compiled step shows
        # exactly 3 encoder scans at 224.5 ms busy/step (bs 36) — and the
        # same 0.225 s/step for the naive model.apply + 2×model.encode
        # formulation, i.e. XLA already CSE'd the duplicated online(clean)
        # scan there.  The explicit dedup is kept for trace clarity (no
        # reliance on the CSE pass) and is equal to the naive formulation
        # to f32 ulp (tests/test_eval_byol.py pins the closeness).
        _, clean_emb = model.encode(state.variables, clean_views,
                                    deterministic=True)
        _, noisy_emb = model.encode(state.variables, noisy_views,
                                    deterministic=True)
        pred, _ = model.online_heads(state.variables, clean_emb,
                                     deterministic=True)
        _, tgt_pooled = model.encode_target(state.variables, noisy_views,
                                            deterministic=True)
        proj = jax.lax.stop_gradient(
            model.target_projector(state.variables, tgt_pooled,
                                   deterministic=True)
        )
        # per-sample [B] so the host can slice off loader padding rows
        # (ragged final batches repeat the last item) before averaging
        loss = byol_loss_per_sample(pred, proj)

        c = clean_emb / jnp.maximum(
            jnp.linalg.norm(clean_emb, axis=1, keepdims=True), 1e-10
        )
        n = noisy_emb / jnp.maximum(
            jnp.linalg.norm(noisy_emb, axis=1, keepdims=True), 1e-10
        )
        similarity = jnp.sum(c * n, axis=1)  # [B]
        return loss, similarity

    return jax.jit(eval_step)


def make_byol_embed_step(model: BYOLSpeechModel,
                         on_device_mixing: bool = True):
    """Jitted (state, batch) → (clean_emb, noisy_emb) pooled embeddings.

    Used by the t-SNE visualisation path; jitted so sharded multi-device
    execution stays inside one compiled program (eager ops on sharded
    arrays issue per-op collectives — slow on TPU, deadlock-prone on
    virtual CPU meshes)."""

    def embed_step(state: BYOLTrainState, batch: Dict[str, Any]):
        if on_device_mixing:
            clean_views, noisy_views, _ = make_byol_views(
                batch["clean"], batch["noise"], batch["snr"]
            )
        else:
            clean_views = batch["clean_input_values"]
            noisy_views = batch["noisy_input_values"]
        _, clean_emb = model.encode(state.variables, clean_views,
                                    deterministic=True)
        _, noisy_emb = model.encode(state.variables, noisy_views,
                                    deterministic=True)
        return clean_emb, noisy_emb

    return jax.jit(embed_step)
