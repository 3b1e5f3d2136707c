"""Optimizers and LR schedules.

Replaces the reference's torch optimizer stack (``train_byol.py:143-150``:
AdamW(lr=1e-5, wd=1e-5) + per-step CosineAnnealingLR(T_max=total_steps) +
grad-clip 1.0 at ``train_byol.py:67``) with the optax equivalents.  The
whole chain runs *inside* the jitted train step — no per-step host work.
"""

from __future__ import annotations

import optax


def cosine_annealing(base_lr: float, total_steps: int, eta_min: float = 0.0):
    """torch ``CosineAnnealingLR`` equivalent (per-step, eta_min floor)."""
    return optax.cosine_decay_schedule(
        init_value=base_lr,
        decay_steps=max(1, total_steps),
        alpha=eta_min / base_lr if base_lr else 0.0,
    )


def make_byol_optimizer(learning_rate, weight_decay: float = 1e-5,
                        total_steps: int = 0, clip_norm: float = 1.0,
                        mu_dtype=None):
    """clip-by-global-norm → AdamW with cosine schedule.

    ``learning_rate`` may be a float (constant) or a schedule; when
    ``total_steps`` > 0 a cosine annealing schedule is built from the float,
    matching the reference's per-batch ``scheduler.step()``.
    ``mu_dtype=bfloat16`` halves the first-moment memory (the smooth EMA
    tolerates bf16; second moments stay f32).
    """
    schedule = learning_rate
    if total_steps and not callable(learning_rate):
        schedule = cosine_annealing(learning_rate, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay, mu_dtype=mu_dtype),
    )


def make_emotion_optimizer(learning_rate, weight_decay: float = 1e-4,
                           clip_norm: float = 1.0):
    """clip-by-global-norm → AdamW for the SER trainers (reference clips all
    grads to max_norm=1.0 every step, ``categorical_emotions.py:330`` /
    ``dimentional_emotions.py:337``, optimizer at ``categorical_emotions.py:84``).
    The ReduceLROnPlateau behaviour lives host-side in the trainer (it is
    metric-driven), feeding this optimizer through ``optax.inject_hyperparams``.
    """
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        ),
    )


def set_injected_learning_rate(opt_state, learning_rate) -> bool:
    """Write ``learning_rate`` into the (possibly chain-nested)
    ``inject_hyperparams`` state in place.

    Returns whether a hyperparams node was found; raises if none was —
    a silent no-op would freeze the LR at its init value for the whole
    run (e.g. after wrapping the optimizer in ``optax.masked`` /
    ``multi_transform``, which changes the state tree shape).
    """

    def walk(state) -> bool:
        found = False
        if hasattr(state, "hyperparams"):
            state.hyperparams["learning_rate"] = learning_rate
            found = True
        # keep descending even after a hit: with NESTED inject_hyperparams
        # states (e.g. inject(chain(inject(adamw)))) every level must be
        # updated or the inner LR silently stays frozen at its init value
        if isinstance(state, tuple):
            found = any([walk(sub) for sub in state]) or found
        return found

    if not walk(opt_state):
        raise ValueError(
            "no inject_hyperparams state found in the optimizer state tree "
            "— the per-epoch LR schedule would be silently ignored"
        )
    return True
