"""Task losses and class weighting for the SER trainers.

Formula parity with the reference:
  * ``compute_class_weights`` — ``(total / (count·K))^1.5`` boosted rare-class
    weights (``src/train/categorical_emotions.py:432-443``).
  * ``ce_weight_category`` — weighted cross-entropy that masks invalid labels
    (<0 or ≥K) instead of using ignore_index; zero loss when no valid labels
    (``categorical_emotions.py:453-483``).  Weighted-mean semantics match
    torch ``CrossEntropyLoss(weight=w)``: ``Σ w_yi·ce_i / Σ w_yi``.
  * ``focal_loss`` — the reference's unused experiment, kept for parity
    (``categorical_emotions.py:446-451``).
  * ``ccc_loss`` — per-dimension ``1 − 2cov/(σp²+σt²+(μp−μt)²+1e-10)``
    averaged over A/V/D; zero when batch ≤ 1
    (``src/train/dimentional_emotions.py:427-450``).
  * ``compute_ccc`` — numpy CCC for epoch metrics (``:453-465``).

All jnp versions are pure and jit-able (they run inside the fused task
steps); numpy versions serve host-side epoch aggregation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_class_weights(label_counts: Dict[int, int], num_classes: int,
                          exponent: float = 1.5) -> np.ndarray:
    """Rare-class-boosted weights from a {class: count} mapping."""
    weights = np.ones(num_classes, dtype=np.float32)
    total = float(sum(label_counts.values()))
    for cls, cnt in label_counts.items():
        if 0 <= cls < num_classes and cnt > 0:
            weights[cls] = (total / (cnt * num_classes)) ** exponent
    return weights


def ce_weight_category(logits, labels, weights=None) -> jnp.ndarray:
    """Masked weighted cross-entropy (invalid labels contribute nothing)."""
    num_classes = logits.shape[-1]
    valid = (labels >= 0) & (labels < num_classes)
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(
        log_probs, safe_labels[:, None], axis=-1
    )[:, 0]
    if weights is not None:
        w = jnp.asarray(weights, jnp.float32)[safe_labels]
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(jnp.float32)
    denom = jnp.sum(w)
    return jnp.where(denom > 0, jnp.sum(nll * w) / jnp.maximum(denom, 1e-9), 0.0)


def focal_loss(logits, labels, gamma: float = 2.0, alpha=None) -> jnp.ndarray:
    """Focal loss (unweighted mean over the batch, torch-parity)."""
    num_classes = logits.shape[-1]
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(log_probs, safe_labels[:, None], axis=-1)[:, 0]
    if alpha is not None:
        ce = ce * jnp.asarray(alpha, jnp.float32)[safe_labels]
    pt = jnp.exp(-ce)
    return jnp.mean((1 - pt) ** gamma * ce)


def ccc_loss(predictions, targets, eps: float = 1e-10) -> jnp.ndarray:
    """Mean (1 − CCC) over the last-axis dimensions (A, V, D)."""
    p = predictions.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    batch = p.shape[0]
    mean_p = jnp.mean(p, axis=0)
    mean_t = jnp.mean(t, axis=0)
    var_p = jnp.var(p, axis=0)
    var_t = jnp.var(t, axis=0)
    covar = jnp.mean((p - mean_p) * (t - mean_t), axis=0)
    ccc = 2 * covar / (var_p + var_t + (mean_p - mean_t) ** 2 + eps)
    loss = jnp.mean(1.0 - ccc)
    # reference guard: zero loss for batch ≤ 1 (dimentional_emotions.py:434)
    return jnp.where(batch > 1, loss, 0.0)


def compute_ccc(predictions: np.ndarray, targets: np.ndarray,
                eps: float = 1e-10) -> float:
    """Host-side CCC for epoch metrics (numpy, reference ``:453-465``)."""
    p = np.asarray(predictions, np.float64)
    t = np.asarray(targets, np.float64)
    covar = np.mean((p - p.mean()) * (t - t.mean()))
    return float(
        2 * covar / (p.var() + t.var() + (p.mean() - t.mean()) ** 2 + eps)
    )
