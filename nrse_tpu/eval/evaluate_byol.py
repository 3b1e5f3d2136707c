"""BYOL validation: loss + per-SNR similarity + t-SNE visualisation.

Capability parity with reference ``evaluate_byol.py``:
  * ``evaluate_embedding_similarity`` (``:12-66``): mean clean↔noisy cosine
    similarity of encoder embeddings, bucketed per SNR.
  * ``validate_model`` (``:68-123``): full-val loss + similarity metrics —
    the reference runs TWO full forward passes; here one fused jitted pass
    produces both (SURVEY.md §3.1 redundancy fix).
  * ``visualize_embeddings`` (``:126-213``): t-SNE scatter of clean vs
    per-SNR noisy embeddings saved as PNG (host-side sklearn/matplotlib).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from nrse_tpu.train.byol_trainer import make_byol_eval_step
from nrse_tpu.utils.logging_utils import logger


def _local_rows(x) -> np.ndarray:
    """Fetch an eval output to host: this process's rows of a global array
    (multi-host), or the whole array (single-host).

    Shards are sorted by their position in the global array — the order of
    ``addressable_shards`` is a device-enumeration detail, and these rows
    must line up with the host batch (padding-drop slice + SNR bucketing).
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    shards = sorted(
        x.addressable_shards,
        key=lambda s: tuple(sl.start or 0 for sl in s.index),
    )
    return np.concatenate([np.asarray(s.data) for s in shards])


def _run_eval_pass(model, state, dataloader, collect_embeddings: bool = False,
                   max_batches: int = 0, placer=None):
    """Single pass over a loader: losses, per-sample similarity + SNRs.

    ``placer`` (multi-host): assembles the per-process host batch into
    global mesh-sharded arrays; outputs are then sliced back to this
    process's rows, and the caller aggregates means across processes.
    """
    import jax

    from nrse_tpu.train.byol_trainer import make_byol_embed_step

    eval_step = make_byol_eval_step(model)
    embed_step = make_byol_embed_step(model) if collect_embeddings else None
    losses, sims, snrs = [], [], []
    embeddings = []
    for i, batch in enumerate(dataloader):
        if max_batches and i >= max_batches:
            break
        count = int(batch.pop("__count__", len(batch["snr"])))
        jbatch = placer(batch) if placer is not None else \
            jax.tree.map(jax.numpy.asarray, batch)
        loss, sim = eval_step(state, jbatch)
        losses.append(_local_rows(loss)[:count])  # drop loader padding rows
        sims.append(_local_rows(sim)[:count])
        snrs.append(np.asarray(batch["snr"])[:count])
        if embed_step is not None:
            ce, ne = embed_step(state, jbatch)
            embeddings.append(
                (_local_rows(ce)[:count], _local_rows(ne)[:count])
            )
    return losses, np.concatenate(sims), np.concatenate(snrs), embeddings


def evaluate_embedding_similarity(model, state, dataloader, config
                                  ) -> Dict[float, float]:
    """Per-SNR mean similarity (reference ``evaluate_byol.py:12-66``)."""
    _, sims, snrs, _ = _run_eval_pass(model, state, dataloader)
    out = {}
    for snr in config["data"]["snr_range"]:
        mask = snrs == float(snr)
        out[snr] = float(sims[mask].mean()) if mask.any() else 0.0
    return out


def validate_model(model, state, val_loader, config,
                   placer=None) -> Tuple[float, Dict]:
    """Fused loss + similarity validation (reference ``:68-123``)."""
    losses, sims, snrs, _ = _run_eval_pass(model, state, val_loader,
                                           placer=placer)
    avg_loss = float(np.concatenate(losses).mean()) if losses else float("inf")
    similarities = {}
    stats = {
        "loss_sum": float(np.concatenate(losses).sum()) if losses else 0.0,
        "loss_cnt": float(sum(len(l) for l in losses)),
    }
    for snr in config["data"]["snr_range"]:
        mask = snrs == float(snr)
        # empty bins are OMITTED (not averaged in as 0.0) so the single-host
        # metric agrees with the multi-host aggregation in train_byol.py —
        # both compute the mean over populated bins only
        if mask.any():
            similarities[snr] = float(sims[mask].mean())
        # raw sums/counts so multi-host aggregation can weight correctly —
        # a process whose shard has an empty SNR bin must not contribute a
        # 0.0 placeholder to the cluster mean (train_byol.py)
        stats[f"snr_{snr}_sum"] = float(sims[mask].sum())
        stats[f"snr_{snr}_cnt"] = float(mask.sum())
    avg_similarity = (
        sum(similarities.values()) / len(similarities) if similarities else 0.0
    )
    metrics = {
        "val_loss": avg_loss,
        "val_avg_similarity": avg_similarity,
        "val_similarities": similarities,
        "val_stats": stats,
    }
    return avg_loss, metrics


def visualize_embeddings(model, state, dataloader, log_dir: str,
                         img_file_name: str, num_samples: int = 100) -> str:
    """t-SNE scatter of clean (o) vs per-SNR noisy (x) embeddings
    (reference ``:126-213``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    batches = max(1, num_samples // max(1, dataloader.batch_size))
    _, _, snrs, embeddings = _run_eval_pass(
        model, state, dataloader, collect_embeddings=True, max_batches=batches
    )
    clean = np.concatenate([c for c, _ in embeddings])
    noisy = np.concatenate([n for _, n in embeddings])
    snrs = snrs[: len(clean)]

    all_emb = np.concatenate([clean, noisy], axis=0)
    perplexity = min(30, max(2, len(all_emb) // 4))
    tsne = TSNE(n_components=2, random_state=42, perplexity=perplexity)
    pts = tsne.fit_transform(all_emb)
    c_pts, n_pts = pts[: len(clean)], pts[len(clean):]

    os.makedirs(log_dir, exist_ok=True)
    plt.figure(figsize=(10, 8))
    plt.scatter(c_pts[:, 0], c_pts[:, 1], marker="o", color="blue",
                alpha=0.7, label="Clean")
    uniq = sorted(set(snrs.tolist()))
    colors = plt.cm.rainbow(np.linspace(0, 1, len(uniq)))
    for color, snr in zip(colors, uniq):
        idx = snrs == snr
        plt.scatter(n_pts[idx, 0], n_pts[idx, 1], marker="x", color=color,
                    alpha=0.7, label=f"Noisy (SNR={int(snr)}dB)")
    plt.title("t-SNE of speech embeddings (clean vs noisy)")
    plt.legend()
    out_path = os.path.join(log_dir, img_file_name)
    plt.savefig(out_path)
    plt.close()
    logger.info(f"Visualization saved to {out_path}")
    return out_path
