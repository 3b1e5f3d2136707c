"""Baseline SER fine-tune (Odyssey-2024 challenge pipeline equivalent).

Capability parity with ``baseline/train_ft_cat_ser_weighted_checkpoint.py``:
  * class weights ``total/(K·freq)`` from a one-hot label CSV (``:73-94``);
  * corpus z-norm stats computed on train and pickled to
    ``train_norm_stat.pkl`` (``:100-111``);
  * optional BYOL-checkpoint encoder init (the torch version remaps
    ``online_encoder.model.*`` keys, ``:138-160`` — here the orbax BYOL
    checkpoint's online-encoder subtree drops straight in);
  * frozen-SSL or end-to-end training (``--freeze_ssl``), weighted CE,
    gradient accumulation (``:226-241`` → ``optax.MultiSteps``);
  * best-dev-loss checkpointing of the full ssl/pool/ser pipeline
    (``final_model`` ≙ the torch trio ``final_{ssl,pool,ser}.pt``).

One-hot label CSV format (produced by
``nrse_tpu.labels.parsing.emotion_to_one_hot`` tooling): columns
``FileName, A, S, H, U, F, D, C, N [, Split_Set]``.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from nrse_tpu.audio.io import load_audio
from nrse_tpu.baseline.pipeline import BaselineSER
from nrse_tpu.baseline.wavset import LogManager, WavNormStats
from nrse_tpu.labels.parsing import BASELINE_EMOTIONS_MAP
from nrse_tpu.models.wavlm import WavLMConfig
from nrse_tpu.train.losses import ce_weight_category
from nrse_tpu.utils.logging_utils import logger

ONE_HOT_COLUMNS = list(BASELINE_EMOTIONS_MAP.keys())  # A,S,H,U,F,D,C,N


def load_onehot_labels(label_path: str, split: Optional[str] = None
                       ) -> Tuple[List[str], np.ndarray]:
    import pandas as pd

    df = pd.read_csv(label_path)
    if split and "Split_Set" in df.columns:
        df = df[df["Split_Set"] == split]
    files = df["FileName"].tolist()
    labels = df[ONE_HOT_COLUMNS].to_numpy(np.float32)
    return files, labels


def class_weights_from_onehot(labels: np.ndarray) -> np.ndarray:
    """``total / (K · freq)`` (reference ``:73-94``)."""
    k = labels.shape[1]
    freq = labels.sum(axis=0)
    total = labels.sum()
    weights = np.where(freq > 0, total / (k * np.maximum(freq, 1)), 1.0)
    return weights.astype(np.float32)


def _load_wav(path: str, max_samples: int, rng: np.random.Generator
              ) -> Optional[Tuple[np.ndarray, int]]:
    try:
        wav, sr = load_audio(path)
        if wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        if sr != 16000:
            from nrse_tpu.audio.resample import resample

            wav = resample(wav, sr, 16000)
        w = wav[0]
        if len(w) > max_samples:
            start = int(rng.integers(0, len(w) - max_samples + 1))
            w = w[start : start + max_samples]
        return w.astype(np.float32), len(w)
    except Exception as e:
        logger.error(f"Error loading audio file {path}: {e}")
        return None


class BaselineWavDataset:
    """Fixed-shape z-normed waveform batches from a one-hot label CSV."""

    def __init__(self, wav_dir: str, files: List[str], labels: np.ndarray,
                 stats: WavNormStats, max_seconds: float = 10.0):
        self.wav_dir = wav_dir
        self.files = files
        self.labels = labels
        self.stats = stats
        self.max_samples = int(max_seconds * 16000)

    def __len__(self):
        return len(self.files)

    def sample(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        path = os.path.join(self.wav_dir, self.files[idx])
        loaded = _load_wav(path, self.max_samples, rng)
        if loaded is None:
            wav, n = np.full(self.max_samples, 1e-6, np.float32), self.max_samples
        else:
            wav, n = loaded
        x = np.zeros(self.max_samples, np.float32)
        x[:n] = self.stats.apply(wav[:n])
        mask = np.zeros(self.max_samples, np.float32)
        mask[:n] = 1.0
        return {
            "input_values": x,
            "attention_mask": mask,
            "label": self.labels[idx].argmax().astype(np.int32),
        }


def train(config_path: str = "config_cat_noisy.json",
          model_path: str = "baseline_model",
          epochs: int = 10, batch_size: int = 32,
          accumulation_steps: int = 4, lr: float = 5e-6,
          freeze_ssl: bool = True, head_dim: int = 1024,
          pooling_type: str = "AttentiveStatisticsPooling",
          byol_checkpoint: Optional[str] = None,
          model_name: str = "microsoft/wavlm-large",
          max_seconds: float = 10.0,
          train_split: str = "Train", dev_split: str = "Development",
          num_workers: int = 8, seed: int = 7) -> Dict:
    import jax
    import jax.numpy as jnp
    import optax

    from nrse_tpu.data.loader import HostDataLoader
    from nrse_tpu.train.checkpoint import save_checkpoint

    assert pooling_type == "AttentiveStatisticsPooling", pooling_type
    with open(config_path) as f:
        cfg_json = json.load(f)
    wav_dir, label_path = cfg_json["wav_dir"], cfg_json["label_path"]
    os.makedirs(model_path, exist_ok=True)

    train_files, train_labels = load_onehot_labels(label_path, train_split)
    dev_files, dev_labels = load_onehot_labels(label_path, dev_split)
    weights = class_weights_from_onehot(train_labels)
    print("class weights:", weights)

    # corpus z-norm stats from (a sample of) the train wavs
    stat_path = os.path.join(model_path, "train_norm_stat.pkl")
    if os.path.exists(stat_path):
        stats = WavNormStats.load(stat_path)
    else:
        rng = np.random.default_rng(seed)
        sample_files = train_files[: min(len(train_files), 2000)]
        wavs = (w[0] for w in
                (_load_wav(os.path.join(wav_dir, f), 10**9, rng)
                 for f in sample_files) if w is not None)
        stats = WavNormStats.from_waveforms(wavs)
        stats.save(stat_path)
    print(f"norm stats: mean={stats.mean:.6f} std={stats.std:.6f}")

    enc_cfg = WavLMConfig.from_model_name(
        model_name,
        dtype=jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32,
        remat=True,
    )
    model = BaselineSER(enc_cfg, head_dim=head_dim)
    t = int(max_seconds * 16000)
    params = model.init(
        {"params": jax.random.PRNGKey(seed)},
        jnp.zeros((2, t)), jnp.ones((2, t)),
    )["params"]

    if byol_checkpoint:
        from nrse_tpu.train.categorical_emotions import load_pretrained_encoder

        enc = load_pretrained_encoder(
            {"model": {"name": model_name}, "tpu": {},
             "emotion": {"encoder_checkpoint": byol_checkpoint}},
            jnp.zeros((2, t)),
        )
        if enc is not None:
            params = {**params, "ssl": enc}

    base_opt = optax.adamw(lr)
    optimizer = optax.MultiSteps(base_opt, every_k_schedule=accumulation_steps)
    opt_state = optimizer.init(params)

    train_ds = BaselineWavDataset(wav_dir, train_files, train_labels, stats,
                                  max_seconds)
    dev_ds = BaselineWavDataset(wav_dir, dev_files, dev_labels, stats,
                                max_seconds)
    train_loader = HostDataLoader(train_ds, np.arange(len(train_ds)),
                                  batch_size, shuffle=True, seed=seed,
                                  num_workers=num_workers, drop_last=True)
    dev_loader = HostDataLoader(dev_ds, np.arange(len(dev_ds)), batch_size,
                                shuffle=False, seed=seed,
                                num_workers=num_workers, drop_last=False)

    w = jnp.asarray(weights)

    def loss_fn(params, batch, rng):
        logits = model.apply(
            {"params": params}, batch["input_values"],
            batch["attention_mask"], deterministic=False,
            rngs={"dropout": rng, "layerdrop": jax.random.fold_in(rng, 1),
                  "spec_augment": jax.random.fold_in(rng, 2)},
        )
        return ce_weight_category(logits, batch["label"], w)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        if freeze_ssl:
            grads = {**grads, "ssl": jax.tree.map(jnp.zeros_like, grads["ssl"])}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def dev_step(params, batch):
        logits = model.apply({"params": params}, batch["input_values"],
                             batch["attention_mask"], deterministic=True)
        return ce_weight_category(logits, batch["label"], w)

    lm = LogManager()
    lm.alloc_stat_type_list(["train_loss", "dev_loss"])
    root = jax.random.PRNGKey(seed)
    best_dev, best_epoch = float("inf"), -1
    step = 0
    for epoch in range(epochs):
        lm.init_stat()
        for batch in train_loader:
            batch.pop("__count__", None)
            jbatch = jax.tree.map(jnp.asarray, batch)
            params, opt_state, loss = train_step(
                params, opt_state, jbatch, jax.random.fold_in(root, step)
            )
            lm.add_stat("train_loss", float(loss))
            step += 1
        for batch in dev_loader:
            count = int(batch.pop("__count__", batch_size))
            jbatch = jax.tree.map(jnp.asarray, batch)
            lm.add_stat("dev_loss", float(dev_step(params, jbatch)))
        train_loss, dev_loss = lm.get_stat("train_loss"), lm.get_stat("dev_loss")
        print(f"epoch {epoch+1}/{epochs}: train_loss={train_loss:.4f} "
              f"dev_loss={dev_loss:.4f}")
        if dev_loss < best_dev:
            best_dev, best_epoch = dev_loss, epoch
            save_checkpoint(model_path, "final_model", {"params": params},
                            {"epoch": epoch, "dev_loss": dev_loss,
                             "freeze_ssl": freeze_ssl})
            print(f"saved final_model (dev_loss={dev_loss:.4f})")
    return {"best_dev_loss": best_dev, "best_epoch": best_epoch}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="config_cat_noisy.json")
    parser.add_argument("--model_path", default="baseline_model")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--accumulation_steps", type=int, default=4)
    parser.add_argument("--lr", type=float, default=5e-6)
    parser.add_argument("--freeze_ssl", type=lambda s: s.lower() != "false",
                        default=True)
    parser.add_argument("--head_dim", type=int, default=1024)
    parser.add_argument("--pooling_type", default="AttentiveStatisticsPooling")
    parser.add_argument("--byol_checkpoint", default=None)
    parser.add_argument("--model_name", default="microsoft/wavlm-large")
    parser.add_argument("--max_seconds", type=float, default=10.0)
    args = parser.parse_args(argv)
    return train(args.config, args.model_path, args.epochs, args.batch_size,
                 args.accumulation_steps, args.lr, args.freeze_ssl,
                 args.head_dim, args.pooling_type, args.byol_checkpoint,
                 args.model_name, args.max_seconds)


if __name__ == "__main__":
    main()
