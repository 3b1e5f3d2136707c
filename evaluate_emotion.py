"""Clean-vs-noisy emotion classifier evaluation.

The reference's ``evaluate_emotion.py`` is stale/broken (wrong
``get_config`` call signature, a constructor mismatch, and a dataset key
that never exists — SURVEY.md §2 #24).  This is the *working* realisation of
its intent: evaluate a trained EmotionClassifier checkpoint on clean and
noise-augmented versions of a split and report the accuracy/F1 degradation.

Usage:
    python evaluate_emotion.py --config <yaml> --checkpoint <ckpt_dir/name>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def evaluate(config, checkpoint_path: str, task: str = "categorical"):
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sklearn.metrics import accuracy_score, f1_score

    from nrse_tpu.data.emotion_dataset import create_emotion_dataloaders
    from nrse_tpu.models.emotion import EmotionClassifier
    from nrse_tpu.train.categorical_emotions import _encoder_config_from
    from nrse_tpu.train.checkpoint import restore_checkpoint
    from nrse_tpu.train.emotion_trainer import (
        create_emotion_state,
        make_emotion_eval_step,
    )
    from nrse_tpu.train.losses import compute_ccc
    from nrse_tpu.train.schedules import make_emotion_optimizer

    # persistent compile cache: a readout-only process (no trainer ran, so
    # set_seed never configured it) otherwise pays the full multi-minute
    # tunnel compile for every eval jit
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("NRSE_COMPILE_CACHE", "/tmp/nrse_jax_cache"),
        )

    em = config["emotion"]
    enc_cfg = _encoder_config_from(config)
    model = EmotionClassifier(
        enc_cfg, hidden_dim=em.get("hidden_dim", 1024),
        dropout=em.get("dropout_rate", 0.3), num_emotions=8,
    )
    bs = em["batch_size"]
    t = int(config["data"]["max_audio_length"] * config["data"]["sample_rate"])
    template = create_emotion_state(
        model, jax.random.PRNGKey(0),
        {"input_values": jnp.zeros((bs, t)), "attention_mask": jnp.ones((bs, t))},
        make_emotion_optimizer(1e-4),
    )
    ckpt_dir, name = os.path.split(checkpoint_path.rstrip("/"))
    state, meta = restore_checkpoint(ckpt_dir, name, template)
    print(f"loaded checkpoint {checkpoint_path} (meta: {meta})")
    eval_step = make_emotion_eval_step(model, task)

    def run(add_noise: bool):
        cfg = copy.deepcopy(config)
        cfg["emotion"]["add_noise_during_training"] = add_noise
        _, val_loader = create_emotion_dataloaders(cfg)
        preds, labels, dims, tgts = [], [], [], []
        for batch in val_loader:
            count = int(batch.pop("__count__", bs))
            out = eval_step(state.params, jax.tree.map(jnp.asarray, batch))
            if "logits" in out:
                preds.append(np.asarray(out["logits"])[:count].argmax(-1))
                labels.append(np.asarray(batch["C"])[:count])
            if "dims" in out:
                dims.append(np.asarray(out["dims"])[:count])
                tgts.append(np.stack([np.asarray(batch[k])[:count]
                                      for k in ("A", "V", "D")], 1))
        result = {}
        if preds:
            y_pred = np.concatenate(preds)
            y = np.concatenate(labels)
            valid = (y >= 0) & (y < 8)
            result["accuracy"] = float(accuracy_score(y[valid], y_pred[valid]))
            result["macro_f1"] = float(f1_score(y[valid], y_pred[valid],
                                                average="macro"))
        if dims:
            p = np.concatenate(dims)
            g = np.concatenate(tgts)
            for i, nm in enumerate(("arousal", "valence", "dominance")):
                result[f"ccc_{nm}"] = compute_ccc(p[:, i], g[:, i])
        return result

    clean = run(add_noise=False)
    noisy = run(add_noise=True)
    print("\n=== Emotion robustness report ===")
    print(f"{'metric':<16}{'clean':>10}{'noisy':>10}{'delta':>10}")
    for k in clean:
        d = noisy.get(k, float('nan')) - clean[k]
        print(f"{k:<16}{clean[k]:>10.4f}{noisy.get(k, float('nan')):>10.4f}"
              f"{d:>10.4f}")
    return {"clean": clean, "noisy": noisy}


def main(argv=None):
    from nrse_tpu.config import load_config
    from nrse_tpu.config.config_utils import validate_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="path to an orbax checkpoint dir "
                             "(e.g. ckpts/best_classifier_model)")
    parser.add_argument("--task", default="categorical",
                        choices=["categorical", "dimensional"])
    parser.add_argument("--device", default=None)
    parser.add_argument("--out-json", default=None,
                        help="also write the {clean, noisy} report here "
                             "(lets orchestration run each evaluation in "
                             "its own process — the TPU-tunnel dispatch "
                             "path leaks host RSS, see "
                             "tools/transfer_report.py)")
    args = parser.parse_args(argv)
    config = validate_config(load_config(args.config))
    if args.device:
        config["device"] = args.device

    import jax

    if config.get("device") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    report = evaluate(config, args.checkpoint, args.task)
    if args.out_json:
        import json

        with open(args.out_json, "w") as f:
            json.dump(report, f)
    return report


if __name__ == "__main__":
    main()
