"""BYOL convergence evidence run (synthetic corpus, real TPU).

The reference's only recorded convergence evidence is a pasted training log
(dev.ipynb cell 37: val loss 0.2439 / clean-noisy cosine similarity 0.9934
by epoch 4-5 on 151k files).  MSP-Podcast/AudioSet are not present in this
environment, so this tool reproduces the *trajectory shape* on a generated
speech-like corpus (``nrse_tpu/data/synthetic.py``) through the real
``train_byol.main`` entry point — host decode → SNR mixing → fused train
step → fused validation with per-SNR similarity — and saves the curves as
a committed artifact.

Usage:
    python tools/convergence_report.py \
        [--files 6000] [--epochs 8] [--batch 36] [--out docs/convergence]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--files", type=int, default=6000)
    p.add_argument("--noise-files", type=int, default=600)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch", type=int, default=36)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--out", default="docs/convergence")
    p.add_argument("--corpus", default="/tmp/nrse_conv_corpus")
    p.add_argument("--remat", default="attn")
    args = p.parse_args()

    from nrse_tpu.data.synthetic import generate_corpus

    clean_dir, noise_dir = generate_corpus(
        args.corpus, args.files, args.noise_files, args.seconds
    )

    import yaml

    log_dir = "/tmp/nrse_conv_logs"
    os.makedirs(log_dir, exist_ok=True)
    for old in glob.glob(os.path.join(log_dir, "wandb_stub_*.jsonl")):
        os.remove(old)

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "nrse_tpu", "config", "presets", "default_wavlm-large_byol.yaml",
    )
    with open(base) as f:
        config = yaml.safe_load(f)
    config["training"].update({
        "batch_size": args.batch,
        "num_epochs": args.epochs,
        "learning_rate": args.lr,
        "checkpoint_dir": "/tmp/nrse_conv_ckpt",
        "log_dir": log_dir,
        "save_checkpoints": False,
        "early_stopping_patience": args.epochs,  # run the full trajectory
    })
    config["data"].update({
        "clean_data_path": clean_dir,
        "noise_data_path": noise_dir,
        "max_audio_length": args.seconds,
    })
    config["logging"].update({
        "wandb_mode": "offline",       # JSONL stub → our curve source
        "console_level": "WARNING",
        "visualization_interval": max(args.epochs, 2),  # final-epoch t-SNE
    })
    config["tpu"]["remat"] = {
        "true": True, "1": True, "full": True, "false": False, "0": False,
    }.get(str(args.remat).lower(), args.remat)
    cfg_path = "/tmp/nrse_conv_config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    import train_byol

    train_byol.main(["--config", cfg_path])

    # ---- collect the stub's epoch records and render the artifact ----
    stubs = sorted(glob.glob(os.path.join(log_dir, "wandb_stub_*.jsonl")))
    records = []
    for path in stubs:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if "val_loss" in rec:
                    records.append(rec)
    records.sort(key=lambda r: r["epoch"])
    assert records, "no epoch records found in the wandb stub log"

    os.makedirs(args.out, exist_ok=True)
    csv_path = os.path.join(args.out, "convergence.csv")
    snr_keys = sorted(
        (k for k in records[0] if k.startswith("val_similarity_snr_")),
        key=lambda k: float(k.rsplit("_", 1)[1]),
    )
    cols = ["epoch", "train_loss", "val_loss", "val_avg_similarity",
            "audio_sec_per_sec_per_chip"] + snr_keys
    with open(csv_path, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in records:
            f.write(",".join(f"{r.get(c, '')}" for c in cols) + "\n")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = [r["epoch"] + 1 for r in records]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    ax1.plot(epochs, [r["train_loss"] for r in records], "-o",
             label="train loss")
    ax1.plot(epochs, [r["val_loss"] for r in records], "-s",
             label="val loss")
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("BYOL loss (2 − 2·cos)")
    ax1.set_title("BYOL loss")
    ax1.legend()
    ax1.grid(alpha=0.3)
    for k in snr_keys:
        ax2.plot(epochs, [r[k] for r in records], "-o",
                 label=f"SNR {k.rsplit('_', 1)[1]} dB")
    ax2.plot(epochs, [r["val_avg_similarity"] for r in records], "-k",
             lw=2, label="mean")
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("clean↔noisy cosine similarity")
    ax2.set_title("Per-SNR embedding similarity")
    ax2.legend(fontsize=8)
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    png_path = os.path.join(args.out, "convergence.png")
    fig.savefig(png_path, dpi=120)

    first, last = records[0], records[-1]
    md_path = os.path.join(args.out, "README.md")
    with open(md_path, "w") as f:
        f.write(f"""# BYOL convergence evidence (synthetic corpus, real TPU)

Generated by `python tools/convergence_report.py --files {args.files} \
--epochs {args.epochs} --batch {args.batch}`.

The reference's convergence record is a pasted log (dev.ipynb cell 37:
val loss 0.2439, clean-noisy similarity 0.9934 on 151k MSP-Podcast files).
That corpus is unavailable here, so this run substitutes a generated
speech-like corpus ({args.files} clean + {args.noise_files} noise files,
`nrse_tpu/data/synthetic.py`) and exercises the full real pipeline:
`train_byol.main` → host WAV decode → on-device SNR mixing → fused
train step (both towers + backward + AdamW + EMA) → fused validation with
per-SNR similarity.

| metric | epoch 1 | epoch {last['epoch'] + 1} |
|---|---|---|
| train loss | {first['train_loss']:.4f} | {last['train_loss']:.4f} |
| val loss | {first['val_loss']:.4f} | {last['val_loss']:.4f} |
| val avg clean↔noisy similarity | {first['val_avg_similarity']:.4f} | \
{last['val_avg_similarity']:.4f} |
| throughput (audio-sec/sec/chip) | {first['audio_sec_per_sec_per_chip']:.1f} | \
{last['audio_sec_per_sec_per_chip']:.1f} |

Per-epoch data: [convergence.csv](convergence.csv); curves:

![convergence](convergence.png)
""")
    print(json.dumps({"records": len(records),
                      "final_val_loss": last["val_loss"],
                      "final_similarity": last["val_avg_similarity"],
                      "artifact": md_path}))


if __name__ == "__main__":
    main()
