"""BYOL→SER transfer evidence: the reference's HEADLINE claim, end to end.

The reference's whole point (dev.ipynb cell 52) is that BYOL pretraining
(a) lifts downstream SER macro-F1 and (b) flattens the clean→snr4
degradation.  Real MSP-Podcast/AudioSet data is environment-blocked, so this
run reproduces the *full pipeline* on the synthetic regime corpus
(``nrse_tpu/data/synthetic.py``) on the real chip:

  1. BYOL pretrain ``train_byol.main`` on the Train-split audio
     (clean vs SNR-mixed views, WavLM-large, fused TPU step);
  2. SER phase-1 (frozen encoder) through the real trainers — once with the
     BYOL encoder (``emotion.encoder_checkpoint``), once with a random-init
     control — categorical (macro-F1) and dimensional (CCC);
  3. ``evaluate_emotion.evaluate`` readout per model: clean, snr8, snr4
     (eval noise drawn from a *held-out* noise seed, never seen in
     pretraining);
  4. a committed ``docs/transfer_evidence/`` table mirroring the
     reference's results table.

Usage:
    python tools/transfer_report.py [--train 4800] [--dev 960] \
        [--byol-epochs 10] [--ser-epochs 8] [--out docs/transfer_evidence]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "nrse_tpu", "config", "presets",
)


def _load_preset(name):
    import yaml

    with open(os.path.join(PRESETS, name)) as f:
        return yaml.safe_load(f)


def _symlink_split(audio_dir: str, out_dir: str, prefix: str) -> str:
    """Directory of symlinks to one split's WAVs (BYOL must pretrain on the
    Train split only — no self-supervision on eval audio)."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(audio_dir)):
        if name.startswith(prefix):
            dst = os.path.join(out_dir, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(audio_dir, name), dst)
            n += 1
    assert n, f"no {prefix}* files under {audio_dir}"
    return out_dir


def run_byol(clean_dir, noise_dir, ckpt_dir, epochs, batch, smoke=False,
             snr_range=None):
    import yaml

    config = _load_preset("default_wavlm-large_byol.yaml")
    config["training"].update({
        "batch_size": batch, "num_epochs": epochs,
        "checkpoint_dir": ckpt_dir, "log_dir": "/tmp/nrse_transfer_logs",
        "save_checkpoints": True,
        "early_stopping_patience": epochs,
    })
    config["data"].update({
        "clean_data_path": clean_dir, "noise_data_path": noise_dir,
    })
    if snr_range:
        # align pretraining SNRs with the downstream eval points (VERDICT
        # r3 item 3) — the reference's winning run also brackets them
        # (snr_range [2, 20], run_train_e2e.sh model dir "snr2_20")
        config["data"]["snr_range"] = list(snr_range)
    if smoke:
        config["model"]["name"] = "wavlm-tiny"
        config["model"].update({"projection_dim": 32, "prediction_dim": 64})
        config["data"]["max_audio_length"] = 1.0
        config["device"] = "cpu"
        config["tpu"] = {"compute_dtype": "float32", "rng_impl": "threefry2x32",
                         "mesh": {"data": 1, "model": 1}}
    config["logging"].update({
        "wandb_mode": "disabled", "console_level": "WARNING",
        "visualization_interval": epochs + 1,  # skip t-SNE (separate artifact)
    })
    cfg_path = "/tmp/nrse_transfer_byol.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    import train_byol

    train_byol.main(["--config", cfg_path])
    best = os.path.join(ckpt_dir, "best_val_loss")
    assert os.path.isdir(best), f"BYOL produced no checkpoint at {best}"
    return best


def ser_config(preset, labels_csv, audio_dir, noise_dir, encoder_ckpt,
               ckpt_dir, epochs, batch, lr, categorical, smoke=False,
               e2e=False, ft_epochs=0, ft_lr=5e-6, snr_range=None):
    config = _load_preset(preset)
    config["training"]["log_dir"] = "/tmp/nrse_transfer_logs"
    config["logging"].update({"wandb_mode": "disabled",
                              "console_level": "WARNING"})
    config["data"]["noise_data_path"] = noise_dir
    if snr_range:
        config["data"]["snr_range"] = list(snr_range)
    if smoke:
        config["model"]["name"] = "wavlm-tiny"
        config["model"].update({"projection_dim": 32, "prediction_dim": 64})
        config["data"]["max_audio_length"] = 1.0
        config["device"] = "cpu"
        config["emotion"]["hidden_dim"] = 32
        config["tpu"] = {"compute_dtype": "float32",
                         "mesh": {"data": 1, "model": 1}}
    config["emotion"].update({
        "encoder_checkpoint": encoder_ckpt,
        "checkpoint_dir": ckpt_dir,
        "labels_file": labels_csv,
        "audio_dir": audio_dir,
        "train_dataset_split": "Train",
        "validataion_dataset_split": "Development",
        "batch_size": batch,
        "classifier_epochs": epochs,
        "categorical_only": categorical,
        "learning_rate": lr,
    })
    if e2e:
        # the reference's headline flat clean→snr4 row is its *e2e* config
        # (dev.ipynb cell 52): every parameter trainable from step 0
        # (run_train_e2e.sh --freeze_ssl=False) and the SER corpus noisy
        # (config_cat_noisy.json points at the noisy wav dir) — so the e2e
        # leg fine-tunes ALL ssl params (no gradual schedule, conv
        # frontend included — gradual_unfreeze=False sets rest_scale=1.0
        # in the trainer) WITH train-time noise augmentation
        config["emotion"].update({
            "unfreeze_encoder": True,
            "gradual_unfreeze": False,
            "fine_tuning_epochs": ft_epochs,
            "fine_tuning_lr": ft_lr,
            "add_noise_during_training": True,
        })
        # frontend training needs its activations rematted to fit HBM
        # (conv stack residuals, docs/round4_status.md §2); "light" remat
        # for the transformer like the measured SER-bench geometry
        config.setdefault("tpu", {})
        config["tpu"]["frontend_remat"] = True
        if not smoke:
            config["tpu"]["remat"] = "light"
    else:
        config["emotion"].update({
            "unfreeze_encoder": False,       # frozen-encoder transfer readout
            "add_noise_during_training": False,  # train clean; eval noisy
        })
    return config


def robustness_readout(config, ckpt_path, task, eval_noise_dir):
    """clean / snr8 / snr4 metrics via evaluate_emotion, one subprocess
    per evaluation: the TPU-tunnel jit-dispatch path leaks host RSS
    (~2 GB/min measured — the host dataloader itself is clean: 70 MB over
    a full epoch in isolation), so each evaluate() gets a fresh process.
    A larger eval batch cuts the number of tunnel dispatches 4x (and with
    it both the leak and the wall time); results are identical — metrics
    are per-sample and padded rows are sliced off via ``__count__``."""
    import subprocess
    import tempfile

    import yaml

    out = {}
    for snr in (8, 4):
        cfg = copy.deepcopy(config)
        cfg["data"]["noise_data_path"] = eval_noise_dir
        cfg["data"]["snr_range"] = [snr]
        if not cfg.get("device") == "cpu":
            cfg["emotion"]["batch_size"] = 64
        with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                         delete=False) as f:
            yaml.safe_dump(cfg, f)
            cfg_path = f.name
        res_path = cfg_path.replace(".yaml", "_report.json")
        eval_py = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "evaluate_emotion.py")
        rc = subprocess.run(
            [sys.executable, eval_py, "--config", cfg_path,
             "--checkpoint", ckpt_path, "--task", task,
             "--out-json", res_path]).returncode
        assert rc == 0, f"evaluate subprocess failed (snr{snr}, rc={rc})"
        with open(res_path) as f:
            report = json.load(f)
        os.unlink(cfg_path)
        os.unlink(res_path)
        out.setdefault("clean", report["clean"])
        out[f"snr{snr}"] = report["noisy"]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", type=int, default=4800)
    p.add_argument("--dev", type=int, default=960)
    p.add_argument("--byol-epochs", type=int, default=10)
    p.add_argument("--byol-batch", type=int, default=36)
    p.add_argument("--ser-epochs", type=int, default=8)
    p.add_argument("--ser-batch", type=int, default=16)
    p.add_argument("--ser-lr", type=float, default=1e-3)
    p.add_argument("--ft-epochs", type=int, default=6,
                   help="phase-2 e2e fine-tune epochs (categorical)")
    p.add_argument("--ft-lr", type=float, default=2e-5)
    p.add_argument("--byol-snr", type=float, nargs="+",
                   default=[2.0, 4.0, 8.0, 12.0],
                   help="BYOL pretraining SNR choices (brackets eval 4/8)")
    p.add_argument("--skip-e2e", action="store_true")
    p.add_argument("--skip-dimensional", action="store_true")
    p.add_argument("--legs", default=None,
                   help="comma list of variants to run (byol,random,"
                        "byol_e2e,random_e2e) — lets a deadline-bound "
                        "rerun prioritize the e2e legs; cached legs load "
                        "regardless")
    p.add_argument("--reuse", action="store_true",
                   help="reuse existing BYOL checkpoint / SER checkpoints")
    p.add_argument("--out", default="docs/transfer_evidence")
    p.add_argument("--corpus", default="/tmp/nrse_transfer")
    p.add_argument("--smoke", action="store_true",
                   help="tiny-encoder CPU pipeline check (no quality claim)")
    # internal: run ONE stage ("byol" or "<task>:<variant>") and exit.
    # evaluate_emotion readouts leak ~2 GB/min of host RSS (observed: the
    # all-in-one-process run OOM-killed at 129 GB on the 7th readout, and
    # jax.clear_caches()+gc between stages does not reclaim it) — a
    # process boundary per stage is the reliable fix; the per-stage cache
    # files carry the results back to the parent.
    p.add_argument("--stage", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.train, args.dev = 48, 16
        args.byol_epochs, args.ser_epochs = 1, 1
        args.ft_epochs = 1
        args.byol_batch = args.ser_batch = 4
        args.corpus = "/tmp/nrse_transfer_smoke"
        if args.out == "docs/transfer_evidence":
            args.out = "/tmp/nrse_transfer_smoke/out"

    from nrse_tpu.data.synthetic import generate_corpus, generate_emotion_corpus

    seconds = 1.0 if args.smoke else 5.0
    audio_dir, labels_csv = generate_emotion_corpus(
        os.path.join(args.corpus, "emotion"), args.train, args.dev,
        seconds=seconds,
    )
    # pretraining noise (seed 0) and HELD-OUT eval noise (seed 1)
    _, noise_train = generate_corpus(
        os.path.join(args.corpus, "noise_train"), 0,
        60 if args.smoke else 600, seconds=seconds, seed=0)
    _, noise_eval = generate_corpus(
        os.path.join(args.corpus, "noise_eval"), 0,
        30 if args.smoke else 300, seconds=seconds, seed=1)
    byol_clean = _symlink_split(
        audio_dir, os.path.join(args.corpus, "byol_clean"), "MSP-SYN_Tr_")

    def run_stage_subprocess(stage):
        import subprocess

        cmd = [sys.executable, os.path.abspath(__file__),
               "--stage", stage, "--reuse",
               "--train", str(args.train), "--dev", str(args.dev),
               "--byol-epochs", str(args.byol_epochs),
               "--byol-batch", str(args.byol_batch),
               "--ser-epochs", str(args.ser_epochs),
               "--ser-batch", str(args.ser_batch),
               "--ser-lr", str(args.ser_lr),
               "--ft-epochs", str(args.ft_epochs),
               "--ft-lr", str(args.ft_lr),
               "--byol-snr", *[str(s) for s in args.byol_snr],
               "--corpus", args.corpus, "--out", args.out]
        if args.skip_dimensional:
            cmd.append("--skip-dimensional")
        if args.skip_e2e:
            cmd.append("--skip-e2e")
        if args.smoke:
            cmd.append("--smoke")
        print(f"# transfer: stage {stage} (subprocess)", flush=True)
        rc = subprocess.run(cmd).returncode
        assert rc == 0, f"stage {stage} subprocess failed (rc={rc})"

    # smoke keeps stages inline (fast CPU check) unless the env var forces
    # the subprocess path so tests can cover the real orchestration mode
    subprocess_stages = args.stage is None and (
        not args.smoke or os.environ.get("NRSE_TRANSFER_SUBPROC") == "1")

    # ---- stage 1: BYOL pretraining on the Train split ----
    byol_ckpt_dir = os.path.join(args.corpus, "byol_ckpt")
    byol_best = os.path.join(byol_ckpt_dir, "best_val_loss")
    if not (args.reuse and os.path.isdir(byol_best)):
        if subprocess_stages:
            run_stage_subprocess("byol")
            assert os.path.isdir(byol_best)
        else:
            byol_best = run_byol(byol_clean, noise_train, byol_ckpt_dir,
                                 args.byol_epochs, args.byol_batch,
                                 smoke=args.smoke, snr_range=args.byol_snr)
    if args.stage == "byol":
        return
    print(f"# transfer: BYOL checkpoint at {byol_best}", flush=True)

    results = {}
    tasks = [("categorical", "dev_wavlm-large_emotion_cat.yaml", True,
              "train_categorical_emotions", "nrse_tpu.train.categorical_emotions")]
    if not args.skip_dimensional:
        tasks.append(("dimensional", "dev_wavlm-large_emotion_dim.yaml", False,
                      "train_dimensional_emotions",
                      "nrse_tpu.train.dimentional_emotions"))

    for task, preset, cat_only, fn_name, mod_name in tasks:
        variants = [("byol", byol_best, False), ("random", None, False)]
        if task == "categorical" and not args.skip_e2e:
            # the e2e phase-2 legs — the config the reference's flat
            # clean→snr4 row was actually measured with (VERDICT r3 item 3)
            variants += [("byol_e2e", byol_best, True),
                         ("random_e2e", None, True)]
        for variant, enc, e2e in variants:
            stage = f"{task}:{variant}"
            if args.stage is not None and args.stage != stage:
                continue
            # per-stage disk cache: results survive a killed run and carry
            # stage-subprocess results back to the parent
            cache = os.path.join(args.corpus, f"readout_{task}_{variant}.json")
            if args.reuse and os.path.exists(cache):
                with open(cache) as f:
                    results[f"{task}_{variant}"] = json.load(f)
                print(f"# transfer: readout {task}/{variant} (cached)",
                      flush=True)
                continue
            if args.legs is not None and \
                    variant not in args.legs.split(","):
                print(f"# transfer: skipping {task}/{variant} (--legs)",
                      flush=True)
                continue
            if subprocess_stages:
                run_stage_subprocess(stage)
                with open(cache) as f:
                    results[f"{task}_{variant}"] = json.load(f)
                continue
            ckpt_dir = os.path.join(args.corpus, f"ser_{task}_{variant}")
            config = ser_config(
                preset, labels_csv, audio_dir, noise_train, enc, ckpt_dir,
                args.ser_epochs, args.ser_batch, args.ser_lr, cat_only,
                smoke=args.smoke, e2e=e2e, ft_epochs=args.ft_epochs,
                ft_lr=args.ft_lr, snr_range=args.byol_snr,
            )
            best = os.path.join(
                ckpt_dir,
                "best_fine_tuned_model" if e2e else "best_classifier_model")
            if not (args.reuse and os.path.isdir(best)):
                print(f"# transfer: training {task}/{variant}", flush=True)
                if args.smoke:
                    import importlib

                    trainer = getattr(importlib.import_module(mod_name),
                                      fn_name)
                    trainer(config)
                else:
                    # training also runs as a leaf subprocess: this stage
                    # process must hold no live TPU-tunnel context when
                    # the readout subprocesses below become the client
                    import subprocess
                    import tempfile

                    import yaml

                    with tempfile.NamedTemporaryFile(
                            "w", suffix=".yaml", delete=False) as f:
                        yaml.safe_dump(config, f)
                        cfg_path = f.name
                    train_py = os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), "train_emotion.py")
                    # --task on the CLI: get_config overwrites the config
                    # dict's "task" key with the flag value
                    rc = subprocess.run(
                        [sys.executable, train_py, "--config", cfg_path,
                         "--task", task]).returncode
                    assert rc == 0, (
                        f"training {task}/{variant} failed (rc={rc})")
                    os.unlink(cfg_path)
            print(f"# transfer: readout {task}/{variant}", flush=True)
            results[f"{task}_{variant}"] = robustness_readout(
                config, best, task, noise_eval
            )
            with open(cache, "w") as f:
                json.dump(results[f"{task}_{variant}"], f)
            print(json.dumps({f"{task}_{variant}":
                              results[f"{task}_{variant}"]}), flush=True)
    if args.stage is not None:
        return

    # ---- artifact ----
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)

    def row(name, res, metric):
        c, s8, s4 = (res["clean"][metric], res["snr8"][metric],
                     res["snr4"][metric])
        return (f"| {name} | {c:.3f} | {s8:.3f} | {s4:.3f} | "
                f"{s4 - c:+.3f} |")

    lines = [
        "# BYOL→SER transfer evidence (synthetic regime corpus, real TPU)",
        "",
        f"Generated by `python tools/transfer_report.py --train {args.train} "
        f"--dev {args.dev} --byol-epochs {args.byol_epochs} "
        f"--ser-epochs {args.ser_epochs}`.",
        "",
        "The reference's headline result (dev.ipynb cell 52) is that BYOL",
        "pretraining lifts SER macro-F1 and flattens the clean→snr4",
        "degradation.  MSP-Podcast/AudioSet are environment-blocked, so this",
        "runs the IDENTICAL pipeline on the 8-regime synthetic emotion",
        "corpus: `train_byol.main` (WavLM-large, clean-vs-noisy BYOL views)",
        "on the Train split → frozen-encoder SER phase-1 via the real",
        "trainers → `evaluate_emotion` readout on clean / snr8 / snr4",
        "Development audio, with eval noise from a held-out seed.  The",
        "control is the same pipeline from a random-init encoder.",
        "",
    ]
    if "categorical_byol" in results and "categorical_random" in results:
        lines += [
            "## Categorical SER (macro-F1)",
            "",
            "| encoder (frozen) | clean | snr8 | snr4 | Δ(clean→snr4) |",
            "|---|---|---|---|---|",
            row("BYOL-pretrained", results["categorical_byol"],
                "macro_f1"),
            row("random-init", results["categorical_random"], "macro_f1"),
            "",
            "| encoder (frozen) | accuracy clean | snr8 | snr4 | Δ |",
            "|---|---|---|---|---|",
            row("BYOL-pretrained", results["categorical_byol"],
                "accuracy"),
            row("random-init", results["categorical_random"], "accuracy"),
        ]
    e2e_rows = [(name, results[key]) for name, key in
                (("BYOL-pretrained", "categorical_byol_e2e"),
                 ("random-init", "categorical_random_e2e"))
                if key in results]  # a --legs rerun may carry only one leg
    if e2e_rows:
        lines += [
            "",
            "## Categorical SER — e2e fine-tuned (the reference's flat-row"
            " config)",
            "",
            "Phase 2: the ENTIRE ssl model + heads trainable from epoch 0"
            " — transformer layers and conv frontend, matching"
            " run_train_e2e.sh --freeze_ssl=False, which gives every ssl"
            " parameter an optimizer"
            " (train_ft_cat_ser_weighted_checkpoint.py:209-214) —"
            " train-time noise augmentation on (config_cat_noisy.json"
            " points the reference's SER training at the noisy corpus),"
            " BYOL pretraining SNRs bracketing the eval points.  This is"
            " the configuration the reference's headline flat clean→snr4"
            " row was measured with (dev.ipynb cell 52).",
            "",
            "| encoder (e2e fine-tuned) | clean | snr8 | snr4 |"
            " Δ(clean→snr4) |",
            "|---|---|---|---|---|",
            *[row(name, res, "macro_f1") for name, res in e2e_rows],
            "",
            "| encoder (e2e fine-tuned) | accuracy clean | snr8 | snr4 |"
            " Δ |",
            "|---|---|---|---|---|",
            *[row(name, res, "accuracy") for name, res in e2e_rows],
        ]
    dim_rows = [(name, results[key]) for name, key in
                (("BYOL-pretrained", "dimensional_byol"),
                 ("random-init", "dimensional_random"))
                if key in results]
    if dim_rows:
        lines += ["", "## Dimensional SER (CCC)", ""]
        for dim in ("arousal", "valence", "dominance"):
            lines += [
                f"| encoder (frozen) | CCC {dim} clean | snr8 | snr4 | Δ |",
                "|---|---|---|---|---|",
                *[row(name, res, f"ccc_{dim}") for name, res in dim_rows],
                "",
            ]
    lines += [
        "",
        "Reference numbers being mirrored (real MSP-Podcast, dev.ipynb cell",
        "52): WavLM+BYOL e2e macro-F1 0.260/0.253/0.249 (clean/snr8/snr4)",
        "vs no-BYOL 0.233/0.235/0.223 — the claim is the *delta pattern*,",
        "which the table above measures on the synthetic corpus.",
    ]
    with open(os.path.join(args.out, "README.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"artifact": args.out}))


if __name__ == "__main__":
    main()
