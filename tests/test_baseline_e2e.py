"""Baseline challenge-pipeline e2e: train_ft_cat_ser + eval_cat_ser on a
mock corpus (tiny encoder)."""

import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def baseline_setup(tmp_path_factory, rng):
    from nrse_tpu.audio.io import save_wav
    from nrse_tpu.labels.parsing import BASELINE_EMOTIONS_MAP

    root = tmp_path_factory.mktemp("baseline")
    wav_dir = root / "Audios"
    wav_dir.mkdir()
    sr = 16000
    rows, list_lines = [], []
    classes = ["A", "S", "H", "N"] * 4
    for i, c in enumerate(classes):
        name = f"MSP-PODCAST_{3000+i}_{i:04d}.wav"
        t = np.arange(int(sr * rng.uniform(0.5, 1.5))) / sr
        x = 0.4 * np.sin(2 * np.pi * rng.uniform(90, 350) * t)
        x += 0.05 * rng.standard_normal(t.shape)
        save_wav(str(wav_dir / name), x.astype(np.float32), sr)
        one_hot = {k: 0.0 for k in BASELINE_EMOTIONS_MAP}
        one_hot[c] = 1.0
        rows.append({"FileName": name, **one_hot,
                     "Split_Set": "Train" if i < 10 else "Development"})
        if i >= 10:
            list_lines.append(f"Audios/{name}; {c}; A:4.0; V:4.0; D:4.0;\n")
    pd.DataFrame(rows).to_csv(root / "labels_onehot.csv", index=False)
    (root / "eval_list.txt").write_text("".join(list_lines))
    (root / "config.json").write_text(json.dumps({
        "wav_dir": str(wav_dir), "label_path": str(root / "labels_onehot.csv"),
    }))
    return root


def test_baseline_train_and_eval(baseline_setup):
    from nrse_tpu.baseline.eval_cat_ser import run_inference
    from nrse_tpu.baseline.train_ft_cat_ser import train

    root = baseline_setup
    model_path = str(root / "model")
    result = train(
        config_path=str(root / "config.json"), model_path=model_path,
        epochs=1, batch_size=4, accumulation_steps=2, lr=1e-3,
        freeze_ssl=True, head_dim=32, model_name="wavlm-tiny",
        max_seconds=1.0, num_workers=2,
    )
    assert np.isfinite(result["best_dev_loss"])
    assert os.path.isdir(os.path.join(model_path, "final_model"))
    assert os.path.exists(os.path.join(model_path, "train_norm_stat.pkl"))

    metrics = run_inference(
        model_path=model_path, audio_list=str(root / "eval_list.txt"),
        audio_dir=str(root), batch_size=4, head_dim=32,
        model_name="wavlm-tiny",
    )
    assert metrics["n_files"] == 6
    assert metrics["n_scored"] == 6
    assert 0.0 <= metrics["f1_macro"] <= 1.0
    assert metrics["inference_time_per_audio_second"] > 0
    results_csv = os.path.join(model_path, "results", "inference_results.csv")
    df = pd.read_csv(results_csv)
    assert list(df.columns) == ["Filename"] + [f"Label_{k}" for k in range(8)] \
        + ["Prediction"]
    assert (df[[f"Label_{k}" for k in range(8)]].sum(axis=1) == 1.0).all()


def test_baseline_e2e_mode_unfreezes(baseline_setup):
    """freeze_ssl=False (run_train_e2e.sh semantics) also trains."""
    from nrse_tpu.baseline.train_ft_cat_ser import train

    root = baseline_setup
    result = train(
        config_path=str(root / "config.json"),
        model_path=str(root / "model_e2e"),
        epochs=1, batch_size=4, accumulation_steps=1, lr=1e-4,
        freeze_ssl=False, head_dim=32, model_name="wavlm-tiny",
        max_seconds=1.0, num_workers=2,
    )
    assert np.isfinite(result["best_dev_loss"])


def test_bucketed_forward_timed_modes():
    """overlap / prestage / perturb agree with the default mode on results
    and audio-second accounting (stub forward, no model)."""
    import jax.numpy as jnp

    from nrse_tpu.baseline.eval_cat_ser import bucketed_forward_timed

    class _E:
        __slots__ = ("path", "emotion")

        def __init__(self, i):
            self.path = f"f{i}.wav"
            self.emotion = i % 8

    rng = np.random.default_rng(0)
    loaded = [(_E(i), rng.standard_normal(
        int(16000 * rng.uniform(0.5, 2.5))).astype(np.float32))
        for i in range(10)]

    calls = []

    def forward(params, x, mask):
        calls.append(np.asarray(x))
        # per-row "logits" keyed on the audio so result ordering is testable
        return jnp.stack([x.sum(-1)] * 8, axis=-1)

    base, t_base, a_base = bucketed_forward_timed(forward, None, loaded, 4)
    for mode in (dict(prestage=True, perturb=1e-6),
                 dict(overlap=True, perturb=2e-6)):
        res, t, a = bucketed_forward_timed(forward, None, loaded, 4, **mode)
        assert a == a_base and t > 0
        assert [e.path for e, _ in res] == [e.path for e, _ in base]
        np.testing.assert_allclose(
            np.stack([r for _, r in res]),
            np.stack([r for _, r in base]), rtol=1e-4)
    # perturb actually varied the device inputs: no two batches of the
    # three passes are bit-identical (the tunnel-dedup defeat)
    keys = [c.tobytes() for c in calls]
    assert len(set(keys)) == len(keys)
