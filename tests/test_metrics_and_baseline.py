import os

import numpy as np
import pandas as pd
import pytest

from nrse_tpu.baseline.wavset import LogManager, WavNormStats
from nrse_tpu.labels.parsing import reformat_lists_to_onehot_csv
from nrse_tpu.metrics.categorical_metrics import score_predictions


@pytest.fixture
def gt_csv(tmp_path):
    df = pd.DataFrame({
        "FileName": [f"MSP-PODCAST_{i:04d}_0001.wav" for i in range(6)],
        "EmoClass": ["A", "H", "N", "N", "S", "X"],
        "EmoAct": [4.0] * 6, "EmoVal": [4.0] * 6, "EmoDom": [4.0] * 6,
        "Split_Set": ["Test2"] * 6,
    })
    p = tmp_path / "labels_consensus.csv"
    df.to_csv(p, index=False)
    return str(p)


def test_score_predictions_perfect(gt_csv, tmp_path):
    preds = pd.DataFrame({
        "Filename": [
            "MSP-PODCAST_0000_0001_snr8_abc.wav",  # snr suffix resolved
            "MSP-PODCAST_0001_0001.wav",
            "MSP-PODCAST_0002_0001.wav",
            "MSP-PODCAST_0004_0001.wav",
        ],
        "Prediction": ["A", "H", "N", "S"],
    })
    pcsv = tmp_path / "preds.csv"
    preds.to_csv(pcsv, index=False)
    m = score_predictions(str(pcsv), gt_csv, str(tmp_path / "out"),
                          split="Test2")
    assert m["accuracy"] == 1.0 and m["macro_f1"] == 1.0
    assert m["n_scored"] == 4
    assert os.path.exists(tmp_path / "out" / "confusion_matrix.png")
    assert os.path.exists(tmp_path / "out" / "class_report.csv")


def test_score_predictions_numeric_and_errors(gt_csv, tmp_path):
    # numeric class indices (NRSE ordering) + one wrong prediction
    preds = pd.DataFrame({
        "file_name": ["MSP-PODCAST_0000_0001.wav", "MSP-PODCAST_0001_0001.wav"],
        "prediction": [0, 2],  # A correct, H predicted as S (wrong)
    })
    pcsv = tmp_path / "p2.csv"
    preds.to_csv(pcsv, index=False)
    m = score_predictions(str(pcsv), gt_csv, str(tmp_path / "o2"))
    assert m["n_scored"] == 2
    assert abs(m["accuracy"] - 0.5) < 1e-9


def test_reformat_lists_to_onehot(gt_csv, tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text(
        "Audios/MSP-PODCAST_0000_0001_snr8_xyz.wav; A; A:4.0; V:4.0; D:4.0;\n"
        "Audios/MSP-PODCAST_0001_0001.wav; H; A:4.0; V:4.0; D:4.0;\n"
    )
    out = tmp_path / "onehot.csv"
    n = reformat_lists_to_onehot_csv([str(lst)], gt_csv, str(out))
    assert n == 2
    df = pd.read_csv(out)
    assert list(df.columns[:9]) == ["FileName", "A", "S", "H", "U", "F", "D",
                                    "C", "N"]
    assert df.iloc[0]["A"] == 1.0 and df.iloc[0]["Split_Set"] == "Test2"
    assert df.iloc[1]["H"] == 1.0


def test_wav_norm_stats_roundtrip(tmp_path, rng):
    wavs = [rng.standard_normal(1000).astype(np.float32) * 2 + 0.5
            for _ in range(5)]
    stats = WavNormStats.from_waveforms(wavs)
    assert abs(stats.mean - 0.5) < 0.1
    assert abs(stats.std - 2.0) < 0.1
    p = tmp_path / "train_norm_stat.pkl"
    stats.save(str(p))
    loaded = WavNormStats.load(str(p))
    assert loaded.mean == stats.mean and loaded.std == stats.std
    normed = loaded.apply(wavs[0])
    assert abs(normed.mean()) < 0.2


def test_log_manager():
    lm = LogManager()
    lm.alloc_stat_type_list(["loss"])
    lm.add_stat("loss", 1.0)
    lm.add_stat("loss", 3.0)
    assert lm.get_stat("loss") == 2.0
    lm.init_stat()
    assert lm.get_stat("loss") == 0.0


def test_class_weights_from_onehot():
    from nrse_tpu.baseline.train_ft_cat_ser import class_weights_from_onehot

    labels = np.zeros((100, 8), np.float32)
    labels[:80, 0] = 1  # 80 anger
    labels[80:, 7] = 1  # 20 neutral
    w = class_weights_from_onehot(labels)
    np.testing.assert_allclose(w[0], 100 / (8 * 80), rtol=1e-6)
    np.testing.assert_allclose(w[7], 100 / (8 * 20), rtol=1e-6)


def test_baseline_pipeline_forward(rng):
    import jax
    import jax.numpy as jnp

    from nrse_tpu.baseline.pipeline import BaselineSER, make_baseline_forward
    from nrse_tpu.models.wavlm import WavLMConfig

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    model = BaselineSER(cfg, head_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    mask = jnp.ones((2, 8000))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, mask)["params"]
    logits = make_baseline_forward(model)(params, x, mask)
    assert logits.shape == (2, 8)
    assert np.isfinite(np.asarray(logits)).all()


def test_bucket_length():
    from nrse_tpu.baseline.pipeline import bucket_length

    assert bucket_length(16000) == 80000
    assert bucket_length(80001) == 160000
    assert bucket_length(10**7, max_s=30.0) == 30 * 16000
