"""Unit tests for the fused BYOL validation stack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrse_tpu.data.loader import HostDataLoader
from nrse_tpu.data.noisy_speech_dataset import NoiseRobustSpeechDataset
from nrse_tpu.eval.evaluate_byol import (
    evaluate_embedding_similarity,
    validate_model,
    visualize_embeddings,
)
from nrse_tpu.models.byol import BYOLSpeechModel
from nrse_tpu.models.wavlm import WavLMConfig
from nrse_tpu.train.byol_trainer import create_train_state
from nrse_tpu.train.schedules import make_byol_optimizer


@pytest.fixture(scope="module")
def setup(tiny_wav_dir):
    ds = NoiseRobustSpeechDataset(
        clean_data_path=str(tiny_wav_dir / "clean"),
        noise_data_path=str(tiny_wav_dir / "noise"),
        max_audio_length=1.0, snr_range=[0, 5, 10],
    )
    loader = HostDataLoader(ds, np.arange(len(ds)), batch_size=4,
                            shuffle=False, num_workers=2, drop_last=False)
    model = BYOLSpeechModel(
        {"model": {"projection_dim": 32, "prediction_dim": 64,
                   "ema_decay": 0.99}},
        encoder_config=WavLMConfig.tiny(layerdrop=0.0),
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((4, 16000)),
        make_byol_optimizer(1e-3, total_steps=10),
    )
    config = {"data": {"snr_range": [0, 5, 10]}}
    return model, state, loader, config


def test_validate_model_fused(setup):
    model, state, loader, config = setup
    val_loss, metrics = validate_model(model, state, loader, config)
    assert np.isfinite(val_loss)
    assert set(metrics) == {"val_loss", "val_avg_similarity",
                            "val_similarities", "val_stats"}
    # raw sums/counts must reproduce the means (multi-host weighting path)
    stats = metrics["val_stats"]
    assert val_loss == pytest.approx(
        stats["loss_sum"] / stats["loss_cnt"], rel=1e-6
    )
    for snr, sim in metrics["val_similarities"].items():
        cnt = stats[f"snr_{snr}_cnt"]
        if cnt:
            assert sim == pytest.approx(
                stats[f"snr_{snr}_sum"] / cnt, rel=1e-5
            )
    assert set(metrics["val_similarities"]) == {0, 5, 10}
    # avg = mean of per-SNR means (reference evaluate_byol.py:113-115)
    expect = np.mean([v for v in metrics["val_similarities"].values()])
    np.testing.assert_allclose(metrics["val_avg_similarity"], expect,
                               rtol=1e-6)
    for v in metrics["val_similarities"].values():
        assert -1.0 <= v <= 1.0


def test_validate_model_omits_empty_bins(setup, monkeypatch):
    """An SNR bin with no validation samples must be OMITTED from
    val_similarities / the average (not averaged in as 0.0) so single-host
    semantics match the multi-host sums/counts aggregation (ADVICE r2)."""
    import nrse_tpu.eval.evaluate_byol as ev

    model, state, loader, config = setup
    losses = [np.array([0.5, 0.7])]
    sims = np.array([0.9, 0.8])
    snrs = np.array([0.0, 0.0])  # bins 5 and 10 empty

    monkeypatch.setattr(ev, "_run_eval_pass",
                        lambda *a, **k: (losses, sims, snrs, []))
    val_loss, metrics = ev.validate_model(model, state, loader, config)
    assert set(metrics["val_similarities"]) == {0}
    assert metrics["val_avg_similarity"] == pytest.approx(0.85)
    # stats still carry zero-count keys for the multi-host aggregation
    assert metrics["val_stats"]["snr_5_cnt"] == 0.0
    assert metrics["val_stats"]["snr_10_cnt"] == 0.0


def test_evaluate_embedding_similarity_buckets(setup):
    model, state, loader, config = setup
    sims = evaluate_embedding_similarity(model, state, loader, config)
    assert set(sims) == {0, 5, 10}


def test_visualize_embeddings_writes_png(setup, tmp_path):
    model, state, loader, config = setup
    path = visualize_embeddings(model, state, loader, str(tmp_path),
                                "tsne.png", num_samples=8)
    import os

    assert os.path.exists(path)


def test_eval_step_matches_naive_formulation(setup):
    """The deduplicated eval step (3 encoder forwards via
    online_heads/encode_target/target_projector) must match the naive
    model.apply + 2×model.encode formulation to f32 ulp — it is the same
    math, reassociated only by fusion order."""
    from nrse_tpu.audio.augment import make_byol_views
    from nrse_tpu.models.byol import byol_loss_per_sample
    from nrse_tpu.train.byol_trainer import make_byol_eval_step

    model, state, _, _ = setup
    rng = np.random.default_rng(7)
    batch = {
        "clean": jnp.asarray(rng.standard_normal((4, 16000)), jnp.float32),
        "noise": jnp.asarray(
            0.2 * rng.standard_normal((4, 16000)), jnp.float32),
        "snr": jnp.asarray([0.0, 5.0, 10.0, 5.0]),
    }
    loss_new, sim_new = make_byol_eval_step(model)(state, batch)

    cv, nv, _ = make_byol_views(batch["clean"], batch["noise"], batch["snr"])
    pred, proj, _ = model.apply(state.variables, cv, nv, deterministic=True)
    loss_old = byol_loss_per_sample(pred, proj)
    _, ce = model.encode(state.variables, cv, deterministic=True)
    _, ne = model.encode(state.variables, nv, deterministic=True)
    c = ce / jnp.maximum(jnp.linalg.norm(ce, axis=1, keepdims=True), 1e-10)
    n = ne / jnp.maximum(jnp.linalg.norm(ne, axis=1, keepdims=True), 1e-10)
    sim_old = jnp.sum(c * n, axis=1)

    np.testing.assert_allclose(np.asarray(loss_new), np.asarray(loss_old),
                               atol=5e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(sim_new), np.asarray(sim_old),
                               atol=5e-6, rtol=0)
