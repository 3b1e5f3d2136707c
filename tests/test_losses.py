"""Loss-function unit tests vs closed-form / torch oracles (SURVEY §4a)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nrse_tpu.train.losses import (
    ccc_loss,
    ce_weight_category,
    compute_ccc,
    compute_class_weights,
    focal_loss,
)


def test_class_weights_formula():
    counts = {0: 100, 1: 10, 7: 50}
    w = compute_class_weights(counts, 8)
    total = 160
    np.testing.assert_allclose(w[0], (total / (100 * 8)) ** 1.5, rtol=1e-6)
    np.testing.assert_allclose(w[1], (total / (10 * 8)) ** 1.5, rtol=1e-6)
    assert w[2] == 1.0  # untouched classes default to 1


def test_ce_weight_matches_torch(rng):
    torch = pytest.importorskip("torch")

    logits = rng.standard_normal((16, 8)).astype(np.float32)
    labels = rng.integers(0, 8, 16).astype(np.int32)
    weights = rng.uniform(0.5, 3.0, 8).astype(np.float32)

    ours = float(ce_weight_category(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)
    ))
    ref = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(weights))(
        torch.from_numpy(logits), torch.from_numpy(labels).long()
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_ce_weight_masks_invalid(rng):
    torch = pytest.importorskip("torch")

    logits = rng.standard_normal((6, 8)).astype(np.float32)
    labels = np.array([0, -1, 3, 9, 7, 2], np.int32)  # -1 and 9 invalid
    ours = float(ce_weight_category(jnp.asarray(logits), jnp.asarray(labels)))
    valid = np.array([0, 2, 4, 5])
    ref = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits[valid]),
        torch.from_numpy(labels[valid]).long(),
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_ce_weight_all_invalid():
    logits = np.zeros((3, 8), np.float32)
    labels = np.array([-1, 8, 9], np.int32)
    assert float(ce_weight_category(jnp.asarray(logits), jnp.asarray(labels))) == 0.0


def test_ccc_loss_closed_form(rng):
    p = rng.standard_normal((32, 3)).astype(np.float32)
    t = (0.8 * p + 0.2 * rng.standard_normal((32, 3))).astype(np.float32)
    ours = float(ccc_loss(jnp.asarray(p), jnp.asarray(t)))
    expected = 0.0
    for i in range(3):
        cov = np.mean((p[:, i] - p[:, i].mean()) * (t[:, i] - t[:, i].mean()))
        ccc = 2 * cov / (p[:, i].var() + t[:, i].var()
                         + (p[:, i].mean() - t[:, i].mean()) ** 2 + 1e-10)
        expected += 1 - ccc
    np.testing.assert_allclose(ours, expected / 3, rtol=1e-5)


def test_ccc_perfect_agreement(rng):
    p = rng.standard_normal((64, 3)).astype(np.float32)
    assert float(ccc_loss(jnp.asarray(p), jnp.asarray(p))) < 1e-5
    assert compute_ccc(p[:, 0], p[:, 0]) > 0.9999


def test_ccc_batch_one_guard():
    p = np.ones((1, 3), np.float32)
    assert float(ccc_loss(jnp.asarray(p), jnp.asarray(p * 2))) == 0.0


def test_focal_loss_reduces_easy_examples(rng):
    logits = np.zeros((4, 8), np.float32)
    logits[np.arange(4), 0] = 10.0  # very confident, correct
    labels = np.zeros(4, np.int32)
    easy = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    hard = float(focal_loss(jnp.zeros((4, 8)), jnp.asarray(labels)))
    assert easy < hard


def test_asp_pooling_matches_loop_oracle(rng):
    """Vectorised masked ASP == the reference's per-sample loop semantics."""
    from nrse_tpu.ops.asp_pooling import attentive_stats_pool

    B, T, D = 3, 20, 8
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    lens = np.array([20, 13, 5])
    frame_mask = np.arange(T)[None, :] < lens[:, None]
    w = rng.standard_normal((D, D)).astype(np.float32) * 0.3
    b = rng.standard_normal(D).astype(np.float32) * 0.1
    v = rng.standard_normal((D, 1)).astype(np.float32)

    ours = np.asarray(attentive_stats_pool(
        jnp.asarray(x), jnp.asarray(frame_mask), jnp.asarray(w),
        jnp.asarray(b), jnp.asarray(v),
    ))

    # per-sample loop oracle (pool.py:46-57 semantics)
    for i, L in enumerate(lens):
        xi = x[i, :L]
        h = np.tanh(xi @ w + b)
        logits = (h @ v)[:, 0]
        e = np.exp(logits - logits.max())
        wgt = (e / e.sum())[:, None]
        mu = (xi * wgt).sum(0)
        sigma = np.sqrt(np.clip((xi**2 * wgt).sum(0) - mu**2, 1e-5, None))
        np.testing.assert_allclose(ours[i, :D], mu, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ours[i, D:], sigma, rtol=1e-4, atol=1e-5)


def test_frame_length_formula():
    from nrse_tpu.ops.asp_pooling import frame_lengths_from_mask

    mask = np.zeros((3, 80000), np.float32)
    mask[0, :80000] = 1
    mask[1, :16000] = 1
    mask[2, :321] = 1
    lens = np.asarray(frame_lengths_from_mask(jnp.asarray(mask)))
    # (wav_len - 1) // 320 + 1  (pool.py:16-18)
    np.testing.assert_array_equal(lens, [(80000 - 1) // 320 + 1,
                                         (16000 - 1) // 320 + 1,
                                         (321 - 1) // 320 + 1])


def test_byol_loss_weights_mask_invalid_items(rng):
    from nrse_tpu.models.byol import byol_loss, byol_loss_per_sample

    pred = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    proj = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    per = np.asarray(byol_loss_per_sample(pred, proj))
    assert per.shape == (6,)
    np.testing.assert_allclose(
        float(byol_loss(pred, proj)), per.mean(), rtol=1e-6
    )
    # masking: weighted loss over the valid subset only
    valid = jnp.asarray([True, True, False, True, False, True])
    expected = per[np.asarray(valid)].mean()
    np.testing.assert_allclose(
        float(byol_loss(pred, proj, weights=valid)), expected, rtol=1e-6
    )
    # degenerate all-invalid batch: finite (0/max(0,1)), not NaN
    none_valid = jnp.zeros((6,), bool)
    assert np.isfinite(float(byol_loss(pred, proj, weights=none_valid)))
