"""seq_pad_multiple: tile-aligned transformer frames are a pure layout
change — valid-frame outputs must match the unpadded run.

The knob (``WavLMConfig.seq_pad_multiple``, ``tpu.seq_pad_multiple``)
pads the frame axis once after the conv frontend (zeros = HF's conv
zero-padding), masks the pad out of attention, and slices it off before
pooling — so a padded run must be numerically equivalent to the
unpadded one in deterministic mode (exactly so in f32: the additive
-1e9 key mask underflows ``exp`` to exactly 0).  Guards the perf knob
from the round-3 profile (~6 ms/step of [B,249,C]↔[B·T,C] repack glue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


def _outputs(cfg, x, mask=None, deterministic=True, rngs=None):
    model = WavLMModel(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    kw = {}
    if rngs is not None:
        kw["rngs"] = rngs
    return model.apply(variables, x, attention_mask=mask,
                       deterministic=deterministic, **kw)


def _tiny(**kw):
    kw.setdefault("layerdrop", 0.0)
    return WavLMConfig.tiny(**kw)


def test_padded_matches_unpadded_deterministic():
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, 16000)), np.float32
    )
    seq0, pool0 = _outputs(_tiny(), x)
    # T(frames) for the tiny 3-layer stack is not a multiple of 16
    assert seq0.shape[1] % 16, "test premise: unaligned frame count"
    seq1, pool1 = _outputs(_tiny(seq_pad_multiple=16), x)
    assert seq1.shape == seq0.shape
    np.testing.assert_allclose(seq1, seq0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pool1, pool0, rtol=1e-5, atol=1e-5)


def test_padded_matches_unpadded_with_attention_mask():
    b, t = 3, 16000
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (b, t)), np.float32
    )
    lengths = np.array([t, t // 2, t // 3])
    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.int32)
    seq0, pool0 = _outputs(_tiny(), x, mask=mask)
    seq1, pool1 = _outputs(_tiny(seq_pad_multiple=16), x, mask=mask)
    # compare only valid frames: masked-tail frames are garbage in BOTH
    # runs (they are excluded from attention and pooling, not zeroed)
    cfg = _tiny()
    fl = np.asarray(cfg.feature_lengths(jnp.asarray(lengths)))
    for i in range(b):
        np.testing.assert_allclose(
            seq1[i, : fl[i]], seq0[i, : fl[i]], rtol=1e-5, atol=1e-5
        )
    np.testing.assert_allclose(pool1, pool0, rtol=1e-5, atol=1e-5)


def test_padded_gradients_match():
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 8000)), np.float32
    )

    def loss_for(cfg):
        model = WavLMModel(cfg)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)

        def loss(params):
            _, pooled = model.apply({"params": params}, x)
            return jnp.sum(pooled.astype(jnp.float32) ** 2)

        return jax.grad(loss)(variables["params"])

    g0 = loss_for(_tiny())
    g1 = loss_for(_tiny(seq_pad_multiple=16))
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    for k, v in flat0:
        np.testing.assert_allclose(
            flat1[jax.tree_util.keystr(k)], v, rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(k),
        )


def test_padded_block_attention_path():
    # use_flash_attention at short T routes to the block kernel; with the
    # stack padded to a lane multiple the kernel's own per-layer padding
    # is a no-op (pad_t == 0).  Interpret-mode on CPU.
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (2, 16000)), np.float32
    )
    seq0, pool0 = _outputs(_tiny(), x)
    seq1, pool1 = _outputs(
        _tiny(seq_pad_multiple=128, use_flash_attention=True), x
    )
    np.testing.assert_allclose(seq1, seq0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(pool1, pool0, rtol=2e-4, atol=2e-4)


def test_padded_training_mode_runs():
    # dropout/specaugment RNG shapes change under padding (documented);
    # just pin that the training path runs and stays finite
    cfg = _tiny(seq_pad_multiple=16, layerdrop=0.5)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (2, 8000)), np.float32
    )
    model = WavLMModel(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    rngs = {"dropout": jax.random.PRNGKey(6),
            "layerdrop": jax.random.PRNGKey(7),
            "spec_augment": jax.random.PRNGKey(8)}
    seq, pooled = model.apply(
        variables, x, deterministic=False, rngs=rngs,
        apply_spec_augment=True,
    )
    assert bool(jnp.isfinite(seq).all() and jnp.isfinite(pooled).all())


def test_config_plumbing():
    from nrse_tpu.models.byol import BYOLSpeechModel

    m = BYOLSpeechModel({"model": {"name": "microsoft/wavlm-large"},
                         "tpu": {"seq_pad_multiple": 128}})
    assert m.encoder_config.seq_pad_multiple == 128
