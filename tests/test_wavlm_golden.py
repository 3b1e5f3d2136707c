"""Golden-activation tests: our Flax WavLM vs the HF torch implementation.

Per the rebuild test plan (SURVEY.md §4b): a tiny random-initialised HF
WavLM config, weights converted with ``hf_wavlm_to_params``, activations
compared end-to-end on CPU in float32.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from nrse_tpu.models.convert import hf_wavlm_to_params
from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


def make_hf_tiny(stable_layer_norm=True):
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel as HFModel

    hf_cfg = HFConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_feat_extract_layers=3,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=40,
        max_bucket_distance=100,
        do_stable_layer_norm=stable_layer_norm,
        feat_extract_norm="layer" if stable_layer_norm else "group",
        conv_bias=stable_layer_norm,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        mask_time_prob=0.05,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    cfg = WavLMConfig.tiny(
        conv_bias=stable_layer_norm,
        do_stable_layer_norm=stable_layer_norm,
        feat_extract_norm="layer" if stable_layer_norm else "group",
    )
    return hf, cfg


@pytest.fixture(scope="module")
def tiny_pair():
    return make_hf_tiny(stable_layer_norm=True)


def test_golden_forward_no_mask(tiny_pair):
    hf, cfg = tiny_pair
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    model = WavLMModel(cfg)

    x = np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    seq, pooled = model.apply(params, jnp.asarray(x))
    seq = np.asarray(seq)

    assert seq.shape == ref.shape
    err = np.abs(seq - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, f"relative error {err}"
    np.testing.assert_allclose(
        np.asarray(pooled), ref.mean(axis=1), rtol=1e-4, atol=1e-4
    )


def test_golden_forward_with_mask(tiny_pair):
    hf, cfg = tiny_pair
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    model = WavLMModel(cfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    mask = np.ones((2, 8000), np.int32)
    mask[1, 5000:] = 0
    x[1, 5000:] = 0.0

    with torch.no_grad():
        ref = hf(
            torch.from_numpy(x), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    seq, pooled = model.apply(params, jnp.asarray(x), jnp.asarray(mask))
    seq = np.asarray(seq)

    # compare only valid frames of each sequence
    valid = int(cfg.feature_lengths(np.array([5000]))[0])
    err_full = np.abs(seq[0] - ref[0]).max() / (np.abs(ref[0]).max() + 1e-9)
    err_masked = np.abs(seq[1, :valid] - ref[1, :valid]).max() / (
        np.abs(ref[1, :valid]).max() + 1e-9
    )
    assert err_full < 2e-4 and err_masked < 2e-4


def test_golden_base_variant():
    """Post-LayerNorm / GroupNorm variant (wavlm-base-plus family)."""
    hf, cfg = make_hf_tiny(stable_layer_norm=False)
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    model = WavLMModel(cfg)

    x = np.random.default_rng(2).standard_normal((2, 6000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    seq, _ = model.apply(params, jnp.asarray(x))
    err = np.abs(np.asarray(seq) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, f"relative error {err}"


def test_position_bias_matches_hf(tiny_pair):
    hf, cfg = tiny_pair
    from nrse_tpu.ops.rel_pos_bias import compute_position_bias

    attn = hf.encoder.layers[0].attention
    with torch.no_grad():
        ref = attn.compute_bias(37, 37).numpy()  # [H, T, T]
    table = attn.rel_attn_embed.weight.detach().numpy()
    ours = np.asarray(
        compute_position_bias(
            jnp.asarray(table), 37, 37, cfg.num_buckets, cfg.max_bucket_distance
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_wavlm_encoder_wrapper_api():
    """Reference-API wrapper: WavLMEncoder(model_name) with output_dim and
    [B,1,T] handling (encoder.py:5-32 surface)."""
    from nrse_tpu.models.encoder import WavLMEncoder
    from nrse_tpu.models.wavlm import WavLMConfig

    enc = WavLMEncoder("wavlm-tiny", config=WavLMConfig.tiny(layerdrop=0.0))
    assert enc.output_dim == 64
    x = np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32)
    seq = enc(x)
    assert seq.shape[0] == 2 and seq.shape[2] == 64
    seq3 = enc(x[:, None, :])  # [B, 1, T] parity
    np.testing.assert_allclose(np.asarray(seq3), np.asarray(seq), atol=1e-6)
    pooled = enc.encode_pooled(x)
    assert pooled.shape == (2, 64)


def test_per_layer_pos_bias_equivalence(tiny_pair):
    """Per-layer table gather == precomputed broadcast bias."""
    hf, cfg = tiny_pair
    import dataclasses

    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 8000)).astype(np.float32))
    base, _ = WavLMModel(cfg).apply(params, x)
    cfg_pl = dataclasses.replace(cfg, per_layer_pos_bias=True)
    per_layer, _ = WavLMModel(cfg_pl).apply(params, x)
    np.testing.assert_allclose(np.asarray(per_layer), np.asarray(base),
                               atol=1e-5)

    # gradients flow to the table in both modes
    def loss(p, c):
        seq, pooled = WavLMModel(c).apply(p, x)
        return jnp.sum(pooled**2)

    g_base = jax.grad(loss)(params, cfg)["params"]["encoder"]["rel_attn_embed"]
    g_pl = jax.grad(loss)(params, cfg_pl)["params"]["encoder"]["rel_attn_embed"]
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_base),
                               rtol=1e-4, atol=1e-6)


def test_jnp_buckets_match_numpy():
    from nrse_tpu.ops.rel_pos_bias import (
        relative_position_buckets,
        relative_position_buckets_jnp,
    )

    for t in (37, 250, 800):
        ref = relative_position_buckets(t, t, 320, 800)
        ours = np.asarray(relative_position_buckets_jnp(t, t, 320, 800))
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("remat",
                         [True, "ffn", "dots", "attn", "attn+ffn", "light"])
def test_remat_policy_equivalence(tiny_pair, remat):
    """Every remat policy computes the same forward AND gradient as
    remat=False — rematerialisation must be a pure memory/compute trade.

    The "attn" policy (save everything except tensors tagged ``attn_tt`` in
    ``ops/attention.py``) is the round-2 default on TPU; the tag must not
    change values.
    """
    hf, cfg = tiny_pair
    import dataclasses

    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 6000)).astype(np.float32))

    def loss(p, c):
        seq, pooled = WavLMModel(c).apply(p, x)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    base_cfg = dataclasses.replace(cfg, remat=False)
    l0, g0 = jax.value_and_grad(loss)(params, base_cfg)
    l1, g1 = jax.value_and_grad(loss)(params,
                                      dataclasses.replace(cfg, remat=remat))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", ["mxu", "pallas", "fused"])
def test_frontend_norm_variants_match_flax(impl):
    """The MXU / Pallas channel-LN variants — and the fully-fused
    conv+LN+gelu Pallas frontend ("fused") — must reproduce the flax path
    (forward AND gradients); they are interchangeable implementations
    selected by WavLMConfig.frontend_norm, sharing one param layout."""
    import dataclasses

    from flax import linen as fnn

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 7000)).astype(np.float32))
    base_cfg = dataclasses.replace(cfg, frontend_norm="xla")
    var_cfg = dataclasses.replace(cfg, frontend_norm=impl)
    params = WavLMModel(base_cfg).init(jax.random.PRNGKey(0), x)

    def loss(p, c):
        seq, pooled = WavLMModel(c).apply(p, x)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, base_cfg)
    l1, g1 = jax.value_and_grad(loss)(params, var_cfg)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)
