"""Full-scale (wavlm-LARGE) converter validation.

The reference's checkpoint bridge operates on real *wavlm-large* state dicts
(``baseline/train_ft_cat_ser_weighted_checkpoint.py:138-160``).  The actual
pretrained weights cannot be downloaded in this environment, but a
randomly-initialised HF ``WavLMModel`` with the exact large architecture
gives the same key set and shapes — enough to retire the "bridge only
proven at tiny scale" risk (VERDICT r2 item 5):

  * every state-dict key is consumed by the converter (none missing, none
    silently ignored);
  * the converted pytree carries exactly the same parameter count;
  * activations match the HF torch forward at 24-layer/1024-d scale.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from nrse_tpu.models.convert import hf_wavlm_to_params
from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


class _TrackingDict(dict):
    """Records which keys the converter reads."""

    def __init__(self, data):
        super().__init__(data)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        hit = super().__contains__(k)
        if hit:
            self.read.add(k)
        return hit


@pytest.fixture(scope="module")
def large_pair():
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel as HFModel

    # microsoft/wavlm-large architecture (hub config values; random init —
    # the weights themselves are environment-blocked, the key set and
    # shapes are identical)
    hf_cfg = HFConfig(
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        conv_dim=(512,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        num_feat_extract_layers=7,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        num_buckets=320,
        max_bucket_distance=800,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        mask_time_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    cfg = WavLMConfig(
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False, dtype=jnp.float32,
        remat=False,
    )
    return hf, cfg


def test_large_converter_key_completeness(large_pair):
    """Zero missing keys (converter reads exist) AND zero unconsumed keys
    (nothing in the wavlm-large state dict is silently dropped)."""
    hf, cfg = large_pair
    sd = _TrackingDict({k: v for k, v in hf.state_dict().items()})

    params = hf_wavlm_to_params(sd, cfg)

    unconsumed = set(sd.keys()) - sd.read
    assert not unconsumed, f"converter ignored keys: {sorted(unconsumed)}"

    # exact parameter-count parity
    n_torch = sum(v.numel() for v in hf.state_dict().values())
    n_jax = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    assert n_jax == n_torch


def test_large_converter_activation_parity(large_pair):
    """End-to-end forward parity at 24-layer/1024-d scale (f32, CPU)."""
    hf, cfg = large_pair
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    model = WavLMModel(cfg)

    x = np.random.default_rng(0).standard_normal((1, 32000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    seq, pooled = model.apply(params, jnp.asarray(x))
    seq = np.asarray(seq)

    assert seq.shape == ref.shape  # [1, 99, 1024]
    err = np.abs(seq - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, f"relative error {err}"
    np.testing.assert_allclose(
        np.asarray(pooled), ref.mean(axis=1), rtol=1e-3, atol=1e-4
    )
