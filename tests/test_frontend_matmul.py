"""Matmul-form strided conv (``frontend_conv: "matmul"``) vs the conv oracle.

``strided_conv_matmul`` re-expresses the frontend's VALID strided 1-D
convs as free reshapes + MXU dots (see the docstring in
``nrse_tpu/models/wavlm.py``).  These tests pin exact-math equivalence to
``lax.conv_general_dilated`` (values and all gradients) across kernel/
stride/length combinations incl. the non-divisible tails, and prove the
model-level param tree stays byte-compatible with the converter via the
same HF golden check the other frontend variants use.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrse_tpu.models.wavlm import strided_conv_matmul


def conv_oracle(x, kernel, bias, s):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(s,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).astype(jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def make(k, t_in, c=64, cout=48, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, t_in, c)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((k, c, cout)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    return x, kern, bias


# (k, s): wavlm-large layers 1-4 (3, 2), 5-6 (2, 2), layer-0 shape (10, 5),
# plus a k>2s case exercising a width-1 trailing tap group
@pytest.mark.parametrize("k,s", [(3, 2), (2, 2), (10, 5), (5, 2)])
@pytest.mark.parametrize("t_in", [999, 1000, 1001])
def test_forward_matches_conv(k, s, t_in):
    x, kern, bias = make(k, t_in)
    ref = conv_oracle(x, kern, bias, s)
    ours = strided_conv_matmul(x, kern, bias, k, s)
    assert ours.shape == ref.shape
    err = float(jnp.abs(ours - ref).max())
    assert err < 1e-5, f"fwd err {err} (k={k}, s={s}, t={t_in})"


def test_no_bias():
    x, kern, _ = make(3, 501)
    ref = conv_oracle(x, kern, None, 2)
    ours = strided_conv_matmul(x, kern, None, 3, 2)
    assert float(jnp.abs(ours - ref).max()) < 1e-5


@pytest.mark.parametrize("k,s,c,t_in", [(10, 5, 1, 16000), (10, 5, 1, 15997),
                                        (8, 4, 2, 999)])
def test_tiny_c_single_dot_branch(k, s, c, t_in):
    # c·k ≤ 32 routes through the single-dot im2col (the raw-audio
    # layer-0 shape) — values AND gradients must match the conv oracle
    x, kern, bias = make(k, t_in, c=c, cout=32, seed=2)
    ref = conv_oracle(x, kern, bias, s)
    ours = strided_conv_matmul(x, kern, bias, k, s)
    assert ours.shape == ref.shape
    assert float(jnp.abs(ours - ref).max()) < 1e-5

    w = jnp.cos(0.01 * jnp.arange(ref.size).reshape(ref.shape))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) * w)

    g_ref = jax.grad(loss(lambda x, kn, b: conv_oracle(x, kn, b, s)),
                     argnums=(0, 1, 2))(x, kern, bias)
    g_ours = jax.grad(
        loss(lambda x, kn, b: strided_conv_matmul(x, kn, b, k, s)),
        argnums=(0, 1, 2))(x, kern, bias)
    for name, a, b in zip(("dx", "dkernel", "dbias"), g_ref, g_ours):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err < 2e-5, f"{name}: rel err {err}"


def test_matmul0_full_model_golden_vs_hf():
    """frontend_conv=matmul0 (layer-0 single-dot im2col, layers 1+ on
    nn.Conv) reproduces HF activations with converted weights."""
    torch = pytest.importorskip("torch")

    from tests.test_wavlm_golden import make_hf_tiny

    from nrse_tpu.models.convert import hf_wavlm_to_params
    from nrse_tpu.models.wavlm import WavLMModel

    hf, cfg = make_hf_tiny(stable_layer_norm=True)
    cfg = dataclasses.replace(cfg, frontend_conv="matmul0")
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    x = np.random.default_rng(4).standard_normal((2, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    seq, _ = WavLMModel(cfg).apply(params, jnp.asarray(x))
    err = np.abs(np.asarray(seq) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, f"relative error {err}"


@pytest.mark.parametrize("k,s,t_in", [(3, 2, 999), (2, 2, 1000), (10, 5, 995)])
def test_gradients_match_conv(k, s, t_in):
    x, kern, bias = make(k, t_in, seed=1)
    ref = conv_oracle(x, kern, bias, s)
    w = jnp.cos(0.01 * jnp.arange(ref.size).reshape(ref.shape))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) * w)

    g_ref = jax.grad(loss(lambda x, kn, b: conv_oracle(x, kn, b, s)),
                     argnums=(0, 1, 2))(x, kern, bias)
    g_ours = jax.grad(loss(lambda x, kn, b: strided_conv_matmul(x, kn, b, k, s)),
                      argnums=(0, 1, 2))(x, kern, bias)
    for name, a, b in zip(("dx", "dkernel", "dbias"), g_ref, g_ours):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err < 2e-5, f"{name}: rel err {err}"


def test_matmul_full_model_golden_vs_hf():
    """frontend_conv=matmul inside WavLMModel reproduces HF activations
    with converted weights — the param tree is byte-compatible."""
    torch = pytest.importorskip("torch")

    from tests.test_wavlm_golden import make_hf_tiny

    from nrse_tpu.models.convert import hf_wavlm_to_params
    from nrse_tpu.models.wavlm import WavLMModel

    hf, cfg = make_hf_tiny(stable_layer_norm=True)
    cfg = dataclasses.replace(cfg, frontend_conv="matmul")
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    x = np.random.default_rng(3).standard_normal((2, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    seq, _ = WavLMModel(cfg).apply(params, jnp.asarray(x))
    err = np.abs(np.asarray(seq) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, f"relative error {err}"
