"""Oracle tests for the fused conv+LN+GELU Pallas frontend.

The XLA reference composition is the exact math the kernel replaces
(stride-2 VALID Conv1d → f32 channel-LN (fast variance) → exact-erf GELU).
Interpret mode on CPU; the Mosaic-compiled path is exercised on the real
chip by the bench parity check (``NRSE_BENCH_CHECK``) and the default
bench config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrse_tpu.ops.fused_frontend import fused_conv_ln_gelu


def oracle(x, kernel, bias, scale, ln_bias, eps=1e-5):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(2,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).astype(jnp.float32) + bias
    m = out.mean(-1, keepdims=True)
    v = jnp.maximum((out * out).mean(-1, keepdims=True) - m * m, 0.0)
    ln = (out - m) * jax.lax.rsqrt(v + eps) * scale + ln_bias
    return jax.nn.gelu(ln, approximate=False).astype(x.dtype)


def make(k, t_in, c=512, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, t_in, c)), dtype)
    kern = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    return x, kern, bias, scale, lnb


@pytest.mark.parametrize("k,t_in", [(3, 1031), (3, 1030), (2, 1030),
                                    (2, 1031), (3, 513), (3, 2051)])
def test_forward_matches_oracle(k, t_in):
    """Odd/even input lengths, block-boundary T_out, both kernel sizes."""
    x, kern, bias, scale, lnb = make(k, t_in)
    ref = oracle(x, kern, bias, scale, lnb)
    ours = fused_conv_ln_gelu(x, kern, bias, scale, lnb)
    assert ours.shape == ref.shape
    err = float(jnp.abs(ours - ref).max())
    assert err < 1e-5, f"fwd err {err}"


@pytest.mark.parametrize("k,t_in", [(3, 1031), (2, 1030)])
def test_gradients_match_oracle(k, t_in):
    x, kern, bias, scale, lnb = make(k, t_in, seed=1)
    ref = oracle(x, kern, bias, scale, lnb)
    w = jnp.cos(0.01 * jnp.arange(ref.size).reshape(ref.shape))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) * w)

    g_ref = jax.grad(loss(oracle), argnums=(0, 1, 2, 3, 4))(
        x, kern, bias, scale, lnb)
    g_ours = jax.grad(loss(fused_conv_ln_gelu), argnums=(0, 1, 2, 3, 4))(
        x, kern, bias, scale, lnb)
    for name, a, b in zip(("dx", "dkernel", "dbias", "dscale", "dln_bias"),
                          g_ref, g_ours):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err < 2e-5, f"{name}: rel err {err}"


def test_bf16_close_to_f32_reference():
    """bf16 activations: the kernel keeps the conv accumulator in f32
    through LN (slightly MORE precise than the XLA path, which rounds the
    conv output to bf16 before LN) — both must sit within bf16 noise of
    the f32 truth."""
    x32, kern, bias, scale, lnb = make(3, 1030, seed=2)
    truth = oracle(x32, kern, bias, scale, lnb)
    ours = fused_conv_ln_gelu(x32.astype(jnp.bfloat16), kern, bias, scale,
                              lnb)
    err = float(jnp.abs(ours.astype(jnp.float32) - truth).max())
    assert err < 0.1, err  # |gelu(ln)| ≲ 8 here; bf16 eps ≈ 8e-3 relative


def test_fused_full_model_golden_vs_hf():
    """End-to-end: the fused frontend inside WavLMModel reproduces the HF
    torch activations with converted weights (same test as the xla path's
    golden check) — proves the param layout is byte-compatible with the
    converter."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import dataclasses

    from tests.test_wavlm_golden import make_hf_tiny

    from nrse_tpu.models.convert import hf_wavlm_to_params
    from nrse_tpu.models.wavlm import WavLMModel

    hf, cfg = make_hf_tiny(stable_layer_norm=True)
    cfg = dataclasses.replace(cfg, frontend_norm="fused")
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    x = np.random.default_rng(3).standard_normal((2, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    seq, _ = WavLMModel(cfg).apply(params, jnp.asarray(x))
    err = np.abs(np.asarray(seq) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, f"relative error {err}"
