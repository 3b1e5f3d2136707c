"""Fused FFN Pallas kernel: parity + mask-consistency tests.

CPU coverage uses the masked variant (``fused_ffn_masked``) because the
TPU interpreter stubs ``prng_random_bits`` to zeros — the fwd/dx/dW
mask application is the same code path either way.  The in-kernel RNG
variant's on-TPU (Mosaic-compiled) parity — RNG vs dumped-mask vs jnp
oracle, plus keep-rate statistics — is asserted by the bench check
(``bench.py::run_ffn_check``, NRSE_BENCH_CHECK_ONLY=1), following the
repo rule that interpret mode cannot prove Mosaic behavior
(docs/parity.md kernel notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrse_tpu.ops.fused_ffn import (
    ROW_BLOCK,
    dump_masks,
    fused_ffn,
    fused_ffn_masked,
)


def _ref_ffn(x, w1, b1, w2, b2, mask_a=None, mask_h=None):
    """The XLA composition the kernel replaces (FeedForward semantics:
    dense → exact-erf gelu → dropout → dense → dropout), with optional
    externally-supplied {0, 1/(1-p)} masks."""
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    g = 0.5 * h * (1.0 + jax.lax.erf(h / np.sqrt(2.0)))
    if mask_a is not None:
        g = g * mask_a
    gd = g.astype(x.dtype)
    o = jnp.dot(gd, w2.astype(x.dtype), preferred_element_type=jnp.float32)
    o = o + b2.astype(jnp.float32)
    if mask_h is not None:
        o = o * mask_h
    return o.astype(x.dtype)


def _params(c=128, f=256, n=ROW_BLOCK + 40, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, c)), dtype)
    w1 = jnp.asarray(0.1 * rng.standard_normal((c, f)), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal((f,)), jnp.float32)
    w2 = jnp.asarray(0.1 * rng.standard_normal((f, c)), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    return x, w1, b1, w2, b2


def _grad_compare(loss_a, loss_b, args, tol):
    va, ga = jax.value_and_grad(loss_a, argnums=tuple(range(len(args))))(
        *args)
    vb, gb = jax.value_and_grad(loss_b, argnums=tuple(range(len(args))))(
        *args)
    assert abs(float(va) - float(vb)) / abs(float(vb)) < tol
    for a, b in zip(ga, gb):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-3) < tol


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_deterministic_parity(dtype):
    x, w1, b1, w2, b2 = _params(dtype=dtype)
    seed = jnp.zeros((2,), jnp.uint32)

    def loss_fused(x, w1, b1, w2, b2):
        y = fused_ffn(x, w1, b1, w2, b2, seed, 0.0, 0.0)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(_ref_ffn(x, w1, b1, w2, b2).astype(jnp.float32) ** 2)

    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    _grad_compare(loss_fused, loss_ref, (x, w1, b1, w2, b2), tol)


def test_batched_shape_roundtrip():
    _, w1, b1, w2, b2 = _params()
    xb = jnp.asarray(np.random.default_rng(1).standard_normal((3, 50, 128)),
                     jnp.float32)
    y = fused_ffn(xb, w1, b1, w2, b2, jnp.zeros((2,), jnp.uint32), 0.0, 0.0)
    assert y.shape == xb.shape and y.dtype == xb.dtype
    ref = _ref_ffn(xb.reshape(-1, 128), w1, b1, w2, b2).reshape(xb.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_masked_oracle_parity():
    """With dropout masks active, the kernel must equal the jnp
    composition fed the same masks — fwd AND all grads, proving the dx
    and dW kernels apply masks consistently with the forward."""
    p_act, p_hid = 0.1, 0.25
    x, w1, b1, w2, b2 = _params(dtype=jnp.float32, seed=3)
    key = jax.random.PRNGKey(7)
    ka, kh = jax.random.split(key)
    ma = (jax.random.bernoulli(ka, 1 - p_act, (x.shape[0], w1.shape[1]))
          .astype(jnp.float32) / (1 - p_act))
    mh = (jax.random.bernoulli(kh, 1 - p_hid, x.shape)
          .astype(jnp.float32) / (1 - p_hid))

    def loss_fused(x, w1, b1, w2, b2):
        y = fused_ffn_masked(x, w1, b1, w2, b2, ma, mh)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        y = _ref_ffn(x, w1, b1, w2, b2, mask_a=ma, mask_h=mh)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    _grad_compare(loss_fused, loss_ref, (x, w1, b1, w2, b2), 1e-4)


def test_masked_remat_consistency():
    """jax.checkpoint around the op (full-remat training path) must give
    identical value and gradients."""
    x, w1, b1, w2, b2 = _params(dtype=jnp.bfloat16, seed=5)
    ma = (jax.random.bernoulli(jax.random.PRNGKey(0), 0.9,
                               (x.shape[0], w1.shape[1]))
          .astype(jnp.float32) / 0.9)
    mh = (jax.random.bernoulli(jax.random.PRNGKey(1), 0.9, x.shape)
          .astype(jnp.float32) / 0.9)

    def loss(x, w1, b1, w2, b2, *, remat):
        fn = fused_ffn_masked
        if remat:
            fn = jax.checkpoint(fn)
        return jnp.sum(fn(x, w1, b1, w2, b2, ma, mh)
                       .astype(jnp.float32) ** 2)

    v1, g1 = jax.value_and_grad(
        lambda *a: loss(*a, remat=False), argnums=(0, 1))(x, w1, b1, w2, b2)
    v2, g2 = jax.value_and_grad(
        lambda *a: loss(*a, remat=True), argnums=(0, 1))(x, w1, b1, w2, b2)
    assert float(v1) == float(v2)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_dump_masks_plumbing():
    """Shape/scale contract of the mask-dump kernel (bit-level behavior
    is TPU-only: the interpreter stubs prng_random_bits to zeros, which
    under the keep-rule maps to all-dropped)."""
    p = 0.25
    ma, mh = dump_masks(jnp.asarray([1, 2], jnp.uint32), 300, 128, 256,
                        p, p)
    assert ma.shape == (300, 256) and mh.shape == (300, 128)
    vals = np.unique(np.asarray(ma))
    assert set(vals.tolist()) <= {0.0, np.float32(1.0 / (1 - p))}


def test_fused_ffn_full_model_golden_vs_hf():
    """End-to-end: ffn_impl='fused' inside WavLMModel reproduces the HF
    torch activations with converted weights — proves the DenseParams
    tree is byte-compatible with the converter and the kernel slots into
    the encoder layer unchanged."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import dataclasses

    from tests.test_wavlm_golden import make_hf_tiny

    from nrse_tpu.models.convert import hf_wavlm_to_params
    from nrse_tpu.models.wavlm import WavLMModel

    hf, cfg = make_hf_tiny(stable_layer_norm=True)
    cfg = dataclasses.replace(cfg, ffn_impl="fused")
    params = hf_wavlm_to_params(hf.state_dict(), cfg)
    x = np.random.default_rng(3).standard_normal((2, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    seq, _ = WavLMModel(cfg).apply(params, jnp.asarray(x))
    err = np.abs(np.asarray(seq) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, f"relative error {err}"


def test_fused_ffn_training_mode_model_grads():
    """Training mode (dropout active, remat on): the fused-FFN model
    produces finite loss and gradients matching its own second evaluation
    (per-key dropout determinism through flax rng plumbing)."""
    import dataclasses

    from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = dataclasses.replace(
        WavLMConfig.tiny(layerdrop=0.0), ffn_impl="fused", remat=True,
        apply_spec_augment=False,
    )
    model = WavLMModel(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4000)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    rngs = {"dropout": jax.random.PRNGKey(5)}

    def loss(p):
        seq, pooled = model.apply(p, x, deterministic=False, rngs=rngs)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    v1, g1 = jax.value_and_grad(loss)(params)
    v2, _ = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(v1))
    assert float(v1) == float(v2)  # same rng key ⇒ same masks
    leaves = jax.tree_util.tree_leaves(g1)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
    assert any(np.abs(np.asarray(l, np.float32)).max() > 0 for l in leaves)

def test_fused_ffn_dp_shard_map_matches_single_device():
    """Under a registered pure-DP mesh the deterministic fused FFN
    shard_maps over batch with replicated weights; outputs and weight
    grads (psum'd by shard_map's AD) must match the single-device kernel
    to f32-accumulation tolerance."""
    from nrse_tpu.ops.fused_ffn import fused_ffn
    from nrse_tpu.parallel.mesh import make_mesh, set_flash_tp_mesh

    rng = np.random.default_rng(11)
    n, c, f = 16, 128, 256
    x = jnp.asarray(rng.standard_normal((n, 4, c)), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.standard_normal((c, f)), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal((f,)), jnp.float32)
    w2 = jnp.asarray(0.1 * rng.standard_normal((f, c)), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    seed = jnp.zeros((2,), jnp.uint32)

    def loss(x, w1, b1, w2, b2):
        return jnp.mean(fused_ffn(x, w1, b1, w2, b2, seed, 0.0, 0.0) ** 2)

    base_v, base_g = jax.value_and_grad(loss, argnums=(0, 1, 3))(
        x, w1, b1, w2, b2)

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    set_flash_tp_mesh(mesh)
    try:
        dp_v, dp_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 3)))(
            x, w1, b1, w2, b2)
    finally:
        set_flash_tp_mesh(None)

    np.testing.assert_allclose(float(dp_v), float(base_v), rtol=1e-6)
    for a, b in zip(dp_g, base_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
