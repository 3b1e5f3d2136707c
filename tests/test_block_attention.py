"""One-block Pallas attention (dense bias, short T) vs the XLA oracle.

Interpreter mode on CPU; verifies forward values and all five gradients
(q, k, v, gate, dense pos_bias), masked and unmasked, at non-128-aligned
lengths including the flagship T=249.  The on-TPU Mosaic-compiled parity
check lives in bench.py (``NRSE_BENCH_CHECK_ONLY=1``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrse_tpu.ops.attention import gated_bias_attention
from nrse_tpu.ops.block_attention import block_gated_attention

B, H, D = 2, 3, 16


def make_inputs(t, seed=0, masked=False):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, t, D)).astype(np.float32)
    k = rng.standard_normal((B, H, t, D)).astype(np.float32)
    v = rng.standard_normal((B, H, t, D)).astype(np.float32)
    gate = rng.uniform(0.5, 2.5, (B, H, t)).astype(np.float32)
    bias = rng.standard_normal((H, t, t)).astype(np.float32)
    mask = None
    if masked:
        mask = np.ones((B, t), np.int32)
        mask[1, t // 2:] = 0
    return tuple(jnp.asarray(x) for x in (q, k, v, gate, bias)), mask


@pytest.mark.parametrize("t,masked", [(64, False), (100, True), (249, False),
                                      (249, True), (256, True)])
def test_forward_matches_reference(t, masked):
    (q, k, v, gate, bias), mask = make_inputs(t, masked=masked)
    jmask = None if mask is None else jnp.asarray(mask)
    ref = gated_bias_attention(q, k, v, gate, bias, jmask)
    ours = block_gated_attention(q, k, v, gate, bias, jmask)
    err = np.abs(np.asarray(ours) - np.asarray(ref)).max()
    assert err < 2e-5, f"max abs err {err}"


@pytest.mark.parametrize("t", [96, 249])
def test_gradients_match_reference(t):
    (q, k, v, gate, bias), mask = make_inputs(t, seed=1, masked=True)
    jmask = jnp.asarray(mask)

    def loss(fn):
        def f(q, k, v, gate, bias):
            o = fn(q, k, v, gate, bias, jmask)
            return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))
        return f

    g_ref = jax.grad(loss(gated_bias_attention), argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, bias)
    g_ours = jax.grad(loss(block_gated_attention), argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, bias)
    for name, a, b in zip(["dq", "dk", "dv", "dgate", "dbias"],
                          g_ref, g_ours):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err < 5e-4, f"{name}: rel err {err}"


def test_bf16_inputs():
    (q, k, v, gate, bias), _ = make_inputs(128, seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = gated_bias_attention(qb, kb, vb, gate, bias)
    ours = block_gated_attention(qb, kb, vb, gate, bias)
    assert ours.dtype == jnp.bfloat16
    err = (np.abs(np.asarray(ours, np.float32) - np.asarray(ref, np.float32))
           .max())
    assert err < 0.05, f"max abs err {err}"


def test_fully_masked_row_finite():
    (q, k, v, gate, bias), mask = make_inputs(64, seed=3, masked=True)
    mask = np.asarray(mask)
    mask[1, :] = 0  # one sample entirely invalid
    out = block_gated_attention(q, k, v, gate, bias, jnp.asarray(mask))
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("t", [100, 249])
def test_dropout_masked_variant_matches_oracle(t):
    """Kernel-applied output dropout (masked variant — the CPU-testable
    path of the in-kernel RNG design) == oracle attention × mask, for
    values and all gradients."""
    (q, k, v, gate, bias), mask = make_inputs(t, seed=7, masked=True)
    jmask = jnp.asarray(mask)
    p = 0.25
    dmask = (jax.random.bernoulli(jax.random.PRNGKey(9), 1 - p,
                                  q.shape).astype(jnp.float32) / (1 - p))

    def ref_fn(q, k, v, gate, bias):
        return gated_bias_attention(q, k, v, gate, bias, jmask) * dmask

    def ours_fn(q, k, v, gate, bias):
        return block_gated_attention(q, k, v, gate, bias, jmask,
                                     dropout_mask=dmask)

    ref = ref_fn(q, k, v, gate, bias)
    ours = ours_fn(q, k, v, gate, bias)
    assert np.abs(np.asarray(ours) - np.asarray(ref)).max() < 2e-5

    def loss(fn):
        def f(*a):
            o = fn(*a)
            return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))
        return f

    g_ref = jax.grad(loss(ref_fn), argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, bias)
    g_ours = jax.grad(loss(ours_fn), argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, bias)
    for name, a, b in zip(["dq", "dk", "dv", "dgate", "dbias"],
                          g_ref, g_ours):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err < 5e-4, f"{name}: rel err {err}"


def test_model_kernel_dropout_path_runs():
    """attn_dropout_impl='kernel' on CPU routes through the masked kernel
    variant (training mode) and stays finite; deterministic mode is
    unaffected (bit-identical to the default impl)."""
    import dataclasses

    from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = dataclasses.replace(
        WavLMConfig.tiny(layerdrop=0.0), use_flash_attention=True,
        attn_dropout_impl="kernel",
    )
    x = jnp.asarray(np.random.default_rng(6).standard_normal((2, 8000)),
                    jnp.float32)
    model = WavLMModel(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    o_det, _ = model.apply(params, x)
    o_ref, _ = WavLMModel(
        dataclasses.replace(cfg, attn_dropout_impl="xla")
    ).apply(params, x)
    assert np.array_equal(np.asarray(o_det), np.asarray(o_ref))
    o_tr, _ = model.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1),
              "spec_augment": jax.random.PRNGKey(2)},
    )
    assert bool(jnp.isfinite(o_tr).all())


def test_dump_block_masks_statistics():
    """dump_block_masks (interpret: PRNG stubbed to zero bits → all-drop)
    exercises shape/layout; the real bit-level check runs on TPU via
    bench CHECK_ONLY."""
    from nrse_tpu.ops.block_attention import dump_block_masks

    m = dump_block_masks(jnp.zeros((2,), jnp.uint32), 2, 4, 128, 16, 0.1)
    assert m.shape == (2, 4, 128, 16)


def test_model_selects_block_kernel_at_short_t():
    """WavLMModel with flash enabled at short T routes through the block
    kernel (dense bias) and matches the XLA-attention model."""
    import dataclasses

    from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 8000)),
                    jnp.float32)
    m_ref = WavLMModel(cfg)
    params = m_ref.init(jax.random.PRNGKey(0), x)
    o_ref, _ = m_ref.apply(params, x)
    cfg_fl = dataclasses.replace(cfg, use_flash_attention=True)
    o_fl, _ = WavLMModel(cfg_fl).apply(params, x)
    err = (np.abs(np.asarray(o_fl) - np.asarray(o_ref)).max()
           / (np.abs(np.asarray(o_ref)).max() + 1e-9))
    assert err < 5e-5, f"model rel err {err}"
