"""Fused q/k/v/gate projection parity (qkv_impl='fused' vs 'xla').

The fused path rewrites four attention input projections as one
[C, 3C+8H] dot with the gate kernel embedded block-diagonally
(models/wavlm.py::GatedAttention). Same parameter tree, same math — the
off-block zeros contribute exactly 0 — so outputs and gradients must match
the separate-dot formulation to float tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


def _cfgs():
    base = WavLMConfig.tiny(
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, apply_spec_augment=False,
        dtype=jnp.float32,
    )
    return base, dataclasses.replace(base, qkv_impl="fused")


def test_param_tree_identical():
    cfg_xla, cfg_fused = _cfgs()
    x = jnp.zeros((2, 4000))
    p1 = WavLMModel(cfg_xla).init({"params": jax.random.PRNGKey(0)}, x)
    p2 = WavLMModel(cfg_fused).init({"params": jax.random.PRNGKey(0)}, x)
    s1 = jax.tree_util.tree_structure(p1)
    s2 = jax.tree_util.tree_structure(p2)
    assert s1 == s2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("masked", [False, True])
def test_forward_and_grad_parity(masked):
    cfg_xla, cfg_fused = _cfgs()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
    )
    mask = None
    if masked:
        m = np.ones((2, 4000), np.float32)
        m[1, 2500:] = 0.0
        mask = jnp.asarray(m)

    variables = WavLMModel(cfg_xla).init({"params": jax.random.PRNGKey(0)}, x)

    def run(cfg, v):
        def loss(v):
            seq, pooled = WavLMModel(cfg).apply(v, x, mask)
            return jnp.sum(seq ** 2) + jnp.sum(pooled ** 2), (seq, pooled)

        (val, (seq, pooled)), grads = jax.value_and_grad(
            loss, has_aux=True)(v)
        return val, seq, pooled, grads

    val_a, seq_a, pooled_a, g_a = run(cfg_xla, variables)
    val_b, seq_b, pooled_b, g_b = run(cfg_fused, variables)

    np.testing.assert_allclose(np.asarray(seq_b), np.asarray(seq_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled_b), np.asarray(pooled_a),
                               rtol=1e-5, atol=1e-5)
    assert np.isclose(float(val_b), float(val_a), rtol=1e-5)
    flat_a, tree_a = jax.tree_util.tree_flatten_with_path(g_a)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(g_b)
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa),
        )
