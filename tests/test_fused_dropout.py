"""CPU tests for the standalone hardware-PRNG dropout op
(``nrse_tpu/ops/fused_dropout.py``).

Interpret mode stubs ``prng_random_bits`` to zeros, so the RNG variant is
only meaningful on real TPU (bench ``NRSE_BENCH_CHECK_ONLY``, ``drop``
selector); the masked variant carries the full CPU coverage — it is the
same kernel body with the mask fed from outside, and it is also the
model's CPU execution path (``wavlm.py::_hw_drop``).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nrse_tpu.ops.fused_dropout import hw_dropout_masked


def _mask(key, shape, p):
    return (jax.random.bernoulli(key, 1.0 - p, shape).astype(jnp.float32)
            / (1.0 - p))


def test_masked_forward_matches_oracle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 40, 128)), jnp.bfloat16)
    m = _mask(jax.random.PRNGKey(1), x.shape, 0.25)
    got = hw_dropout_masked(x, m)
    want = (x.astype(jnp.float32) * m).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_masked_forward_odd_rows_padded():
    """Row counts that are not a multiple of the block are padded and
    sliced internally — values must be untouched."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((7, 128)), jnp.float32)
    m = _mask(jax.random.PRNGKey(2), x.shape, 0.5)
    got = hw_dropout_masked(x, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x * m),
                               rtol=1e-6)


def test_masked_grad_is_masked_cotangent():
    """Custom VJP: dx = g · mask (regenerated, zero residuals); the mask
    cotangent is zero (non-differentiable switching constant)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    m = _mask(jax.random.PRNGKey(3), x.shape, 0.1)

    def loss(x, m):
        return jnp.sum(jnp.sin(hw_dropout_masked(x, m)))

    dx, dm = jax.grad(loss, argnums=(0, 1))(x, m)
    want_dx = jnp.cos(x * m) * m
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dm), 0.0)


def test_model_kernel_dropout_path_runs_and_matches_when_deterministic():
    """dropout_impl='kernel' on the tiny model: the deterministic forward
    must be bit-identical to the XLA-dropout config (no dropout applied),
    and a training step with dropout active must stay finite (on CPU the
    masked-kernel variant runs — the same compute path as TPU)."""
    from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)

    outs = {}
    for impl in ("xla", "kernel"):
        cfg = WavLMConfig.tiny(layerdrop=0.0, dropout_impl=impl)
        model = WavLMModel(cfg)
        variables = model.init(jax.random.PRNGKey(0), x)
        seq, pooled = model.apply(variables, x, deterministic=True)
        outs[impl] = (np.asarray(seq, np.float32),
                      np.asarray(pooled, np.float32))
    np.testing.assert_array_equal(outs["xla"][0], outs["kernel"][0])
    np.testing.assert_array_equal(outs["xla"][1], outs["kernel"][1])

    cfg = WavLMConfig.tiny(layerdrop=0.0, dropout_impl="kernel",
                           hidden_dropout=0.2, attention_dropout=0.2)
    model = WavLMModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        seq, _ = model.apply(
            {**variables, "params": params}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7),
                  "spec_augment": jax.random.PRNGKey(8)},
        )
        return jnp.mean(seq.astype(jnp.float32) ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in flat)

def test_hw_dropout_dp_shard_map_identity_at_p0():
    """Under a registered pure-DP mesh the RNG variant shard_maps over the
    batch axis (GSPMD does not partition pallas_call).  p=0 is an exact
    identity regardless of the PRNG bits (keep iff u24 >= 0 always holds,
    scale 1/(1-0)=1), so the full shard_map plumbing — per-shard seed
    mixing included — is exercisable on the CPU interpreter."""
    from nrse_tpu.ops.fused_dropout import hw_dropout
    from nrse_tpu.parallel.mesh import make_mesh, set_flash_tp_mesh

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    set_flash_tp_mesh(mesh)
    try:
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
        seed = jnp.asarray([1, 2], jnp.uint32)

        got = jax.jit(lambda a: hw_dropout(a, seed, 0.0))(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x))

        dx = jax.jit(jax.grad(
            lambda a: jnp.sum(hw_dropout(a, seed, 0.0))))(x)
        np.testing.assert_array_equal(np.asarray(dx), 1.0)
    finally:
        set_flash_tp_mesh(None)


def test_hw_dropout_dp_indivisible_batch_falls_back():
    """A leading dim the data axis does not divide takes the bare-kernel
    path (single-program semantics) instead of failing."""
    from nrse_tpu.ops.fused_dropout import hw_dropout
    from nrse_tpu.parallel.mesh import make_mesh, set_flash_tp_mesh

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    set_flash_tp_mesh(mesh)
    try:
        x = jnp.ones((3, 128), jnp.float32)
        got = hw_dropout(x, jnp.zeros((2,), jnp.uint32), 0.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x))
    finally:
        set_flash_tp_mesh(None)
