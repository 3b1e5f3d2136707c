"""BYOL train-step tests on a virtual 8-device CPU mesh (SURVEY.md §4c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrse_tpu.models.byol import BYOLSpeechModel, BYOLVariables
from nrse_tpu.models.wavlm import WavLMConfig
from nrse_tpu.parallel.mesh import (
    batch_sharding,
    byol_param_shardings,
    make_mesh,
    replicated_sharding,
)
from nrse_tpu.train.byol_trainer import (
    BYOLTrainState,
    create_train_state,
    make_byol_eval_step,
    make_byol_train_step,
)
from nrse_tpu.train.schedules import make_byol_optimizer

BATCH, T = 8, 8000


def tiny_model():
    cfg = WavLMConfig.tiny(layerdrop=0.0)
    return BYOLSpeechModel(
        {"model": {"projection_dim": 32, "prediction_dim": 64,
                   "ema_decay": 0.99}},
        encoder_config=cfg,
    )


def raw_batch(seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / 16000
    clean = 0.3 * np.sin(
        2 * np.pi * rng.uniform(100, 400, (BATCH, 1)) * t[None]
    ).astype(np.float32)
    clean += 0.05 * rng.standard_normal((BATCH, T)).astype(np.float32)
    noise = 0.2 * rng.standard_normal((BATCH, T)).astype(np.float32)
    snr = rng.choice([0.0, 5.0, 10.0], BATCH).astype(np.float32)
    return {"clean": clean, "noise": noise, "snr": snr}


@pytest.fixture(scope="module")
def model_and_state():
    model = tiny_model()
    opt = make_byol_optimizer(1e-3, weight_decay=1e-5, total_steps=100)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((BATCH, T)), opt
    )
    return model, opt, state


def test_train_step_runs_and_learns(model_and_state):
    model, opt, state = model_and_state
    step = make_byol_train_step(model, opt, donate=False)
    batch = jax.tree.map(jnp.asarray, raw_batch())
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert float(metrics["valid_fraction"]) == 1.0
    # repeated steps on the same batch must reduce the loss
    assert losses[-1] < losses[0], losses


def test_ema_moves_target(model_and_state):
    model, opt, state = model_and_state
    step = make_byol_train_step(model, opt, donate=False)
    before = jax.tree.leaves(state.variables.target["params"])[0]
    new_state, _ = step(state, jax.tree.map(jnp.asarray, raw_batch()))
    after = jax.tree.leaves(new_state.variables.target["params"])[0]
    online_after = jax.tree.leaves(
        {k: new_state.variables.online["params"][k]
         for k in ("encoder", "projector")}
    )[0]
    # target moved, but much less than online (EMA decay 0.99)
    assert not np.allclose(np.asarray(before), np.asarray(after))
    drift_t = float(np.abs(np.asarray(after - before)).mean())
    # online started equal to target at init
    drift_o = float(np.abs(np.asarray(online_after - before)).mean())
    assert drift_t < drift_o


def test_step_counter_and_rng_fold(model_and_state):
    model, opt, state = model_and_state
    step = make_byol_train_step(model, opt, donate=False)
    s1, m1 = step(state, jax.tree.map(jnp.asarray, raw_batch()))
    s2, m2 = step(s1, jax.tree.map(jnp.asarray, raw_batch()))
    assert int(s2.step) == int(state.step) + 2


def test_eval_step_fused(model_and_state):
    model, opt, state = model_and_state
    eval_step = make_byol_eval_step(model)
    loss, sim = eval_step(state, jax.tree.map(jnp.asarray, raw_batch()))
    # per-sample losses so the host can slice off loader padding rows
    assert loss.shape == (BATCH,)
    assert np.all(np.isfinite(np.asarray(loss)))
    assert sim.shape == (BATCH,)
    assert np.all(np.abs(np.asarray(sim)) <= 1.0 + 1e-5)


def test_data_parallel_matches_single_device(model_and_state):
    """Sharding the batch over 8 devices must not change the math (global
    BN stats / grad all-reduce via GSPMD)."""
    model, opt, state = model_and_state
    step = make_byol_train_step(model, opt, donate=False)
    batch = jax.tree.map(jnp.asarray, raw_batch(seed=3))

    _, m_single = step(state, batch)

    mesh = make_mesh(data=8, model=1)
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    batch_sharded = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)
    state_repl = jax.tree.map(lambda x: jax.device_put(x, rsh), state)
    _, m_shard = step(state_repl, batch_sharded)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-4
    )


def test_tensor_parallel_step_runs(model_and_state):
    """data=2 × model=4 mesh with Megatron-style TP param shardings."""
    model, opt, state = model_and_state
    step = make_byol_train_step(model, opt, donate=False)
    batch = jax.tree.map(jnp.asarray, raw_batch(seed=4))

    mesh = make_mesh(data=2, model=4)
    shardings = byol_param_shardings(mesh, state)
    state_tp = jax.tree.map(jax.device_put, state, shardings)
    bsh = batch_sharding(mesh)
    batch_tp = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)
    new_state, metrics = step(state_tp, batch_tp)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path, model_and_state):
    from nrse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    model, opt, state = model_and_state
    step = make_byol_train_step(model, opt, donate=False)
    trained, _ = step(state, jax.tree.map(jnp.asarray, raw_batch()))

    save_checkpoint(str(tmp_path), "best_val_loss", trained,
                    {"epoch": 0, "loss": 1.23, "similarity": 0.9})
    fresh = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((BATCH, T)), opt
    )
    restored, meta = restore_checkpoint(str(tmp_path), "best_val_loss", fresh)
    assert meta["loss"] == 1.23
    for a, b in zip(jax.tree.leaves(trained), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state continues training
    resumed, metrics = step(restored, jax.tree.map(jnp.asarray, raw_batch(1)))
    assert np.isfinite(float(metrics["loss"]))
    assert int(resumed.step) == int(trained.step) + 1


def test_checkpoint_rng_impl_migration(tmp_path, model_and_state):
    """Resuming a checkpoint written under a different tpu.rng_impl (key
    shape (2,) threefry vs (4,) rbg) must not fail: mismatched leaves are
    grafted from the fresh template and everything else restores (ADVICE
    r2: presets moved to rng_impl=rbg, which changed the key shape)."""
    import dataclasses

    from nrse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    model, opt, state = model_and_state
    # simulate an old threefry checkpoint: (2,) uint32 key
    old = dataclasses.replace(
        state, rng=jnp.array([1, 2], jnp.uint32), step=jnp.asarray(7, jnp.int32)
    )
    save_checkpoint(str(tmp_path), "last_model", old, {"epoch": 7})

    # resume under the new impl: (4,) uint32 template key
    fresh = dataclasses.replace(
        state, rng=jnp.array([9, 9, 9, 9], jnp.uint32)
    )
    restored, meta = restore_checkpoint(str(tmp_path), "last_model", fresh)
    assert meta["epoch"] == 7
    # the rng leaf kept the template's freshly-seeded key
    np.testing.assert_array_equal(np.asarray(restored.rng), [9, 9, 9, 9])
    # everything else came from the checkpoint
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(old.variables),
                    jax.tree.leaves(restored.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(old.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_target_buffers_not_aliased(model_and_state):
    """The target tower must be a REAL copy of the online subtrees: a buffer
    appearing twice in the donated train state is donated twice, which the
    TPU runtime rejects at execution (round-1 'donation is broken' bug)."""
    _, _, state = model_and_state
    online = state.variables.online["params"]
    target = state.variables.target["params"]
    for k in target:
        o_leaves = jax.tree.leaves(online[k])
        t_leaves = jax.tree.leaves(target[k])
        for o, t in zip(o_leaves, t_leaves):
            assert o is not t
            np.testing.assert_array_equal(np.asarray(o), np.asarray(t))


def test_train_step_attn_remat_with_layerdrop():
    """remat='attn' (inner attention-core remat) must compose with the
    lax.cond LayerDrop path — an outer scan-body remat *policy* breaks
    cond partial-eval (branches would save different residual sets), which
    is why 'attn' is implemented inside GatedAttention.  Regression for
    the round-2 TPU bench failure."""
    cfg = WavLMConfig.tiny(layerdrop=0.5, remat="attn")
    model = BYOLSpeechModel(
        {"model": {"projection_dim": 32, "prediction_dim": 64,
                   "ema_decay": 0.99}},
        encoder_config=cfg,
    )
    opt = make_byol_optimizer(1e-3, 1e-5, total_steps=10)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((BATCH, T)), opt
    )
    step = make_byol_train_step(model, opt, donate=False)
    state, metrics = step(state, raw_batch())
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

def test_attn_ln_remat_matches_noremat():
    """remat='attn+ln' (attention-core + LayerNorm remat, FFN residuals
    kept) must be a pure memory/schedule change: one train step from an
    identical init must produce the same params as remat=False.  Same RNG
    key → same dropout masks; the recomputed ops are the same f32 graph,
    so any drift would indicate a residual-selection bug, not rounding."""
    import optax

    results = {}
    for mode in (False, "attn+ln"):
        # f32 compute + plain SGD so the post-step param delta IS −lr·grad:
        # Adam's step-1 m/√ν normalisation turns the ~1e-7 reassociation
        # noise of near-zero grads into ±lr sign flips, which would force a
        # tolerance loose enough to mask a real residual-selection bug.
        cfg = WavLMConfig.tiny(layerdrop=0.0, remat=mode,
                               dtype=jnp.float32)
        model = BYOLSpeechModel(
            {"model": {"projection_dim": 32, "prediction_dim": 64,
                       "ema_decay": 0.99}},
            encoder_config=cfg,
        )
        opt = optax.sgd(1e-3)
        state = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((BATCH, T)), opt
        )
        step = make_byol_train_step(model, opt, donate=False)
        state, metrics = step(state, raw_batch())
        assert np.isfinite(float(metrics["loss"]))
        results[mode] = (
            float(metrics["loss"]),
            jax.tree.map(np.asarray, state.variables.online["params"]),
        )
    loss_a, params_a = results[False]
    loss_b, params_b = results["attn+ln"]
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7, rtol=1e-4),
        params_a, params_b,
    )
