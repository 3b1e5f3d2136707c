"""Fused Pallas AdamW+EMA step vs the optax reference chain.

Leaf-level parity (kernel path in interpret mode + XLA fallback path) and
end-to-end train-step parity on the tiny BYOL model.  Oracle:
``optax.chain(clip_by_global_norm, adamw)`` + the model's EMA lerp —
exactly what the XLA branch of ``make_byol_train_step`` runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nrse_tpu.ops.fused_optimizer import (
    FusedAdamWSpec,
    _kernel_geometry,
    fused_adamw_ema_update,
)
from nrse_tpu.train.schedules import cosine_annealing, make_byol_optimizer

EMA = 0.993


def make_tree(seed=0):
    rng = np.random.default_rng(seed)
    # 'w' is kernel-eligible (1024*256 = 256 Ki elements); the rest take
    # the XLA fallback (small / lane-misaligned)
    params = {
        "encoder": {
            "w": jnp.asarray(rng.standard_normal((1024, 256)), jnp.float32),
            "b": jnp.asarray(rng.standard_normal((256,)), jnp.float32),
        },
        "predictor": {
            "w": jnp.asarray(rng.standard_normal((64, 48)), jnp.float32),
        },
    }
    target = {
        "encoder": jax.tree.map(lambda x: x + 0.1, params["encoder"]),
    }
    return params, target


def grads_like(params, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda x: jnp.asarray(
            scale * rng.standard_normal(x.shape), jnp.float32), params)


def reference_step(optimizer, schedule, params, opt_state, target, grads):
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    target = jax.tree.map(
        lambda t, o: EMA * t + (1.0 - EMA) * o, target,
        {"encoder": params["encoder"]})
    return params, opt_state, target


def assert_trees_close(a, b, tol, what, atol=1e-7):
    """Elementwise |a-b| ≤ atol + tol·|b| — the atol floor keeps
    zeros-initialised leaves (LN biases) from inflating relative error."""
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        assert pa == pb
        la, lb = np.asarray(la, np.float64), np.asarray(lb, np.float64)
        worst = np.abs(la - lb) - (atol + tol * np.abs(lb))
        assert worst.max() <= 0, (
            f"{what}{jax.tree_util.keystr(pa)}: max |a-b| "
            f"{np.abs(la - lb).max():.3e} vs |b|max {np.abs(lb).max():.3e}"
        )


def test_kernel_geometry_gate():
    assert _kernel_geometry((1024, 256)) is not None
    assert _kernel_geometry((64, 48)) is None          # misaligned + small
    assert _kernel_geometry((256,)) is None            # too small
    rows, cols, br = _kernel_geometry((24, 4096, 1024))
    assert rows == 24 * 4096 and cols == 1024 and rows % br == 0
    # scoped-VMEM bound: 9 double-buffered streams of one block each must
    # fit the 64 MB limit (the [24576, 1024] scan-stacked leaf OOM'd at
    # 72 MB with 4 MB blocks on the real chip)
    for shape in ((24576, 1024), (24, 4096, 1024), (512, 512),
                  (24, 1024, 3072)):
        geom = _kernel_geometry(shape)
        if geom is None:
            continue
        r, c, b = geom
        assert 9 * 2 * b * c * 4 <= 60 * 1024 * 1024, (shape, geom)


@pytest.mark.parametrize("grad_scale", [0.001, 5.0])  # clip off / engaged
def test_matches_optax_chain(grad_scale):
    schedule = cosine_annealing(3e-4, 50)
    optimizer = make_byol_optimizer(schedule, weight_decay=0.01,
                                    total_steps=50)
    spec = FusedAdamWSpec(schedule=schedule, weight_decay=0.01,
                          ema_decay=EMA)
    params, target = make_tree()
    opt_state = optimizer.init(params)
    f_params, f_target, f_state = params, target, opt_state
    for step in range(3):
        grads = grads_like(params, 100 + step, scale=grad_scale)
        params, opt_state, target = reference_step(
            optimizer, schedule, params, opt_state, target, grads)
        f_params, f_state, f_target = fused_adamw_ema_update(
            grads, f_params, f_state, f_target, spec)
    assert_trees_close(f_params, params, 1e-5, "params")
    assert_trees_close(f_target, target, 1e-5, "target")
    ref_adam = opt_state[1][0]
    fus_adam = f_state[1][0]
    assert int(fus_adam.count) == int(ref_adam.count) == 3
    assert_trees_close(fus_adam.mu, ref_adam.mu, 1e-5, "mu")
    # nu amplifies 1-ulp differences in the clipped gradient (squared,
    # then scaled by 1-b2=1e-3) — measured ~1.3e-5 pure-FP association
    # noise between (g/norm)*c and g*(c/norm)
    assert_trees_close(fus_adam.nu, ref_adam.nu, 1e-4, "nu")


def test_fused_optimizer_dp_mesh_matches_single_device():
    """Under a registered pure-DP mesh (data>1, model==1 — the pod config
    the shipped default preset meets) params/opt state are replicated, so
    the fused kernel executes replicated per device; the update must match
    the unmeshed kernel exactly.  Pins `dryrun_multichip`'s pure-DP leg
    running `optimizer_impl: fused` (round-3 verdict item 4)."""
    from nrse_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        set_flash_tp_mesh,
    )

    schedule = cosine_annealing(3e-4, 50)
    spec = FusedAdamWSpec(schedule=schedule, weight_decay=0.01,
                          ema_decay=EMA)
    optimizer = make_byol_optimizer(schedule, weight_decay=0.01,
                                    total_steps=50)
    params, target = make_tree(seed=3)
    opt_state = optimizer.init(params)
    grads = grads_like(params, 17)

    base = fused_adamw_ema_update(grads, params, opt_state, target, spec)

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    rsh = replicated_sharding(mesh)
    put = lambda tree: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(x, rsh), tree)
    set_flash_tp_mesh(mesh)
    try:
        step = jax.jit(lambda g, p, s, t: fused_adamw_ema_update(
            g, p, s, t, spec))
        dp = step(put(grads), put(params), put(opt_state), put(target))
    finally:
        set_flash_tp_mesh(None)

    assert_trees_close(dp[0], base[0], 1e-6, "params")
    assert_trees_close(dp[2], base[2], 1e-6, "target")
    assert_trees_close(dp[1][1][0].mu, base[1][1][0].mu, 1e-6, "mu")
    assert_trees_close(dp[1][1][0].nu, base[1][1][0].nu, 1e-6, "nu")


def test_mu_dtype_bf16():
    schedule = 1e-3
    optimizer = make_byol_optimizer(schedule, weight_decay=0.0,
                                    mu_dtype=jnp.bfloat16)
    spec = FusedAdamWSpec(schedule=schedule, weight_decay=0.0,
                          ema_decay=EMA)
    params, target = make_tree(seed=2)
    opt_state = optimizer.init(params)
    grads = grads_like(params, 7)
    p_ref, s_ref, t_ref = reference_step(
        optimizer, schedule, params, opt_state, target, grads)
    p_f, s_f, t_f = fused_adamw_ema_update(
        grads, params, opt_state, target, spec)
    mu_f = s_f[1][0].mu["encoder"]["w"]
    assert mu_f.dtype == jnp.bfloat16
    assert_trees_close(p_f, p_ref, 2e-3, "params(bf16-mu)")
    assert_trees_close(s_f[1][0].mu, s_ref[1][0].mu, 1e-2, "mu(bf16)")


def test_schedule_count_advances_with_adam_count():
    """Every stateful count in the optax tree must advance under the
    fused path (not only ScaleByAdamState's) — otherwise a fused-path
    checkpoint resumed on the XLA path re-evaluates the LR schedule at
    its stale init-time count and the LR jumps back to peak."""
    schedule = cosine_annealing(3e-4, 50)
    optimizer = make_byol_optimizer(schedule, total_steps=50)
    spec = FusedAdamWSpec(schedule=schedule, ema_decay=EMA)
    params, target = make_tree(seed=4)
    opt_state = optimizer.init(params)
    ref_state = opt_state
    for step in range(2):
        grads = grads_like(params, 40 + step)
        _, ref_state = optimizer.update(grads, ref_state, params)
        params, opt_state, target = fused_adamw_ema_update(
            grads, params, opt_state, target, spec)

    def counts(state):
        out = []

        def walk(node):
            if hasattr(node, "_fields") and "count" in node._fields:
                out.append(int(node.count))
            if isinstance(node, tuple):
                for sub in node:
                    walk(sub)

        walk(state)
        return out

    ref_counts, fus_counts = counts(ref_state), counts(opt_state)
    assert fus_counts == ref_counts
    assert len(fus_counts) >= 2 and all(c == 2 for c in fus_counts), (
        f"expected every stateful count at 2, got {fus_counts} "
        "(the adamw(schedule) chain keeps a ScaleByScheduleState too)")


def test_state_tree_structure_preserved():
    optimizer = make_byol_optimizer(1e-3)
    params, target = make_tree(seed=3)
    opt_state = optimizer.init(params)
    _, new_state, _ = fused_adamw_ema_update(
        grads_like(params, 1), params, opt_state, target,
        FusedAdamWSpec(schedule=1e-3, ema_decay=EMA))
    assert (jax.tree_util.tree_structure(new_state)
            == jax.tree_util.tree_structure(opt_state))


def test_byol_train_step_fused_matches_xla():
    """End-to-end: the fused-optimizer train step equals the optax step on
    the tiny BYOL model (all leaves take the documented XLA fallback at
    this scale — kernel-path parity is pinned by the leaf tests above and
    the on-TPU CHECK_ONLY probe)."""
    from nrse_tpu.models.byol import BYOLSpeechModel
    from nrse_tpu.models.wavlm import WavLMConfig
    from nrse_tpu.train.byol_trainer import (
        create_train_state,
        make_byol_train_step,
    )

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    model = BYOLSpeechModel(
        {"model": {"projection_dim": 16, "prediction_dim": 32,
                   "ema_decay": EMA}},
        encoder_config=cfg,
    )
    schedule = cosine_annealing(1e-4, 100)
    optimizer = make_byol_optimizer(schedule, weight_decay=1e-5,
                                    total_steps=100)
    rng = np.random.default_rng(0)
    batch = {
        "clean": jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32),
        "noise": jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32),
        "snr": jnp.asarray([5.0, 10.0], jnp.float32),
    }
    state0 = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 8000)), optimizer)

    step_xla = make_byol_train_step(model, optimizer, donate=False)
    step_fused = make_byol_train_step(
        model, optimizer, donate=False,
        fused_optimizer=FusedAdamWSpec(
            schedule=schedule, weight_decay=1e-5, ema_decay=EMA))

    s_x, m_x = step_xla(state0, batch)
    s_f, m_f = step_fused(state0, batch)
    assert np.isclose(float(m_x["loss"]), float(m_f["loss"]))
    assert_trees_close(s_f.variables.online["params"],
                       s_x.variables.online["params"], 1e-5, "online")
    assert_trees_close(s_f.variables.target["params"],
                       s_x.variables.target["params"], 1e-5, "target")
    assert (jax.tree_util.tree_structure(s_f.opt_state)
            == jax.tree_util.tree_structure(s_x.opt_state))
