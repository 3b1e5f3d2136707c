"""Fused AdamW + BYOL-EMA optimizer step as a single Pallas pass per leaf.

The round-3 profile puts the optimizer + EMA tail at ~26 ms/step on the
flagship workload against a ~15 ms HBM floor (315 M f32 params: read
g/p/mu/nu/target + the clip-norm pass, write p/mu/nu/target).  XLA
splits the work into several elementwise fusions (clip-scale, Adam
moment update, weight-decay + apply, EMA lerp), re-reading intermediate
streams between them.  This kernel does the whole per-parameter update
in ONE HBM pass:

    ghat = g * clip_scale                 (global-norm scale, computed
                                           once in XLA from the already-
                                           needed grad_norm metric)
    mu'  = b1*mu + (1-b1)*ghat            (stored in mu's dtype)
    nu'  = b2*nu + (1-b2)*ghat^2
    p'   = p - lr*(mu'/bc1 / (sqrt(nu'/bc2) + eps) + wd*p)
    pt'  = ema*pt + (1-ema)*p'            (BYOL target, where present)

Numerics match ``optax.chain(clip_by_global_norm, adamw)`` followed by
the model's EMA lerp exactly (same operation order, f32 compute); the
optax state pytree (``ScaleByAdamState``) is preserved structurally so
checkpoints are interchangeable with the XLA path.  Leaves too small or
oddly shaped for the kernel (last dim not lane-aligned, < 128 Ki
elements) fall back to the same formula in XLA — their traffic is
negligible.

Reference behaviour covered: torch AdamW + grad-clip 1.0 + per-step
cosine LR + explicit EMA target loop (``/root/reference/train_byol.py:
67-71,143-150``, ``/root/reference/src/models/byol.py:62-73``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# minimum leaf size for the kernel path; below it the XLA fallback's
# traffic is irrelevant and per-kernel dispatch overhead would dominate
_MIN_ELEMENTS = 128 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024
# scalar vector layout (SMEM): [clip_scale, lr, b1, b2, 1/bc1, 1/bc2,
#                               wd, eps, ema]
_N_SCALARS = 9


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _adamw_kernel(sc_ref, g_ref, p_ref, mu_ref, nu_ref,
                  p_out, mu_out, nu_out):
    ghat = g_ref[...].astype(jnp.float32) * sc_ref[0]
    mu = sc_ref[2] * mu_ref[...].astype(jnp.float32) + (1.0 - sc_ref[2]) * ghat
    nu = sc_ref[3] * nu_ref[...].astype(jnp.float32) \
        + (1.0 - sc_ref[3]) * ghat * ghat
    p = p_ref[...].astype(jnp.float32)
    upd = (mu * sc_ref[4]) / (jnp.sqrt(nu * sc_ref[5]) + sc_ref[7]) \
        + sc_ref[6] * p
    p_new = p - sc_ref[1] * upd
    p_out[...] = p_new.astype(p_out.dtype)
    mu_out[...] = mu.astype(mu_out.dtype)
    nu_out[...] = nu.astype(nu_out.dtype)


def _adamw_ema_kernel(sc_ref, g_ref, p_ref, mu_ref, nu_ref, pt_ref,
                      p_out, mu_out, nu_out, pt_out):
    ghat = g_ref[...].astype(jnp.float32) * sc_ref[0]
    mu = sc_ref[2] * mu_ref[...].astype(jnp.float32) + (1.0 - sc_ref[2]) * ghat
    nu = sc_ref[3] * nu_ref[...].astype(jnp.float32) \
        + (1.0 - sc_ref[3]) * ghat * ghat
    p = p_ref[...].astype(jnp.float32)
    upd = (mu * sc_ref[4]) / (jnp.sqrt(nu * sc_ref[5]) + sc_ref[7]) \
        + sc_ref[6] * p
    p_new = p - sc_ref[1] * upd
    p_out[...] = p_new.astype(p_out.dtype)
    mu_out[...] = mu.astype(mu_out.dtype)
    nu_out[...] = nu.astype(nu_out.dtype)
    pt_out[...] = (sc_ref[8] * pt_ref[...].astype(jnp.float32)
                   + (1.0 - sc_ref[8]) * p_new).astype(pt_out.dtype)


def _kernel_geometry(shape) -> Optional[tuple]:
    """(rows, cols, block_rows) for the 2-D kernel view, or None when the
    leaf should take the XLA fallback."""
    n = 1
    for s in shape:
        n *= s
    if n < _MIN_ELEMENTS or not shape:
        return None
    cols = shape[-1]
    if cols % 128:
        return None
    rows = n // cols
    if rows % 8:
        return None
    # ≤2 MB f32 blocks: the EMA variant runs 9 VMEM streams
    # (g/p/mu/nu/pt in + p/mu/nu/pt out), each double-buffered by
    # Mosaic — 9 × 2 × 2 MB = 36 MB, comfortably inside the 64 MB
    # scoped-VMEM limit.  (4 MB blocks measured-failed on the real chip:
    # 72 MB scoped allocation on a [24576, 1024] scan-stacked leaf.)
    cap = max(8, (1 << 19) // cols)
    br = 8
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= cap and rows % cand == 0:
            br = cand
            break
    return rows, cols, br


def _leaf_update_xla(sc, g, p, mu, nu, pt):
    ghat = g.astype(jnp.float32) * sc[0]
    mu_n = sc[2] * mu.astype(jnp.float32) + (1.0 - sc[2]) * ghat
    nu_n = sc[3] * nu.astype(jnp.float32) + (1.0 - sc[3]) * ghat * ghat
    pf = p.astype(jnp.float32)
    upd = (mu_n * sc[4]) / (jnp.sqrt(nu_n * sc[5]) + sc[7]) + sc[6] * pf
    p_n = pf - sc[1] * upd
    out_pt = None
    if pt is not None:
        out_pt = (sc[8] * pt.astype(jnp.float32)
                  + (1.0 - sc[8]) * p_n).astype(pt.dtype)
    return p_n.astype(p.dtype), mu_n.astype(mu.dtype), nu_n.astype(nu.dtype), \
        out_pt


def _leaf_update(sc, g, p, mu, nu, pt):
    """One-leaf fused update; returns (p', mu', nu', pt'|None).

    Under a model>1 mesh (``parallel.mesh.tp_model_parallel``) some param
    leaves are GSPMD-sharded over the model axis; a pallas_call (opaque
    to GSPMD) would force a gather, so the whole update falls back to the
    same formula in XLA — elementwise ops partition cleanly (mirrors the
    fused-FFN fallback)."""
    from nrse_tpu.parallel.mesh import tp_model_parallel

    geom = _kernel_geometry(p.shape)
    if geom is None or tp_model_parallel():
        return _leaf_update_xla(sc, g, p, mu, nu, pt)
    rows, cols, br = geom
    shape2 = (rows, cols)
    vm = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    blk = lambda r_: (r_, 0)  # noqa: E731
    vspec = pl.BlockSpec((br, cols), blk, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ema = pt is not None
    args = [sc, g.reshape(shape2), p.reshape(shape2),
            mu.reshape(shape2), nu.reshape(shape2)]
    in_specs = [smem, vspec, vspec, vspec, vspec]
    out_shape = [
        jax.ShapeDtypeStruct(shape2, p.dtype),
        jax.ShapeDtypeStruct(shape2, mu.dtype),
        jax.ShapeDtypeStruct(shape2, nu.dtype),
    ]
    out_specs = [vspec, vspec, vspec]
    # donated state: write the new p/mu/nu/pt over the old buffers
    aliases = {2: 0, 3: 1, 4: 2}
    if ema:
        args.append(pt.reshape(shape2))
        in_specs.append(vspec)
        out_shape.append(jax.ShapeDtypeStruct(shape2, pt.dtype))
        out_specs.append(vspec)
        aliases[5] = 3
        kern = _adamw_ema_kernel
    else:
        kern = _adamw_kernel
    outs = pl.pallas_call(
        kern,
        grid=(rows // br,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=vm,
        interpret=_interpret(),
    )(*args)
    p_n, mu_n, nu_n = outs[:3]
    pt_n = outs[3].reshape(pt.shape) if ema else None
    return (p_n.reshape(p.shape), mu_n.reshape(mu.shape),
            nu_n.reshape(nu.shape), pt_n)


# ---------------------------------------------------------------------------
# optax-state plumbing
# ---------------------------------------------------------------------------

def _find_adam_state(state):
    """Locate the unique ``ScaleByAdamState`` in a (possibly chain-nested)
    optax state and return (node, rebuild_fn)."""
    if isinstance(state, optax.ScaleByAdamState):
        return state, lambda new: new
    if isinstance(state, tuple):
        for i, sub in enumerate(state):
            found = _find_adam_state(sub)
            if found is not None:
                node, rebuild = found

                def outer(new, i=i, rebuild=rebuild, state=state):
                    rebuilt = rebuild(new)
                    if hasattr(state, "_replace") and hasattr(state, "_fields"):
                        return state._replace(
                            **{state._fields[i]: rebuilt})
                    return state[:i] + (rebuilt,) + state[i + 1:]

                return node, outer
    return None


def _bump_other_counts(state, count_inc):
    """Advance the step ``count`` of every stateful optax node the fused
    path bypasses (``scale_by_schedule``'s count when adamw is built with
    a schedule, ``inject_hyperparams``'s, ...).  Without this, a
    checkpoint written by the fused path and resumed on the XLA optax
    path would re-evaluate the LR schedule at its stale (init-time)
    count — the documented checkpoint interchangeability requires every
    count in the tree to advance exactly as ``optimizer.update`` would
    advance it.  The ``ScaleByAdamState`` node is excluded: its count is
    already set by the caller."""
    if isinstance(state, optax.ScaleByAdamState):
        return state
    if hasattr(state, "_fields") and "count" in state._fields:
        state = state._replace(count=count_inc)
    if isinstance(state, tuple):
        rebuilt = type(state)(*(
            _bump_other_counts(sub, count_inc) for sub in state
        )) if hasattr(state, "_fields") else tuple(
            _bump_other_counts(sub, count_inc) for sub in state)
        return rebuilt
    return state


@dataclasses.dataclass(frozen=True)
class FusedAdamWSpec:
    """Hyperparameters of the fused optimizer+EMA step.  ``schedule`` is
    the LR schedule (callable of the Adam step count) or a constant."""

    schedule: Any
    weight_decay: float = 1e-5
    clip_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    ema_decay: float = 0.997


def fused_adamw_ema_update(
    grads: Any,
    params: Any,
    opt_state: Any,
    target_params: Any,
    spec: FusedAdamWSpec,
    grad_norm: Optional[jnp.ndarray] = None,
):
    """Apply the fused step.  ``target_params`` is the BYOL target tree —
    a sub-pytree of ``params`` keyed by the shared top-level collections
    (encoder/projector); leaves present there get the EMA lerp fused in.

    Returns ``(new_params, new_opt_state, new_target_params)`` with
    ``new_opt_state`` structurally identical to the optax chain's.
    """
    found = _find_adam_state(opt_state)
    if found is None:
        raise ValueError("opt_state contains no ScaleByAdamState — "
                         "fused optimizer requires an adamw-based chain")
    adam, rebuild = found
    count_inc = optax.safe_increment(adam.count)
    cf = count_inc.astype(jnp.float32)
    # optax convention: scale_by_schedule evaluates the LR at the
    # PRE-increment count (step 0 on the first update); bias correction
    # uses the incremented count
    lr = spec.schedule(adam.count) if callable(spec.schedule) \
        else jnp.float32(spec.schedule)
    if grad_norm is None:
        grad_norm = optax.global_norm(grads)
    clip_scale = jnp.where(
        grad_norm < spec.clip_norm,
        jnp.float32(1.0),
        spec.clip_norm / jnp.maximum(grad_norm, 1e-30),
    )
    sc = jnp.stack([
        clip_scale.astype(jnp.float32),
        jnp.asarray(lr, jnp.float32),
        jnp.float32(spec.b1),
        jnp.float32(spec.b2),
        1.0 / (1.0 - jnp.float32(spec.b1) ** cf),
        1.0 / (1.0 - jnp.float32(spec.b2) ** cf),
        jnp.float32(spec.weight_decay),
        jnp.float32(spec.eps),
        jnp.float32(spec.ema_decay),
    ])

    flat_p, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_mu = jax.tree_util.tree_leaves(adam.mu)
    flat_nu = jax.tree_util.tree_leaves(adam.nu)
    # map each param path to its target leaf (if the path's head is a
    # shared collection) — paths inside a collection are identical
    tgt_index = {}
    if target_params is not None:
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                target_params)[0]:
            tgt_index[tuple(str(k) for k in path)] = leaf

    new_p, new_mu, new_nu = [], [], []
    new_tgt = dict(tgt_index)
    for (path, p), g, mu, nu in zip(flat_p, flat_g, flat_mu, flat_nu):
        key = tuple(str(k) for k in path)
        pt = tgt_index.get(key)
        p_n, mu_n, nu_n, pt_n = _leaf_update(sc, g, p, mu, nu, pt)
        new_p.append(p_n)
        new_mu.append(mu_n)
        new_nu.append(nu_n)
        if pt is not None:
            new_tgt[key] = pt_n

    unflatten = jax.tree_util.tree_unflatten
    params_n = unflatten(treedef, new_p)
    mu_n = unflatten(jax.tree_util.tree_structure(adam.mu), new_mu)
    nu_n = unflatten(jax.tree_util.tree_structure(adam.nu), new_nu)
    target_n = None
    if target_params is not None:
        t_flat, t_def = jax.tree_util.tree_flatten_with_path(target_params)
        target_n = unflatten(
            jax.tree_util.tree_structure(target_params),
            [new_tgt[tuple(str(k) for k in path)] for path, _ in t_flat],
        )
    opt_state_n = rebuild(optax.ScaleByAdamState(
        count=count_inc, mu=mu_n, nu=nu_n))
    opt_state_n = _bump_other_counts(opt_state_n, count_inc)
    return params_n, opt_state_n, target_n
