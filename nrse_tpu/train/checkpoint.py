"""Orbax checkpointing with true resume.

Capability parity with the reference's checkpoint surface
(``train_byol.py:207-240``: ``best_val_loss`` / ``best_val_similarity`` /
``last_model``, each carrying {epoch, model state, optimizer state, loss,
similarity}), upgraded with an actual resume path — the reference saves
optimizer state but never reloads it (SURVEY.md §5 checkpoint/resume).

Layout: ``<ckpt_dir>/<name>/state`` (orbax pytree) + ``<name>/meta.json``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, name: str, state: Any,
                    metadata: Optional[Dict[str, Any]] = None) -> str:
    """Save a train-state pytree under ``ckpt_dir/name`` (overwrites)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = _checkpointer()
    state_path = os.path.join(path, "state")
    if os.path.exists(state_path):
        import shutil

        shutil.rmtree(state_path)
    ckptr.save(state_path, state)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(metadata or {}, f)
    return path


def restore_checkpoint(ckpt_dir: str, name: str, template_state: Any
                       ) -> Tuple[Any, Dict[str, Any]]:
    """Restore a checkpoint into the structure of ``template_state``.

    ``template_state`` may be a concrete pytree (its arrays are only used
    for shape/dtype/sharding templates) — the standard resume flow is:
    build a fresh state, then restore over it.

    Leaves whose shape/dtype no longer match the template are grafted over
    instead of failing the whole restore: the template's fresh value is kept
    and the mismatch logged.  The motivating case is ``tpu.rng_impl``
    migration — a threefry checkpoint stores a ``(2,)`` uint32 key while an
    rbg template expects ``(4,)``; resuming under the new impl keeps the
    freshly-seeded key (a different dropout stream, which resume never
    guaranteed across impl changes) rather than aborting.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = _checkpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        template_state,
    )
    try:
        state = ckptr.restore(os.path.join(path, "state"), abstract)
    except Exception:
        state = _graft_restore(ckpt_dir, name, template_state)
    meta_path = os.path.join(path, "meta.json")
    metadata: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata


def _graft_restore(ckpt_dir: str, name: str, template_state: Any) -> Any:
    """Fallback restore: load the checkpoint raw (nested dicts) and graft it
    onto the template by walking the template's OWN structure (dataclasses,
    namedtuples, dicts, sequences), keeping the template's fresh value — and
    logging — wherever the saved leaf's shape/dtype diverge or the key is
    absent.  Used when the strict template restore fails, e.g. after a
    ``tpu.rng_impl`` change altered the PRNG key shape ((2,) threefry vs
    (4,) rbg)."""
    import dataclasses as _dc

    import numpy as np

    from nrse_tpu.utils.logging_utils import logger

    raw = restore_checkpoint_raw(ckpt_dir, name)
    stats = {"loaded": 0, "kept": 0}

    def leaf(r, t, path):
        t_shape, t_dtype = getattr(t, "shape", None), getattr(t, "dtype", None)
        if r is None:
            if t is not None:
                logger.warning(f"restore graft: {path} absent in checkpoint "
                               "— keeping template value")
                stats["kept"] += 1
            return t
        r_arr = np.asarray(r)
        if t_shape is not None and (tuple(r_arr.shape) != tuple(t_shape)
                                    or r_arr.dtype != np.dtype(t_dtype)):
            logger.warning(
                f"restore graft: {path} mismatch (saved "
                f"{r_arr.shape}/{r_arr.dtype} vs template "
                f"{tuple(t_shape)}/{np.dtype(t_dtype)}) — keeping the fresh "
                "template value (expected after a tpu.rng_impl migration)"
            )
            stats["kept"] += 1
            return t
        stats["loaded"] += 1
        return r_arr

    def lookup(raw_node, *keys):
        if isinstance(raw_node, dict):
            for k in keys:
                if k in raw_node:
                    return raw_node[k]
        return None

    def graft(r, t, path):
        if isinstance(t, dict):
            return {k: graft(lookup(r, k, str(k)), v, f"{path}.{k}")
                    for k, v in t.items()}
        if isinstance(t, tuple) and hasattr(t, "_fields"):  # NamedTuple
            vals = [graft(lookup(r, f, str(i)), getattr(t, f), f"{path}.{f}")
                    for i, f in enumerate(t._fields)]
            return type(t)(*vals)
        if isinstance(t, (tuple, list)):
            vals = [graft(lookup(r, str(i), i), v, f"{path}[{i}]")
                    for i, v in enumerate(t)]
            return type(t)(vals) if isinstance(t, list) else tuple(vals)
        if _dc.is_dataclass(t) and not isinstance(t, type):
            kw = {f.name: graft(lookup(r, f.name), getattr(t, f.name),
                                f"{path}.{f.name}")
                  for f in _dc.fields(t)}
            return type(t)(**kw)
        if t is None:
            return None
        return leaf(r, t, path)

    out = graft(raw, template_state, "state")
    logger.info(
        f"grafted restore of {name!r}: {stats['loaded']} leaves loaded, "
        f"{stats['kept']} kept from template"
    )
    if stats["loaded"] == 0:
        raise ValueError(
            f"grafted restore of {name!r} matched no leaves — checkpoint and "
            "template structures diverged beyond an rng_impl migration"
        )
    return out


def restore_checkpoint_raw(ckpt_dir: str, name: str) -> Any:
    """Restore a checkpoint as raw nested dicts/arrays (no template).

    Useful for partial extraction (e.g. pulling only the encoder subtree out
    of a BYOL train state whose optimizer structure is unknown)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name, "state"))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Name of the most recently written checkpoint in a directory."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_t = None, -1.0
    for name in os.listdir(ckpt_dir):
        meta = os.path.join(ckpt_dir, name, "meta.json")
        if os.path.exists(meta):
            t = os.path.getmtime(meta)
            if t > best_t:
                best, best_t = name, t
    return best
