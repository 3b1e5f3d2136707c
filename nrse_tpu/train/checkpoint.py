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
    """
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = _checkpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        template_state,
    )
    state = ckptr.restore(os.path.join(path, "state"), abstract)
    meta_path = os.path.join(path, "meta.json")
    metadata: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata


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
