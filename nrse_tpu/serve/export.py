"""AOT export / load of serving artifacts (``jax.export`` StableHLO).

Artifact layout (one directory):

    manifest.json                 — model kind, buckets, shapes, dtypes,
                                    sample rate, clip seconds, config
    embed_b{B}.stablehlo          — one serialized Exported per batch
                                    bucket (platforms cpu + tpu; weights
                                    baked in as constants, or — with
                                    ``bake_weights=False`` — passed as a
                                    runtime argument)
    params.msgpack                — the weights pytree (unbaked exports
                                    only; loaded once at serving startup,
                                    like the reference's final_*.pt)

Two exporters cover the framework's serving surfaces:

  * :func:`export_embedder` — the deterministic WavLM forward, raw audio
    ``[B, T]`` (+ optional ``[B, T]`` attention mask) → ``(sequence
    [B, T', C], pooled [B, C])``.  This is what ``evaluate_byol`` and the
    BYOL downstream consumers run per request.
  * :func:`export_classifier` — the SER classifier
    (``models/emotion.py``), audio + mask → logits ``[B, 8]`` (or the
    dimensional head's ``[B, 3]``), the surface the reference's baseline
    evaluator times as "inference time per audio second"
    (``/root/reference/baseline/eval_cat_ser_weighted_with_list.py:383-385``).

Batch buckets: serving traffic is ragged; each exported blob is compiled
for one static batch size and :class:`ServingModel` routes a request to
the smallest bucket that fits (padding rows, slicing results) — static
shapes are what XLA:TPU needs, bucketing is how a serving process avoids
per-request recompiles.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence

import numpy as np

_MANIFEST = "manifest.json"


def _export_fn(fn, example_args, platforms=("cpu", "tpu"),
               strict_platform_check: bool = True):
    import jax
    from jax import export as jexport

    # strict_platform_check=False bakes a DisabledSafetyCheck.platform()
    # into the artifact, for serving runtimes that surface real TPU
    # silicon under an aliased PJRT platform name (e.g. the remote-TPU
    # tunnel's "axon") — jax.export's call-time check compares raw
    # lowering-platform strings and would reject the alias.  The artifact
    # is still lowered strictly for `platforms`; disabling only skips the
    # name comparison at call time.  Keep the default strict: a
    # mismatched-platform load should fail with jax.export's clear
    # call-time error, not late or with undefined behavior.
    checks = [] if strict_platform_check \
        else [jexport.DisabledSafetyCheck.platform()]
    return jexport.export(
        jax.jit(fn), platforms=tuple(platforms), disabled_checks=checks,
    )(*example_args)


def _config_meta(config) -> Dict[str, Any]:
    meta = {}
    for f in dataclasses.fields(config):
        v = getattr(config, f.name)
        try:
            json.dumps(v)
        except TypeError:
            v = str(v)
        meta[f.name] = v
    return meta


def _write_weights(out_dir: str, variables) -> str:
    """Serialize the variables pytree to ``params.msgpack`` next to the
    program blobs (flax msgpack — nested dicts of arrays, bf16-aware).
    Returns the filename recorded in the manifest."""
    import jax
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    name = "params.msgpack"
    with open(os.path.join(out_dir, name), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.device_get(variables)))
    return name


def _write_artifact(out_dir: str, kind: str, blobs: Dict[int, bytes],
                    manifest_extra: Dict[str, Any]) -> str:
    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "kind": kind,
        "buckets": sorted(blobs),
        "files": {str(b): f"{kind}_b{b}.stablehlo" for b in blobs},
        **manifest_extra,
    }
    for b, blob in blobs.items():
        with open(os.path.join(out_dir, manifest["files"][str(b)]),
                  "wb") as f:
            f.write(blob)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


def export_embedder(variables, config, out_dir: str,
                    batch_sizes: Sequence[int] = (1, 8),
                    clip_seconds: float = 5.0, sample_rate: int = 16000,
                    with_mask: bool = True,
                    platforms: Sequence[str] = ("cpu", "tpu"),
                    strict_platform_check: bool = True,
                    bake_weights: bool = True) -> str:
    """Export the deterministic encoder forward for each batch bucket.

    ``variables``: the encoder's flax variables (``{'params': ...}``) —
    e.g. the BYOL online encoder subtree a checkpoint stores.

    ``bake_weights=True`` embeds them into the StableHLO as constants
    (fully self-contained blob); ``False`` exports the weights as a
    runtime *argument* and writes them to ``params.msgpack`` alongside —
    the blob shrinks from ~weights-size to ~program-size (WavLM-large:
    630 MB → ~5 MB), which serving stacks that POST modules to a remote
    compiler require (the TPU-tunnel's /remote_compile rejects >~few
    hundred MB bodies with HTTP 413), and the weights load the way the
    reference's serving path loads ``final_*.pt`` — separately from the
    program (eval_cat_ser_weighted_with_list.py:153-206).  Pass
    ``strict_platform_check=False`` only for aliased-platform runtimes
    (see ``_export_fn``).
    """
    import jax.numpy as jnp

    from nrse_tpu.models.wavlm import WavLMModel

    model = WavLMModel(config)
    t = int(clip_seconds * sample_rate)

    if bake_weights:
        def fwd(audio, mask):
            return model.apply(variables, audio, attention_mask=mask,
                               deterministic=True)

        def fwd_nomask(audio):
            return model.apply(variables, audio, deterministic=True)
    else:
        def fwd(params, audio, mask):
            return model.apply(params, audio, attention_mask=mask,
                               deterministic=True)

        def fwd_nomask(params, audio):
            return model.apply(params, audio, deterministic=True)

    blobs = {}
    for b in batch_sizes:
        ex = (jnp.zeros((b, t), jnp.float32),
              jnp.ones((b, t), jnp.int32))
        if not with_mask:
            ex = ex[:1]
        if not bake_weights:
            ex = (variables,) + ex
        blobs[b] = _export_fn(
            fwd if with_mask else fwd_nomask, ex, platforms=platforms,
            strict_platform_check=strict_platform_check,
        ).serialize()
    extra = {
        "with_mask": with_mask,
        "clip_seconds": clip_seconds,
        "sample_rate": sample_rate,
        "outputs": ["sequence", "pooled"],
        "encoder_config": _config_meta(config),
    }
    if not bake_weights:
        extra["weights"] = _write_weights(out_dir, variables)
    return _write_artifact(out_dir, "embed", blobs, extra)


def export_classifier(classifier, variables, out_dir: str,
                      batch_sizes: Sequence[int] = (1, 8),
                      clip_seconds: float = 5.0, sample_rate: int = 16000,
                      task: str = "both",
                      bake_weights: bool = True) -> str:
    """Export the SER classifier forward (audio + mask → logits).

    ``task``: "categorical" (8-class logits), "dimensional" (A/V/D
    values) or "both" — matching ``EmotionClassifier.__call__``.
    ``bake_weights`` as in :func:`export_embedder`."""
    import jax.numpy as jnp

    t = int(clip_seconds * sample_rate)

    if bake_weights:
        def fwd(audio, mask):
            cat, dim = classifier.apply(variables, audio, mask, task,
                                        deterministic=True)
            return tuple(o for o in (cat, dim) if o is not None)
    else:
        def fwd(params, audio, mask):
            cat, dim = classifier.apply(params, audio, mask, task,
                                        deterministic=True)
            return tuple(o for o in (cat, dim) if o is not None)

    blobs = {}
    for b in batch_sizes:
        ex = (jnp.zeros((b, t), jnp.float32), jnp.ones((b, t), jnp.int32))
        if not bake_weights:
            ex = (variables,) + ex
        blobs[b] = _export_fn(fwd, ex).serialize()
    outputs = {"categorical": ["categorical_logits"],
               "dimensional": ["dimensional_values"],
               "both": ["categorical_logits", "dimensional_values"]}[task]
    extra = {
        "with_mask": True,
        "clip_seconds": clip_seconds,
        "sample_rate": sample_rate,
        "task": task,
        "outputs": outputs,
        "encoder_config": _config_meta(classifier.encoder_config),
    }
    if not bake_weights:
        extra["weights"] = _write_weights(out_dir, variables)
    return _write_artifact(out_dir, "classify", blobs, extra)


class ServingModel:
    """Loads an artifact directory and serves ragged batches.

    Requests route to the smallest exported bucket that fits (rows padded
    with zeros / masked invalid, outputs sliced back).  No model code or
    checkpoint machinery is needed at serving time — only ``jax`` and the
    artifact.
    """

    def __init__(self, artifact_dir: str):
        from jax import export as jexport

        with open(os.path.join(artifact_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.buckets = {}
        for b in self.manifest["buckets"]:
            path = os.path.join(
                artifact_dir, self.manifest["files"][str(b)]
            )
            with open(path, "rb") as f:
                self.buckets[int(b)] = jexport.deserialize(f.read())
        self.with_mask = self.manifest.get("with_mask", True)
        self.clip_samples = int(self.manifest["clip_seconds"]
                                * self.manifest["sample_rate"])
        # unbaked artifact: weights live beside the program (the way the
        # reference's serving path loads final_*.pt separately) and are
        # staged onto the device ONCE here — each call then reuses the
        # resident buffers instead of re-uploading ~630 MB per request
        self.params = None
        if "weights" in self.manifest:
            import jax
            from flax import serialization

            with open(os.path.join(artifact_dir,
                                   self.manifest["weights"]), "rb") as f:
                restored = serialization.msgpack_restore(f.read())
            self.params = jax.device_put(restored)

    def _bucket_for(self, n: int) -> int:
        for b in sorted(self.buckets):
            if b >= n:
                return b
        return max(self.buckets)

    def __call__(self, audio: np.ndarray,
                 mask: Optional[np.ndarray] = None):
        """``audio [N, T]`` (T ≤ the exported clip length; shorter audio
        is zero-padded and masked) → outputs with the padding rows
        sliced off.  N larger than the biggest bucket is chunked."""
        import jax.numpy as jnp

        audio = np.asarray(audio, np.float32)
        n, t = audio.shape
        if t > self.clip_samples:
            raise ValueError(
                f"audio length {t} exceeds the exported clip length "
                f"{self.clip_samples}"
            )
        if mask is None:
            mask = np.zeros((n, self.clip_samples), np.int32)
            mask[:, :t] = 1
        elif mask.shape[1] != self.clip_samples:
            mask = np.pad(np.asarray(mask, np.int32),
                          ((0, 0), (0, self.clip_samples - mask.shape[1])))
        if t < self.clip_samples:
            audio = np.pad(audio, ((0, 0), (0, self.clip_samples - t)))

        outs = []
        start = 0
        while start < n:
            chunk = min(n - start, max(self.buckets))
            b = self._bucket_for(chunk)
            a = np.zeros((b, self.clip_samples), np.float32)
            m = np.zeros((b, self.clip_samples), np.int32)
            a[:chunk] = audio[start:start + chunk]
            m[:chunk] = mask[start:start + chunk]
            # padding rows keep an all-zero mask; the model's masked
            # pooling/attention ignores them and the rows are sliced off
            m[chunk:, 0] = 1  # avoid fully-empty frame counts downstream
            args = (jnp.asarray(a), jnp.asarray(m)) if self.with_mask \
                else (jnp.asarray(a),)
            if self.params is not None:
                args = (self.params,) + args
            res = self.buckets[b].call(*args)
            res = res if isinstance(res, (tuple, list)) else (res,)
            outs.append(tuple(np.asarray(r)[:chunk] for r in res))
            start += chunk
        joined = tuple(np.concatenate(parts) for parts in zip(*outs))
        return joined if len(joined) > 1 else joined[0]


def load_serving_model(artifact_dir: str) -> ServingModel:
    return ServingModel(artifact_dir)


def main(argv=None):
    """CLI: export a BYOL checkpoint's online encoder as a serving
    artifact.

        python -m nrse_tpu.serve.export --config <preset.yaml> \\
            --checkpoint checkpoints/byol/.../best_val_loss \\
            --out artifacts/embedder --batch-sizes 1,8
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir written by train_byol.py")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-sizes", default="1,8")
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)

    from nrse_tpu.config import get_config

    cfg_args = ["--config", args.config]
    if args.device:
        cfg_args += ["--device", args.device]
    config = get_config(cfg_args)

    from nrse_tpu.train.categorical_emotions import _encoder_config_from
    from nrse_tpu.train.checkpoint import restore_checkpoint_raw

    ckpt_dir, name = os.path.split(args.checkpoint.rstrip("/"))
    raw = restore_checkpoint_raw(ckpt_dir, name)
    encoder = raw["variables"]["online"]["params"]["encoder"]
    enc_cfg = _encoder_config_from(config)
    out = export_embedder(
        {"params": encoder}, enc_cfg, args.out,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        clip_seconds=float(config["data"].get("max_audio_length", 5.0)),
        sample_rate=int(config["data"].get("sample_rate", 16000)),
    )
    print(f"serving artifact written to {out}")


if __name__ == "__main__":
    main()
