"""Serving: AOT-exported StableHLO artifacts for deployment.

The reference serves models by re-instantiating the full torch training
stack at inference time (``baseline/eval_cat_ser_weighted_with_list.py``
rebuilds the model and loads a checkpoint before timing inference).
Here the deployment surface is a *compiled artifact*: ``jax.export``
serializes the jitted deterministic forward — weights baked in, one
StableHLO blob per batch bucket, multi-platform (cpu + tpu) — so a
serving process needs only the artifact directory and ``jax``, not the
model code, the checkpoint format, or the config system.
"""

from nrse_tpu.serve.export import (  # noqa: F401
    ServingModel,
    export_classifier,
    export_embedder,
    load_serving_model,
)
