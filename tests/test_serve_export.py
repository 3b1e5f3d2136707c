"""Serving artifacts: jax.export roundtrip, bucketing, mask semantics.

The artifact must reproduce the live model (same math up to compiled-
fusion reassociation), route ragged batches through the bucket table,
and be loadable without the model/checkpoint machinery (only the
directory).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel
from nrse_tpu.serve import (
    ServingModel,
    export_classifier,
    export_embedder,
    load_serving_model,
)


@pytest.fixture(scope="module")
def embed_setup(tmp_path_factory):
    cfg = WavLMConfig.tiny(layerdrop=0.0)
    model = WavLMModel(cfg)
    x = jnp.zeros((1, 16000), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = str(tmp_path_factory.mktemp("artifact") / "embed")
    export_embedder(variables, cfg, out, batch_sizes=(2, 4),
                    clip_seconds=1.0)
    return cfg, model, variables, out


def test_manifest_and_files(embed_setup):
    _, _, _, out = embed_setup
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["kind"] == "embed"
    assert manifest["buckets"] == [2, 4]
    for f in manifest["files"].values():
        assert os.path.isfile(os.path.join(out, f))


def test_artifact_matches_live_model(embed_setup):
    cfg, model, variables, out = embed_setup
    serve = load_serving_model(out)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32)
    mask = np.ones((2, 16000), np.int32)
    seq_live, pooled_live = model.apply(
        variables, jnp.asarray(audio), attention_mask=jnp.asarray(mask),
        deterministic=True,
    )
    seq_srv, pooled_srv = serve(audio)
    # compiled-artifact vs eager apply: same math modulo fusion
    # reassociation — tight tolerances, not bitwise
    np.testing.assert_allclose(np.asarray(pooled_live), pooled_srv,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq_live), seq_srv,
                               rtol=1e-5, atol=1e-5)


def test_bucket_padding_and_chunking(embed_setup):
    cfg, model, variables, out = embed_setup
    serve = ServingModel(out)
    rng = np.random.default_rng(1)
    # 3 rows: routes to the 4-bucket with one padded row
    a3 = rng.standard_normal((3, 16000)).astype(np.float32)
    _, p3 = serve(a3)
    assert p3.shape[0] == 3
    # 7 rows: chunked 4 + 3 across calls; rows must match a direct call
    a7 = np.concatenate([a3, rng.standard_normal((4, 16000))
                         .astype(np.float32)])
    _, p7 = serve(a7)
    np.testing.assert_array_equal(p7[:3], p3)


def test_short_audio_padded_and_masked(embed_setup):
    cfg, model, variables, out = embed_setup
    serve = ServingModel(out)
    rng = np.random.default_rng(2)
    short = rng.standard_normal((2, 12000)).astype(np.float32)
    padded = np.zeros((2, 16000), np.float32)
    padded[:, :12000] = short
    mask = np.zeros((2, 16000), np.int32)
    mask[:, :12000] = 1
    seq_live, pooled_live = model.apply(
        variables, jnp.asarray(padded), attention_mask=jnp.asarray(mask),
        deterministic=True,
    )
    _, pooled_srv = serve(short)
    np.testing.assert_allclose(np.asarray(pooled_live), pooled_srv,
                               rtol=1e-5, atol=1e-5)


def test_audio_longer_than_export_rejected(embed_setup):
    *_, out = embed_setup
    serve = ServingModel(out)
    with pytest.raises(ValueError, match="exceeds"):
        serve(np.zeros((1, 20000), np.float32))


def test_classifier_artifact(tmp_path):
    from nrse_tpu.models.emotion import EmotionClassifier

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    clf = EmotionClassifier(cfg, hidden_dim=32, dropout=0.0,
                            num_emotions=8)
    x = jnp.zeros((1, 16000), jnp.float32)
    m = jnp.ones((1, 16000), jnp.int32)
    variables = clf.init({"params": jax.random.PRNGKey(0)}, x, m)
    out = str(tmp_path / "clf")
    export_classifier(clf, variables, out, batch_sizes=(2,),
                      clip_seconds=1.0, task="both")
    serve = load_serving_model(out)
    audio = np.random.default_rng(3).standard_normal((2, 16000)) \
        .astype(np.float32)
    cat, dim = serve(audio)
    assert cat.shape == (2, 8) and dim.shape == (2, 3)
    cat_live, dim_live = clf.apply(
        variables, jnp.asarray(audio), m.repeat(2, 0), "both",
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(cat_live), cat,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dim_live), dim,
                               rtol=1e-5, atol=1e-5)


def test_unbaked_classifier_artifact(tmp_path):
    from nrse_tpu.models.emotion import EmotionClassifier

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    clf = EmotionClassifier(cfg, hidden_dim=32, dropout=0.0,
                            num_emotions=8)
    x = jnp.zeros((1, 16000), jnp.float32)
    m = jnp.ones((1, 16000), jnp.int32)
    variables = clf.init({"params": jax.random.PRNGKey(0)}, x, m)
    out = str(tmp_path / "clf_unbaked")
    export_classifier(clf, variables, out, batch_sizes=(2,),
                      clip_seconds=1.0, task="categorical",
                      bake_weights=False)
    serve = load_serving_model(out)
    assert serve.params is not None
    audio = np.random.default_rng(4).standard_normal((2, 16000)) \
        .astype(np.float32)
    cat = serve(audio)
    cat_live, _ = clf.apply(
        variables, jnp.asarray(audio), m.repeat(2, 0), "categorical",
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(cat_live), cat,
                               rtol=1e-5, atol=1e-5)


def test_cpu_host_stager_multi_bucket_manifest(tmp_path):
    """tools/export_aot_artifact.py — the CPU-host pre-stager the serveaot
    bench reuses via NRSE_BENCH_AOT_REUSE: its per-bucket export loop must
    leave a manifest listing ALL buckets (export_embedder overwrites the
    manifest per call), and every blob must deserialize."""
    import sys

    from jax import export as jexport

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from export_aot_artifact import main as stage_main

    out = str(tmp_path / "staged")
    stage_main(["--out", out, "--buckets", "1,2", "--seconds", "0.5",
                "--arch", "tiny"])
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["buckets"] == [1, 2]
    assert set(manifest["files"]) == {"1", "2"}
    # default stager output is UNBAKED: weights ride beside the program
    assert os.path.isfile(os.path.join(out, manifest["weights"]))
    for b, fname in manifest["files"].items():
        with open(os.path.join(out, fname), "rb") as f:
            exp = jexport.deserialize(f.read())
        assert exp.platforms == ("tpu",)
        # args are (params_pytree..., audio, mask): audio is in_avals[-2]
        assert exp.in_avals[-2].shape[0] == int(b)


def test_unbaked_artifact_matches_live_model(embed_setup, tmp_path):
    """bake_weights=False: program-only blobs + params.msgpack must
    serve bit-for-bit what the baked artifact serves (same math; the
    weights just arrive as a runtime argument staged once at load)."""
    cfg, model, variables, _ = embed_setup
    out = str(tmp_path / "unbaked")
    export_embedder(variables, cfg, out, batch_sizes=(2,),
                    clip_seconds=1.0, bake_weights=False)
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["weights"] == "params.msgpack"
    serve = load_serving_model(out)
    assert serve.params is not None
    rng = np.random.default_rng(7)
    audio = rng.standard_normal((2, 16000)).astype(np.float32)
    seq_live, pooled_live = model.apply(
        variables, jnp.asarray(audio),
        attention_mask=jnp.ones((2, 16000), jnp.int32),
        deterministic=True,
    )
    seq_srv, pooled_srv = serve(audio)
    np.testing.assert_allclose(np.asarray(pooled_live), pooled_srv,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq_live), seq_srv,
                               rtol=1e-5, atol=1e-5)
