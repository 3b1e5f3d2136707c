"""Test configuration: force an 8-device virtual CPU mesh.

Per the rebuild test plan (SURVEY.md §4c): sharded/pjit code paths are tested
without TPU hardware by forcing the host platform and splitting it into 8
virtual devices. This must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (env may pin a TPU platform)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The environment's TPU plugin force-selects itself via jax.config at
# interpreter start (sitecustomize), overriding JAX_PLATFORMS — pin the
# config value too so tests never dial the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/nrse_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

# Fast/slow split (VERDICT r4 weak #6): the full suite takes 20-60 min on
# this 1-core box (compile-bound), so the quick dev loop is
# ``pytest -m fast`` (<~5 min).  Modules that compile big graphs, spawn
# subprocess clusters, drive trainer ``main``s, or load real HF torch
# models are ``slow``; everything else is auto-marked ``fast``.
SLOW_MODULES = {
    "test_baseline_e2e",       # baseline trainer/evaluator end-to-end
    "test_byol_training",      # jitted train loops over the mock corpus
    "test_checkpoint_bridge",  # HF torch model loads + orbax round-trips
    "test_convert_large",      # wavlm-large torch->JAX conversion
    "test_distributed",        # 2-process cluster spawns
    "test_emotion_training",   # both SER trainer mains
    "test_evaluate_emotion",   # evaluate CLI subprocesses
    "test_export_torch",       # fresh HF models + strict loads
    "test_flash_attention",    # many kernel-variant compiles
    "test_graft_entry",        # dryrun_multichip sharded compiles
    "test_serve_export",       # AOT StableHLO exports
    "test_train_byol_cli",     # trainer main end-to-end
    "test_wavlm_golden",       # HF golden activations incl. large
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(autouse=True)
def _reset_flash_tp_mesh():
    """Belt-and-braces: the Pallas-kernel mesh registry is process-global;
    a test (or an entry-point ``main`` a test calls) that leaks a
    registration would silently change kernel dispatch for every later
    test (round-3 regression: ``train_byol.main`` leaked a ``data=8`` mesh
    and failed 10 unrelated flash-attention tests).  Entry points are now
    scoped (``flash_tp_mesh_scope``); this fixture guarantees isolation
    regardless."""
    from nrse_tpu.parallel import mesh as mesh_mod

    prev = mesh_mod.get_flash_tp_mesh()
    yield
    mesh_mod._FLASH_TP = prev


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def mock_msp_dir(tmp_path_factory, rng):
    """Mini MSP-Podcast-like corpus: consensus CSV + WAVs + noise dir."""
    import pandas as pd

    from nrse_tpu.audio.io import save_wav

    d = tmp_path_factory.mktemp("msp")
    audio = d / "Audios"
    noise = d / "noise"
    audio.mkdir()
    noise.mkdir()
    sr = 16000
    rows = []
    classes = ["A", "H", "S", "N", "N", "H", "X", "N"]
    splits = ["Development"] * 7 + ["Test1"]
    for i, (c, s) in enumerate(zip(classes, splits)):
        name = f"MSP-PODCAST_{1000+i}_{i:04d}.wav"
        dur = rng.uniform(0.4, 1.4)
        t = np.arange(int(sr * dur)) / sr
        x = 0.4 * np.sin(2 * np.pi * rng.uniform(90, 350) * t)
        x += 0.05 * rng.standard_normal(t.shape)
        save_wav(str(audio / name), x.astype(np.float32), sr)
        rows.append({
            "FileName": name, "EmoClass": c,
            "EmoAct": rng.uniform(1, 7), "EmoVal": rng.uniform(1, 7),
            "EmoDom": rng.uniform(1, 7), "Split_Set": s,
            "SpkrID": 100 + i, "Gender": "Female" if i % 2 else "Male",
        })
    # extra Test1 rows so val split has >1 batch worth
    for i in range(8, 12):
        name = f"MSP-PODCAST_{1000+i}_{i:04d}.wav"
        t = np.arange(int(sr * 0.8)) / sr
        x = 0.3 * np.sin(2 * np.pi * 200 * t) + 0.05 * rng.standard_normal(t.shape)
        save_wav(str(audio / name), x.astype(np.float32), sr)
        rows.append({
            "FileName": name, "EmoClass": ["A", "H", "S", "N"][i - 8],
            "EmoAct": rng.uniform(1, 7), "EmoVal": rng.uniform(1, 7),
            "EmoDom": rng.uniform(1, 7), "Split_Set": "Test1",
            "SpkrID": 200, "Gender": "Male",
        })
    for i in range(2):
        save_wav(str(noise / f"noise_{i}.wav"),
                 (0.2 * rng.standard_normal(sr)).astype(np.float32), sr)
    pd.DataFrame(rows).to_csv(d / "labels_consensus.csv", index=False)
    return d


@pytest.fixture(scope="session")
def tiny_wav_dir(tmp_path_factory, rng):
    """Directory of tiny random speech-like WAVs (mock corpus fixture).

    End-to-end analogue of reference ``test/create_mock_dataset.py`` but with
    real files on disk, per the rebuild test plan.
    """
    from nrse_tpu.audio.io import save_wav

    d = tmp_path_factory.mktemp("wavs")
    clean = d / "clean"
    noise = d / "noise"
    clean.mkdir()
    noise.mkdir()
    sr = 16000
    for i in range(6):
        dur = rng.uniform(0.5, 2.0)
        t = np.arange(int(sr * dur)) / sr
        x = 0.5 * np.sin(2 * np.pi * rng.uniform(80, 300) * t)
        x += 0.1 * rng.standard_normal(t.shape)
        save_wav(str(clean / f"speech_{i}.wav"), x.astype(np.float32), sr)
    for i in range(3):
        dur = rng.uniform(0.3, 1.5)
        n = 0.3 * rng.standard_normal(int(sr * dur))
        save_wav(str(noise / f"noise_{i}.wav"), n.astype(np.float32), sr)
    return d
