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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


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
