"""ctypes bindings for the native C++ audio runtime.

``libnrse_audio.so`` (built via ``make -C nrse_tpu/runtime``) provides WAV
decode, polyphase resample, and a multithreaded batch loader.  Every entry
point has a pure-Python fallback (``nrse_tpu/audio/io.py`` is the
behavioural spec); callers must work with or without the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libnrse_audio.so")
_lib = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH):
        if os.environ.get("NRSE_BUILD_NATIVE", "1") != "1" or not _try_build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.nrse_decode_wav.restype = ctypes.c_int64
    lib.nrse_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.nrse_wav_length.restype = ctypes.c_int64
    lib.nrse_wav_length.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)
    ]
    lib.nrse_load_batch.restype = None
    lib.nrse_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    if hasattr(lib, "nrse_readahead"):  # absent in pre-round-4 builds
        lib.nrse_readahead.restype = None
        lib.nrse_readahead.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32
        ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_decode_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode to float32 [1, samples] + sample rate (mono downmixed)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio runtime not available")
    sr = ctypes.c_int32(0)
    n = lib.nrse_wav_length(path.encode(), ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"native decode failed: {path}")
    out = np.empty(n, np.float32)
    got = lib.nrse_decode_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr),
    )
    if got < 0:
        raise ValueError(f"native decode failed: {path}")
    return out[None, :got], int(sr.value)


def native_load_batch(paths: List[str], target_sr: int, max_samples: int,
                      random_crop: bool = True,
                      seeds: Optional[np.ndarray] = None,
                      threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel decode+resample+crop/pad.

    Returns (batch [N, max_samples] float32, lengths [N] int64 with -1 on
    per-file failure — the caller applies the dataset retry policy).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio runtime not available")
    n = len(paths)
    out = np.zeros((n, max_samples), np.float32)
    lengths = np.zeros(n, np.int64)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if seeds is None:
        seeds = np.arange(1, n + 1, dtype=np.uint64)
    seeds = np.ascontiguousarray(seeds, np.uint64)
    if threads <= 0:
        threads = min(8, os.cpu_count() or 1)
    lib.nrse_load_batch(
        c_paths, n, target_sr, max_samples, int(random_crop),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out, lengths


def native_readahead(paths: List[str]) -> bool:
    """Queue async page-cache readahead (POSIX_FADV_WILLNEED) for files a
    few batches ahead of the decode pool — the cold-corpus first-epoch
    mitigation (round-3 measured 328.5 cold vs 453.7 warm audio-sec/sec).
    Returns False (no-op) without the native library or the symbol."""
    lib = _load()
    if lib is None or not hasattr(lib, "nrse_readahead"):
        return False
    n = len(paths)
    if n == 0:
        return True
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.nrse_readahead(c_paths, n)
    return True
