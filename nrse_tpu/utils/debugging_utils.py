"""NaN/Inf/degenerate-value guards for arrays.

Parity with reference ``src/utils/debugging_utils.py:4-30``
(``check_audio_tensor``): warns on NaN/Inf, near-silent, or exploding values
and dumps stats at DEBUG level.  Works on numpy and JAX arrays.

TPU note: calling this on a device array forces a host sync, so the train
loops only invoke it when ``logging.level`` is DEBUG (the jitted train step
instead threads a cheap on-device ``isfinite`` flag through its metrics —
see ``nrse_tpu/train/byol_trainer.py``).  For in-jit NaN hunting, use
``jax.config.update("jax_debug_nans", True)`` via ``enable_nan_debugging``.
"""

from __future__ import annotations

import numpy as np

from nrse_tpu.utils.logging_utils import logger


def check_audio_tensor(x, name: str = "tensor", config=None) -> bool:
    """Validate an audio/activation array; returns True when healthy."""
    if config is not None:
        level = str(config.get("logging", {}).get("level", "INFO")).upper()
        if level != "DEBUG":
            return True

    arr = np.asarray(x)
    ok = True
    if np.isnan(arr).any():
        logger.warning(f"{name} contains NaN values!")
        ok = False
    if np.isinf(arr).any():
        logger.warning(f"{name} contains Inf values!")
        ok = False
    amax = float(np.max(np.abs(arr))) if arr.size else 0.0
    if amax < 1e-8:
        logger.warning(f"{name} values too small (near zero): max abs {amax}")
        ok = False
    if amax > 1e6:
        logger.warning(f"{name} values too large: max abs {amax}")
        ok = False
    logger.debug(
        f"{name}: shape={arr.shape} dtype={arr.dtype} "
        f"min={float(arr.min()) if arr.size else 0.0:.6g} "
        f"max={float(arr.max()) if arr.size else 0.0:.6g} "
        f"mean={float(arr.mean()) if arr.size else 0.0:.6g}"
    )
    return ok


def enable_nan_debugging() -> None:
    """Turn on JAX's global NaN checker (debug builds only — recompiles)."""
    import jax

    jax.config.update("jax_debug_nans", True)
