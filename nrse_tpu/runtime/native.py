"""ctypes bindings for the native C++ audio runtime (stub until built).

The real implementation lands with the C++ loader; this placeholder keeps
imports working with the pure-Python fallback.
"""


def native_available() -> bool:
    return False


def native_decode_wav(path):  # pragma: no cover - replaced by real bindings
    raise NotImplementedError
