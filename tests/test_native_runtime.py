"""Native C++ audio runtime vs the pure-Python reference implementation."""

import numpy as np
import pytest

from nrse_tpu.audio.io import _decode_wav, save_wav
from nrse_tpu.runtime import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.native_available():
        pytest.skip("native runtime not built")


def test_native_decode_matches_python(tmp_path, rng):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    p = tmp_path / "t.wav"
    save_wav(str(p), x, sr)
    py_wav, py_sr = _decode_wav(str(p))
    nat_wav, nat_sr = native.native_decode_wav(str(p))
    assert nat_sr == py_sr == sr
    np.testing.assert_allclose(nat_wav, py_wav, atol=1e-6)


def test_native_stereo_downmix(tmp_path, rng):
    sr = 8000
    stereo = rng.standard_normal((2, sr)).astype(np.float32) * 0.4
    p = tmp_path / "st.wav"
    save_wav(str(p), stereo, sr)
    nat_wav, _ = native.native_decode_wav(str(p))
    py_wav, _ = _decode_wav(str(p))
    np.testing.assert_allclose(nat_wav, py_wav.mean(0, keepdims=True),
                               atol=1e-5)


def test_native_batch_load_crop_pad(tmp_path, rng):
    sr = 16000
    paths = []
    for i, dur in enumerate([0.5, 2.0, 1.0]):
        x = 0.4 * np.sin(2 * np.pi * 200 * np.arange(int(sr * dur)) / sr)
        p = tmp_path / f"b{i}.wav"
        save_wav(str(p), x.astype(np.float32), sr)
        paths.append(str(p))
    batch, lengths = native.native_load_batch(paths, sr, sr, random_crop=True)
    assert batch.shape == (3, sr)
    assert lengths.tolist() == [sr // 2, sr, sr]
    assert np.all(batch[0, sr // 2:] == 0)  # padded tail
    assert np.abs(batch[1]).max() > 0.3


def test_native_batch_flags_bad_files(tmp_path):
    good = tmp_path / "g.wav"
    save_wav(str(good), 0.4 * np.ones(8000, np.float32), 16000)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"this is not a wav")
    silent = tmp_path / "sil.wav"
    save_wav(str(silent), np.zeros(8000, np.float32), 16000)
    batch, lengths = native.native_load_batch(
        [str(good), str(bad), str(silent)], 16000, 16000
    )
    assert lengths[0] > 0 and lengths[1] == -1 and lengths[2] == -1


def test_native_resample(tmp_path):
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = tmp_path / "hi.wav"
    save_wav(str(p), x, sr_in)
    batch, lengths = native.native_load_batch([str(p)], sr_out, sr_out,
                                              random_crop=False)
    y = batch[0][: lengths[0]]
    # tone frequency preserved
    spec = np.abs(np.fft.rfft(y[500:-500] * np.hanning(len(y) - 1000)))
    freq = np.fft.rfftfreq(len(y) - 1000, 1 / sr_out)
    assert abs(freq[spec.argmax()] - 440) < 5
    # amplitude preserved
    assert 0.9 < np.abs(y[500:-500]).max() < 1.1
