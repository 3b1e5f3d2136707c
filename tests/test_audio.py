import numpy as np
import pytest

from nrse_tpu.audio import (
    add_noise_to_speech,
    fit_noise_to_length,
    get_audio_files,
    load_and_process_audio,
    mix_at_snr,
    peak_normalize,
    save_wav,
)
from nrse_tpu.audio.features import FeatureExtractor, zero_mean_unit_var
from nrse_tpu.audio.resample import resample, resample_jax


def measured_snr_db(clean, noisy):
    noise = noisy - clean
    return 10 * np.log10(np.mean(clean**2) / np.mean(noise**2))


def test_mix_at_snr_power_ratio(rng):
    """SNR math oracle: measured SNR of the mix equals the request.

    Oracle is the reference scaling formula ``augment.py:39-54``.
    """
    clean = rng.standard_normal((4, 16000)).astype(np.float32)
    noise = rng.standard_normal((4, 16000)).astype(np.float32) * 0.3
    for snr in [0.0, 5.0, 10.0, 20.0]:
        noisy, valid = mix_at_snr(clean, noise, snr)
        noisy, valid = np.asarray(noisy), np.asarray(valid)
        assert valid.all()
        for b in range(4):
            assert abs(measured_snr_db(clean[b], noisy[b]) - snr) < 1e-3


def test_mix_at_snr_per_item_snr(rng):
    clean = rng.standard_normal((3, 8000)).astype(np.float32)
    noise = rng.standard_normal((3, 8000)).astype(np.float32)
    snrs = np.array([0.0, 10.0, 20.0], dtype=np.float32)
    noisy, valid = mix_at_snr(clean, noise, snrs)
    noisy = np.asarray(noisy)
    for b, snr in enumerate(snrs):
        assert abs(measured_snr_db(clean[b], noisy[b]) - snr) < 1e-3


def test_mix_degenerate_inputs_flagged():
    clean = np.zeros((2, 1000), dtype=np.float32)
    clean[1] = np.random.default_rng(0).standard_normal(1000)
    noise = np.ones((2, 1000), dtype=np.float32) * 0.1
    _, valid = mix_at_snr(clean, noise, 10.0)
    valid = np.asarray(valid)
    assert not valid[0] and valid[1]


def test_add_noise_to_speech_none_contract(rng):
    speech = rng.standard_normal((1, 16000)).astype(np.float32)
    assert add_noise_to_speech(np.zeros((1, 100), np.float32), speech, 5) is None
    nan_speech = speech.copy()
    nan_speech[0, 0] = np.nan
    assert add_noise_to_speech(nan_speech, speech, 5) is None
    out = add_noise_to_speech(speech, rng.standard_normal((1, 3000)).astype(np.float32), 8)
    assert out is not None and out.shape == speech.shape
    assert abs(measured_snr_db(speech, out) - 8) < 1e-3


def test_fit_noise_tiles_and_truncates():
    noise = np.arange(5, dtype=np.float32)[None]
    out = fit_noise_to_length(noise, 12)
    assert out.shape == (1, 12)
    np.testing.assert_array_equal(out[0, :5], noise[0])
    np.testing.assert_array_equal(out[0, 5:10], noise[0])
    assert fit_noise_to_length(noise, 3).shape == (1, 3)


def test_peak_normalize(rng):
    x = rng.standard_normal((2, 1000)).astype(np.float32) * 7
    y = np.asarray(peak_normalize(x))
    assert np.abs(y).max() <= 1.0 + 1e-5
    assert np.abs(y).max() > 0.99


def test_zero_mean_unit_var(rng):
    x = rng.standard_normal((2, 4000)).astype(np.float32) * 3 + 1
    y = np.asarray(zero_mean_unit_var(x))
    np.testing.assert_allclose(y.mean(-1), 0, atol=1e-4)
    np.testing.assert_allclose(y.std(-1), 1, atol=1e-3)


def test_zero_mean_unit_var_masked(rng):
    x = rng.standard_normal((1, 100)).astype(np.float32)
    mask = np.zeros((1, 100), np.float32)
    mask[0, :60] = 1
    x_pad = x * mask
    y = np.asarray(zero_mean_unit_var(x_pad, mask))
    assert np.allclose(y[0, 60:], 0)
    np.testing.assert_allclose(y[0, :60].mean(), 0, atol=1e-4)


def test_feature_extractor_matches_hf_semantics(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    fe = FeatureExtractor.from_pretrained("microsoft/wavlm-large")
    out = fe(x, sampling_rate=16000)
    iv = out["input_values"]
    assert iv.shape == (1, 16000)
    np.testing.assert_allclose(iv.mean(), 0, atol=1e-4)
    np.testing.assert_allclose(iv.std(), 1, atol=1e-3)
    assert out.input_values is iv  # attr access parity


def test_wav_roundtrip(tmp_path, rng):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    p = tmp_path / "t.wav"
    save_wav(str(p), x, sr)
    y = load_and_process_audio(str(p), sample_rate=sr, max_audio_length=1.0)
    assert y.shape == (1, sr)
    np.testing.assert_allclose(y[0], x, atol=2e-4)


def test_load_and_process_crop_and_pad(tmp_path, rng):
    sr = 16000
    save_wav(str(tmp_path / "long.wav"), rng.standard_normal(3 * sr).astype(np.float32) * 0.3, sr)
    save_wav(str(tmp_path / "short.wav"), rng.standard_normal(sr // 2).astype(np.float32) * 0.3, sr)
    long = load_and_process_audio(str(tmp_path / "long.wav"), sr, 1.0)
    short = load_and_process_audio(str(tmp_path / "short.wav"), sr, 1.0)
    assert long.shape == short.shape == (1, sr)
    assert np.all(short[0, sr // 2:] == 0)


def test_load_rejects_silence(tmp_path):
    save_wav(str(tmp_path / "sil.wav"), np.zeros(16000, np.float32), 16000)
    assert load_and_process_audio(str(tmp_path / "sil.wav")) is None


def test_get_audio_files(tiny_wav_dir):
    files = get_audio_files(str(tiny_wav_dir))
    assert len(files) == 9
    assert all(f.endswith(".wav") for f in files)


def test_resample_host_vs_jax(rng):
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y_host = resample(x, sr_in, sr_out)
    y_jax = np.asarray(resample_jax(x, sr_in, sr_out))
    assert y_jax.shape[1] == int(np.ceil(sr_in * 16000 / 44100))
    assert abs(y_host.shape[1] - y_jax.shape[1]) <= 1
    # compare in the interior (edge behaviour differs slightly)
    n = min(y_host.shape[1], y_jax.shape[1])
    sl = slice(200, n - 200)
    err = np.abs(y_host[0, sl] - y_jax[0, sl]).max()
    assert err < 5e-3


def test_resample_preserves_tone_frequency():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    y = np.asarray(resample_jax(x, sr_in, sr_out))[0]
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    freq = np.fft.rfftfreq(len(y) - 2000, 1 / sr_out)
    assert abs(freq[spec.argmax()] - 1000) < 5
