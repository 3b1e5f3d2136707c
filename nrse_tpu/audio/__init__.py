from nrse_tpu.audio.io import get_audio_files, load_audio, load_and_process_audio, save_wav
from nrse_tpu.audio.augment import (
    add_noise_to_speech,
    mix_at_snr,
    fit_noise_to_length,
    peak_normalize,
    crop_or_pad,
)
from nrse_tpu.audio.features import FeatureExtractor, zero_mean_unit_var
from nrse_tpu.audio.resample import resample, resample_jax

__all__ = [
    "get_audio_files",
    "load_audio",
    "load_and_process_audio",
    "save_wav",
    "add_noise_to_speech",
    "mix_at_snr",
    "fit_noise_to_length",
    "peak_normalize",
    "crop_or_pad",
    "FeatureExtractor",
    "zero_mean_unit_var",
    "resample",
    "resample_jax",
]
