from nrse_tpu.data.loader import HostDataLoader, PrefetchLoader
from nrse_tpu.data.noisy_speech_dataset import (
    NoiseRobustSpeechDataset,
    create_dataloaders,
)
from nrse_tpu.data.emotion_dataset import EmotionDataset, create_emotion_dataloaders

__all__ = [
    "HostDataLoader",
    "PrefetchLoader",
    "NoiseRobustSpeechDataset",
    "create_dataloaders",
    "EmotionDataset",
    "create_emotion_dataloaders",
]
