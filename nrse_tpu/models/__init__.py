from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel, WavLMEncoder
from nrse_tpu.models.heads import ProjectionHead, PredictionHead
from nrse_tpu.models.byol import BYOLSpeechModel, byol_loss
from nrse_tpu.models.emotion import EmotionClassifier

__all__ = [
    "WavLMConfig",
    "WavLMModel",
    "WavLMEncoder",
    "ProjectionHead",
    "PredictionHead",
    "BYOLSpeechModel",
    "byol_loss",
    "EmotionClassifier",
]
