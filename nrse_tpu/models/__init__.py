from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel, WavLMTransformerEncoder
from nrse_tpu.models.encoder import WavLMEncoder
from nrse_tpu.models.heads import ProjectionHead, PredictionHead
from nrse_tpu.models.byol import BYOLSpeechModel, byol_loss
from nrse_tpu.models.emotion import EmotionClassifier

__all__ = [
    "WavLMConfig",
    "WavLMModel",
    "WavLMTransformerEncoder",
    "WavLMEncoder",
    "ProjectionHead",
    "PredictionHead",
    "BYOLSpeechModel",
    "byol_loss",
    "EmotionClassifier",
]
