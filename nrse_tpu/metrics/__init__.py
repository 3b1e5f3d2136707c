from nrse_tpu.metrics.categorical_metrics import score_predictions

__all__ = ["score_predictions"]
