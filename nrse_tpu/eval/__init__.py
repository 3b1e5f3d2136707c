from nrse_tpu.eval.evaluate_byol import (
    evaluate_embedding_similarity,
    validate_model,
    visualize_embeddings,
)

__all__ = [
    "evaluate_embedding_similarity",
    "validate_model",
    "visualize_embeddings",
]
