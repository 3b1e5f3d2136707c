"""Root re-export of the BYOL evaluation API (reference has
``evaluate_byol.py`` at the repo root; the implementation lives in
``nrse_tpu/eval/evaluate_byol.py``)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nrse_tpu.eval.evaluate_byol import (  # noqa: F401,E402
    evaluate_embedding_similarity,
    validate_model,
    visualize_embeddings,
)
