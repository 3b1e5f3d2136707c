"""nrse_tpu — TPU-native noise-robust speech embeddings.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
sunYtokki/Noise-Robust-Speech-Embedding ("NRSE"): BYOL self-supervised
noise-robust speech embeddings on a WavLM-large encoder, with categorical
and dimensional (CCC) speech-emotion-recognition downstream heads and the
Odyssey-2024 MSP-Podcast baseline evaluation harness.

Layering (bottom-up):
  ops/       Pallas TPU kernels + XLA reference implementations (flash
             attention with WavLM gated relative position bias, masked
             attentive-statistics pooling).
  audio/     host-side decode + jit-compiled preprocessing graph
             (resample, crop/pad, SNR mixing, normalization).
  models/    Flax WavLM encoder, BYOL towers and heads, emotion classifier,
             PyTorch->JAX weight converter.
  data/      file-list datasets and double-buffered device-prefetch loaders
             (native C++ threaded decoder in runtime/ when built).
  parallel/  device mesh + sharding rules (DP primary; TP axis available).
  train/     jitted train steps (loss+grad+optim+EMA fused), trainers,
             schedules, early stopping, orbax checkpointing with resume.
  eval/      per-SNR similarity, SER metrics, t-SNE visualisation.
  metrics/   offline scorers (macro-F1 harness, CCC).
  labels/    MSP-Podcast label-list / consensus-CSV parsing + tooling.
  baseline/  Odyssey-2024 challenge-pipeline equivalents (WavSet z-norm,
             EmotionRegression head, list-based timed inference).

Reference parity is documented per-module with `file:line` citations into
the upstream repo.
"""

__version__ = "0.1.0"
