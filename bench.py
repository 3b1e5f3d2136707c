"""Headline benchmark: BYOL pretrain throughput on real TPU.

Reference baseline (BASELINE.md): WavLM-large BYOL, batch 36 × 5 s clips,
1.50 s/step on one CUDA GPU ⇒ ≈120 audio-sec/sec/GPU.  North star:
≥3× per chip (≥360 audio-sec/sec/chip) on v5e.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

The timed region is the full fused train step: on-device SNR mixing +
feature normalisation, both tower forwards, backward, AdamW, EMA — i.e.
everything the reference does per step except host audio decode.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_AUDIO_SEC_PER_SEC = 120.0  # dev.ipynb cell 37 (36*5s / 1.5s)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nrse_jax_cache_tpu")

    import jax.numpy as jnp
    import numpy as np

    from nrse_tpu.models.byol import BYOLSpeechModel
    from nrse_tpu.models.wavlm import WavLMConfig
    from nrse_tpu.train.byol_trainer import (
        create_train_state,
        make_byol_train_step,
    )
    from nrse_tpu.train.schedules import make_byol_optimizer

    on_tpu = jax.default_backend() != "cpu"
    batch = int(os.environ.get("NRSE_BENCH_BATCH", 36))
    clip_seconds = float(os.environ.get("NRSE_BENCH_SECONDS", 5.0))
    t = int(16000 * clip_seconds)
    warmup = int(os.environ.get("NRSE_BENCH_WARMUP", 3))
    iters = int(os.environ.get("NRSE_BENCH_ITERS", 10))

    if on_tpu:
        remat_env = os.environ.get("NRSE_BENCH_REMAT", "1")
        cfg = WavLMConfig.large(
            dtype=jnp.bfloat16,
            use_flash_attention=os.environ.get("NRSE_BENCH_FLASH", "0") == "1",
            remat={"0": False, "1": True, "ffn": "ffn",
                   "dots": "dots"}.get(remat_env, False),
            scan_unroll=int(os.environ.get("NRSE_BENCH_UNROLL", "1")),
        )
    else:  # CPU smoke mode for plumbing checks only
        cfg = WavLMConfig.tiny(layerdrop=0.0)
        batch = min(batch, 8)

    model = BYOLSpeechModel(
        {"model": {"projection_dim": 1024 if on_tpu else 32,
                   "prediction_dim": 2048 if on_tpu else 64,
                   "ema_decay": 0.997}},
        encoder_config=cfg,
    )
    optimizer = make_byol_optimizer(
        1e-5, 1e-5, total_steps=100000,
        mu_dtype=jnp.bfloat16
        if os.environ.get("NRSE_BENCH_MU16", "0") == "1" else None,
    )

    rng = np.random.default_rng(0)
    t_ax = np.arange(t) / 16000.0
    clean = (0.3 * np.sin(2 * np.pi * rng.uniform(80, 300, (batch, 1)) * t_ax)
             + 0.02 * rng.standard_normal((batch, t))).astype(np.float32)
    noise = (0.2 * rng.standard_normal((batch, t))).astype(np.float32)
    snr = rng.choice([2.0, 5.0, 10.0, 15.0, 20.0], batch).astype(np.float32)

    print(f"# bench: backend={jax.default_backend()} batch={batch} "
          f"flash={cfg.use_flash_attention} remat={cfg.remat}",
          file=sys.stderr, flush=True)
    t_init = time.perf_counter()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((batch, t)), optimizer
    )
    jax.block_until_ready(state.variables.online["params"])
    print(f"# bench: init done in {time.perf_counter()-t_init:.1f}s",
          file=sys.stderr, flush=True)
    step = make_byol_train_step(
        model, optimizer,
        donate=os.environ.get("NRSE_BENCH_DONATE", "0") == "1",  # donation broken on the tunnel backend
    )
    batch_data = {
        "clean": jnp.asarray(clean),
        "noise": jnp.asarray(noise),
        "snr": jnp.asarray(snr),
    }

    t_compile = time.perf_counter()
    for i in range(warmup):
        state, metrics = step(state, batch_data)
        jax.block_until_ready(metrics["loss"])
        print(f"# bench: warmup step {i} done at "
              f"+{time.perf_counter()-t_compile:.1f}s "
              f"(loss={float(metrics['loss']):.4f})",
              file=sys.stderr, flush=True)

    from nrse_tpu.utils.profiling import profile_trace

    t0 = time.perf_counter()
    with profile_trace(os.environ.get("NRSE_BENCH_PROFILE")):
        for _ in range(iters):
            state, metrics = step(state, batch_data)
        jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    audio_sec_per_sec = batch * clip_seconds / dt
    print(json.dumps({
        "metric": "BYOL pretrain throughput (WavLM-large, bs%d, %gs clips, fused step)"
                  % (batch, clip_seconds)
                  if on_tpu else "BYOL pretrain throughput (tiny CPU smoke)",
        "value": round(audio_sec_per_sec, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(audio_sec_per_sec / BASELINE_AUDIO_SEC_PER_SEC, 3),
        "step_time_s": round(dt, 4),
        "loss": float(metrics["loss"]),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
