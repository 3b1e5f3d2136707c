"""List-based timed SER inference (the reference's north-star eval path).

Capability parity with ``baseline/eval_cat_ser_weighted_with_list.py``:
  * parse semicolon label lists (Odyssey emotion ordering A,S,H,U,F,D,C,N);
  * z-normalise each waveform with the saved train stats
    (``train_norm_stat.pkl``, ``:224-231``);
  * run ssl→pool→ser inference under no-grad, timing
    **inference-time-per-audio-second** (``:267-270,302,383-385``);
  * write ``inference_results.csv`` (Filename, one-hot Label, Prediction,
    ``:332-336``);
  * report F1-micro/macro, precision, recall, and the weighted-CE
    ``inference_loss`` (``:356-381``) to ``metrics.txt``.

TPU-native difference: files are grouped into length buckets and batched,
so inference runs a few compiled shapes at high occupancy instead of one
py-loop forward per file.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

from nrse_tpu.audio.io import load_audio
from nrse_tpu.baseline.pipeline import BaselineSER, bucket_length, make_baseline_forward
from nrse_tpu.baseline.wavset import LogManager, WavNormStats
from nrse_tpu.labels.parsing import BASELINE_EMOTIONS_MAP, parse_label_list
from nrse_tpu.models.wavlm import WavLMConfig
from nrse_tpu.train.losses import ce_weight_category
from nrse_tpu.utils.logging_utils import logger


def load_audio_16k(path: str) -> Optional[np.ndarray]:
    try:
        wav, sr = load_audio(path)
        if wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        if sr != 16000:
            from nrse_tpu.audio.resample import resample

            wav = resample(wav, sr, 16000)
        return wav[0].astype(np.float32)
    except Exception as e:
        print(f"Error processing file {path}: {e}")
        return None


def bucketed_forward_timed(forward, params, loaded, batch_size: int,
                           warmup_shapes: bool = False,
                           prestage: bool = False,
                           overlap: bool = False,
                           perturb: float = 0.0):
    """The evaluator's timed hot path, shared with ``bench.py``
    (``NRSE_BENCH_MODE=sereval``): group ``(entry, wav)`` pairs into 5 s
    length buckets, run batched ssl→pool→ser forwards, and accumulate the
    reference's **inference-time-per-audio-second** numerator/denominator
    (``eval_cat_ser_weighted_with_list.py:267-270,302,383-385``).

    The D2H fetch (``np.asarray``) is INSIDE the timed region: through the
    TPU tunnel ``block_until_ready`` can return before remote execution
    completes, so only a data fetch fences the step — and the reference's
    timing also covers logits materialisation on the host.

    ``warmup_shapes=True`` runs one untimed forward per (bucket, batch)
    shape first so the benchmark measures steady-state inference, not XLA
    compilation (the reference's eager torch loop has no compile cost to
    exclude; the CLI leaves this off to keep cold-start semantics visible
    in its separate wall-clock log).

    Modes beyond the default (H2D + forward + D2H per batch, reference
    e2e semantics):
      * ``prestage`` — device staging outside the timed region (BOTH the
        audio and the equal-sized [B, T] float32 mask are fenced before
        t0): the chip's steady-state rate.
      * ``overlap`` — double-buffered production serving: batch ``k+1``'s
        H2D is issued (async ``device_put``) while batch ``k`` computes;
        ONE timed region covers the whole loop including every transfer
        and fetch, so this is an honest e2e number that simply hides the
        tunnel H2D behind compute instead of excluding it.

    ``perturb`` scales batch ``k``'s audio by ``1 + perturb·(k+1)``:
    the remote tunnel dedups bit-identical dispatches (~0.2 ms replay,
    CLAUDE.md), so a second measurement pass over the same data must
    perturb or it times cache replay, not the chip.  Masks (and therefore
    ``audio_seconds``) are unchanged; at 1e-6 relative scale the logits
    are metric-identical.

    Returns ``(results, inference_time_s, audio_seconds)`` where results
    is a list of ``(entry, logits_row)`` in bucket order.
    """
    import jax.numpy as jnp

    buckets: Dict[int, List] = {}
    for e, wav in loaded:
        buckets.setdefault(bucket_length(len(wav)), []).append((e, wav))

    if warmup_shapes:
        for blen in sorted(buckets):
            z = jnp.zeros((batch_size, blen), jnp.float32)
            np.asarray(forward(params, z, jnp.ones((batch_size, blen),
                                                   jnp.float32)))

    # host batch assembly (padding/copy) is shared prep for every mode
    batches = []  # (chunk, x, mask)
    for blen, items in sorted(buckets.items()):
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            x = np.zeros((batch_size, blen), np.float32)
            mask = np.zeros((batch_size, blen), np.float32)
            for j, (_, wav) in enumerate(chunk):
                ln = min(len(wav), blen)
                x[j, :ln] = wav[:ln]
                mask[j, :ln] = 1.0
            if perturb:
                x *= np.float32(1.0 + perturb * (len(batches) + 1))
            batches.append((chunk, x, mask))

    inference_time = 0.0
    audio_seconds = 0.0
    results = []

    def collect(chunk, mask, logits):
        nonlocal audio_seconds
        n = len(chunk)
        audio_seconds += float(mask[:n].sum()) / 16000.0
        for (e, _), logit in zip(chunk, logits[:n]):
            results.append((e, logit))

    if overlap:
        t0 = time.perf_counter()
        staged = [(jnp.asarray(batches[0][1]), jnp.asarray(batches[0][2]))] \
            if batches else []  # pipeline fill: batch 0's H2D is exposed
        for k, (chunk, x, mask) in enumerate(batches):
            jx, jm = staged.pop()
            out = forward(params, jx, jm)  # async dispatch
            if k + 1 < len(batches):
                # H2D of the next batch rides under this batch's compute
                staged.append((jnp.asarray(batches[k + 1][1]),
                               jnp.asarray(batches[k + 1][2])))
            logits = np.asarray(out, np.float32)  # fences compute + D2H
            collect(chunk, mask, logits)
        inference_time = time.perf_counter() - t0
        return results, inference_time, audio_seconds

    for chunk, x, mask in batches:
        if prestage:
            # device staging OUTSIDE the timed region: the chip's
            # steady-state inference rate, what a server with async
            # input staging achieves (the H2D of a [32, 240000] batch
            # dominates end-to-end through the remote-TPU tunnel)
            jx, jm = jnp.asarray(x), jnp.asarray(mask)
            jx.block_until_ready()
            jm.block_until_ready()
            t0 = time.perf_counter()
            logits = np.asarray(forward(params, jx, jm), np.float32)
        else:
            t0 = time.perf_counter()
            logits = np.asarray(
                forward(params, jnp.asarray(x), jnp.asarray(mask)),
                np.float32)
        inference_time += time.perf_counter() - t0
        collect(chunk, mask, logits)
    return results, inference_time, audio_seconds


def run_inference(model_path: str, audio_list: str, audio_dir: str,
                  output_dir: Optional[str] = None, batch_size: int = 8,
                  head_dim: int = 1024, model_name: str = "microsoft/wavlm-large",
                  class_weights: Optional[np.ndarray] = None) -> Dict:
    """Evaluate a trained baseline pipeline on a semicolon label list."""
    import jax
    import jax.numpy as jnp

    from nrse_tpu.train.checkpoint import restore_checkpoint

    output_dir = output_dir or os.path.join(model_path, "results")
    os.makedirs(output_dir, exist_ok=True)

    stats = WavNormStats.load(os.path.join(model_path, "train_norm_stat.pkl"))
    entries = parse_label_list(audio_list, audio_dir=audio_dir,
                               emotion_map=BASELINE_EMOTIONS_MAP)
    print(f"Loaded {len(entries)} files from list")

    cfg = WavLMConfig.from_model_name(model_name, dtype=jnp.bfloat16
                                      if jax.default_backend() != "cpu"
                                      else jnp.float32)
    model = BaselineSER(cfg, head_dim=head_dim)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)),
                           jnp.ones((1, 16000)))
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, _ = restore_checkpoint(model_path, "final_model",
                                   {"params": template})
    params = params["params"]
    forward = make_baseline_forward(model)

    # ---- bucketed batched inference, timed per audio-second -------------
    lm = LogManager()
    lm.alloc_stat_type_list(["inference_loss"])
    loaded = []
    for e in entries:
        wav = load_audio_16k(e.path)
        if wav is None:
            continue
        loaded.append((e, stats.apply(wav)))

    scored, inference_time, audio_seconds = bucketed_forward_timed(
        forward, params, loaded, batch_size)

    rows, all_pred, all_y = [], [], []
    for e, logit in scored:
        one_hot = np.zeros(8, np.float32)
        if 0 <= e.emotion < 8:
            one_hot[e.emotion] = 1.0
            all_pred.append(logit)
            all_y.append(e.emotion)
        rows.append({
            "Filename": os.path.basename(e.path),
            **{f"Label_{k}": one_hot[k] for k in range(8)},
            "Prediction": int(logit.argmax(-1)),
        })

    import pandas as pd

    results_csv = os.path.join(output_dir, "inference_results.csv")
    pd.DataFrame(rows).to_csv(results_csv, index=False)

    from sklearn.metrics import f1_score, precision_score, recall_score

    y = np.asarray(all_y)
    logits = np.asarray(all_pred)
    preds = logits.argmax(-1)
    import jax.numpy as jnp2

    w = jnp2.asarray(class_weights) if class_weights is not None else None
    inference_loss = float(ce_weight_category(
        jnp2.asarray(logits), jnp2.asarray(y), w
    ))
    metrics = {
        "f1_micro": float(f1_score(y, preds, average="micro")),
        "f1_macro": float(f1_score(y, preds, average="macro")),
        "precision_macro": float(precision_score(y, preds, average="macro",
                                                 zero_division=0)),
        "recall_macro": float(recall_score(y, preds, average="macro",
                                           zero_division=0)),
        "inference_loss": inference_loss,
        "n_files": int(len(rows)),
        "n_scored": int(len(y)),
        "inference_time_s": inference_time,
        "audio_seconds": audio_seconds,
        "inference_time_per_audio_second":
            inference_time / max(audio_seconds, 1e-9),
    }
    with open(os.path.join(output_dir, "metrics.txt"), "w") as f:
        for k, v in metrics.items():
            f.write(f"{k}: {v}\n")
    print(json.dumps(metrics, indent=2))
    print(f"Inference time per audio second: "
          f"{metrics['inference_time_per_audio_second']:.6f}")
    return metrics


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--audio_list", required=True)
    parser.add_argument("--audio_dir", default="")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--head_dim", type=int, default=1024)
    parser.add_argument("--model_name", default="microsoft/wavlm-large")
    args = parser.parse_args(argv)
    return run_inference(args.model_path, args.audio_list, args.audio_dir,
                         args.output_dir, args.batch_size, args.head_dim,
                         args.model_name)


if __name__ == "__main__":
    main()
