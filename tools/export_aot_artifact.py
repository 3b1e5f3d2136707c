"""Pre-stage the serveaot bench's StableHLO artifact from a CPU host.

``jax.export`` only lowers and serializes — it never executes on a
device — so the TPU-platform artifact the ``NRSE_BENCH_MODE=serveaot``
bench loads can be produced by a CPU-only process while the chip is
busy with another job.  This mirrors the bench's export exactly (same
config resolution, bf16-baked weights, 5 s clips) so a later bench run
with ``NRSE_BENCH_AOT_REUSE=1`` measures the identical artifact.

    JAX_PLATFORMS=cpu python tools/export_aot_artifact.py \
        [--out /tmp/nrse_aot_artifact] [--buckets 32,96] [--seconds 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/nrse_aot_artifact")
    ap.add_argument("--buckets", default="32,96")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--arch", default="large", choices=("large", "tiny"),
                    help="tiny = fast CPU-testable artifact")
    ap.add_argument("--baked", action="store_true",
                    help="bake weights into the StableHLO as constants "
                         "(630 MB/bucket for large — the TPU tunnel's "
                         "remote compiler rejects bodies that big with "
                         "HTTP 413; default is program-only blobs + "
                         "params.msgpack)")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import _tuned_large_config
    from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel
    from nrse_tpu.serve.export import export_embedder

    # the serveaot bench's exact artifact config: tuned defaults with the
    # Pallas kernels swapped for XLA (Mosaic custom calls cannot ride a
    # serialized export), no remat/layerdrop in the inference graph
    if args.arch == "tiny":
        cfg = WavLMConfig.tiny(layerdrop=0.0)
    else:
        cfg = dataclasses.replace(
            _tuned_large_config(),
            ffn_impl="xla", dropout_impl="xla", attn_dropout_impl="xla",
            remat=False, layerdrop=0.0,
        )
    buckets = tuple(int(b) for b in args.buckets.split(","))
    t = int(16000 * args.seconds)

    model = WavLMModel(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, t)), jnp.ones((2, t), jnp.int32))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)

    for b in buckets:
        t0 = time.time()
        # the bench runs this artifact through the remote tunnel, whose
        # PJRT platform name ("axon") aliases real TPU silicon — the
        # call-time platform-name check must be baked off for this
        # artifact specifically (strict stays the default elsewhere)
        export_embedder(variables, cfg, args.out, batch_sizes=(b,),
                        clip_seconds=args.seconds, platforms=("tpu",),
                        strict_platform_check=False,
                        bake_weights=args.baked)
        print(f"# bucket {b}: exported in {time.time() - t0:.0f}s",
              flush=True)
    # the per-bucket loop above overwrites manifest.json each time with a
    # single-bucket manifest; write the final multi-bucket one
    export_blobs = {
        b: os.path.join(args.out, f"embed_b{b}.stablehlo") for b in buckets
    }
    if len(buckets) > 1:
        import json

        with open(os.path.join(args.out, "manifest.json")) as f:
            manifest = json.load(f)
        manifest["buckets"] = sorted(buckets)
        manifest["files"] = {
            str(b): f"embed_b{b}.stablehlo" for b in buckets
        }
        with open(os.path.join(args.out, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
    for b, p in export_blobs.items():
        print(f"# bucket {b}: {os.path.getsize(p) / 1e6:.0f} MB")
    print(f"artifact staged at {args.out}")


if __name__ == "__main__":
    main()
