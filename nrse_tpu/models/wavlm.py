"""WavLM encoder in Flax, designed TPU-first.

Capability parity: the reference wraps HF ``microsoft/wavlm-large``
(``src/models/encoder.py:5-32``; architecture defined by transformers
``modeling_wavlm.py``).  This is a from-scratch JAX implementation of the
same architecture:

  raw 16 kHz waveform
    → 7-layer strided conv feature encoder (per-layer LayerNorm for the
      "layer" norm variant used by wavlm-large; GroupNorm-first for "group")
    → feature projection (LayerNorm + Linear 512→1024 + dropout)
    → optional SpecAugment time masking with a learned mask embedding
    → transformer encoder: grouped weight-normalised conv positional
      embedding, 24 pre-LN layers with gated-relative-position-bias
      attention, final LayerNorm (stable-layer-norm variant)

TPU-native design decisions (vs a torch translation):
  * The 24 identical transformer layers run under ``nn.scan`` with stacked
    parameters — one compiled layer body, faster XLA compiles, and a layout
    that shards naturally over a mesh.
  * The bucketed relative position bias lives at the *encoder* level (HF
    hides it inside layer 0) and is passed to every layer in factored form
    ``gate ⊙ pos_bias``; the full ``[B*H, T, T]`` gated tensor is never
    materialised (see ``nrse_tpu/ops/attention.py``).
  * Computation is bfloat16 with float32 parameters and float32
    LayerNorm/softmax (MXU-friendly mixed precision).
  * LayerDrop is expressed as a per-layer ``where`` inside the scan (XLA
    needs static shapes; the skip saves no FLOPs on TPU anyway).
  * ``WavLMModel.__call__`` returns both the frame sequence (for ASP
    pooling in the emotion path) and a masked mean-pooled utterance
    embedding (for the BYOL towers), resolving the reference's encoder
    output-shape inconsistency (SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nrse_tpu.ops.attention import gated_bias_attention
from nrse_tpu.ops.rel_pos_bias import (
    compute_position_bias,
    rel_bias_vector,
    relative_position_buckets_jnp,
)


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """Architecture hyper-parameters (field names follow the HF config)."""

    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # "layer" (large) | "group" (base)
    do_stable_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    layerdrop: float = 0.1
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    # TPU execution knobs
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_flash_attention: bool = False
    # False | True/"full" (remat whole layers) | "ffn" (recompute only the
    # 4×-wide FFN activations in backward — the dominant HLO temps once
    # flash attention removes the T×T tensors) | "dots" (save matmul
    # outputs only) | "attn" (save everything except the [B,H,T,T]
    # attention internals — cheapest recompute for the XLA-attention path)
    # | "attn+ffn" (recompute attention core AND FFN; projections + LNs
    # stay saved) | "light" (attn core + FFN + LayerNorms — saves only the
    # bf16 projections/residual stream; the HBM sweet spot at bs 36 where
    # full-layer remat pays ~33% recompute and the others OOM) | "attn+ln"
    # (attn core + LayerNorms rematted, FFN residuals KEPT — with the
    # fused-FFN kernel those are compact (bf16 h1, PRNG-regenerated
    # masks), so skipping the FFN-forward re-run in backward costs only
    # ~2.7 GB over "light" while deleting its dominant recompute)
    remat: Any = False
    # layer-scan unroll factor (cross-layer fusion vs compile time)
    scan_unroll: int = 1
    # conv-frontend channel-LayerNorm implementation:
    #   "xla"    — plain nn.LayerNorm (454.0 audio-sec/sec measured);
    #   "mxu"    — thin-matmul stats, ops/mxu_norm.py (459.3; XLA
    #              canonicalises the dot back to a reduce but the form
    #              still fuses ~1% better);
    #   "pallas" — ops/pallas_norm.py streaming row-block kernel with a
    #              custom VJP.  Measured SLOWER (375.4): the custom-call
    #              boundaries break XLA's conv→LN→gelu fusion, costing
    #              more than the LN reduce saves — a real Pallas win here
    #              needs the whole conv+LN+gelu block in one kernel;
    #   "fused"  — ops/fused_frontend.py: that one kernel.  conv (tap
    #              matmuls on the MXU) + f32 channel-LN stats in registers
    #              + exact-erf gelu, fwd+bwd custom VJP, for the
    #              stride-2 k∈{2,3} C→C layers (1-6 of wavlm-large);
    #              layer 0 and non-matching layers fall back to "xla".
    frontend_norm: str = "mxu"
    # strided-conv implementation for the feature encoder:
    #   "xla"    — nn.Conv (lax.conv_general_dilated; XLA's strided-conv
    #              lowering ran the ~2.6 TFLOP frontend at only ~20-30%
    #              MXU efficiency ≈ 68 ms of the 389 ms round-3 step);
    #   "matmul" — same conv expressed as free [B,T,C]→[B,T/s,sC]
    #              reshapes + plain MXU dots (s consecutive taps stack on
    #              the reshaped channel axis; remaining taps come from a
    #              shifted slice), at exactly the conv's FLOPs and in pure
    #              XLA so the conv→LN→gelu fusion is preserved — the
    #              tap-matmul idea from ops/fused_frontend.py without the
    #              custom-call boundary that made the Pallas version lose.
    #              Applies to C≥8 strided layers AND (via the single-dot
    #              im2col branch) tiny-C layers.  Identical param tree.
    #   "matmul0" — the single-dot im2col ONLY for tiny-C layers (the
    #              k=10/s=5 raw-audio layer 0: full im2col is 10 values/
    #              frame, one [B·T,10]×[10,512] dot writing the 590 MB
    #              output exactly once); layers 1-6 stay on nn.Conv where
    #              the matmul form measured slower (401.9 vs 458.8).  The
    #              round-3 profile puts XLA's layer-0 strided-conv
    #              lowering at ~10× its bandwidth floor (~7.7 ms of a
    #              ~0.7 ms op) — this targets exactly that.
    frontend_conv: str = "xla"
    # FFN implementation:
    #   "xla"   — two nn.Dense + jax.nn.gelu + nn.Dropout (XLA fuses the
    #             pair at ~63% MXU efficiency: the exact-erf gelu and the
    #             dropout mask multiply serialise between the matmuls,
    #             docs/round2_status.md);
    #   "fused" — ops/fused_ffn.py: both matmuls + gelu + both dropout
    #             sites as one Pallas program with in-kernel hardware-PRNG
    #             masks (fwd + two bwd kernels, custom VJP).  Same
    #             Bernoulli dropout semantics, kernel-private bitstream.
    #             Requires hidden/intermediate sizes divisible by the
    #             128-lane tiling; non-conforming configs fall back to
    #             "xla".
    ffn_impl: str = "xla"
    # gather the [H,T,T] position bias per layer from the [buckets,H] table
    # instead of broadcasting a precomputed tensor into the scan — the
    # scan's cotangent then accumulates on the tiny table, unlocking long
    # sequences. "auto" = on for T > 512.
    per_layer_pos_bias: Any = "auto"
    # storage dtype for the XLA-attention [B,H,T,T] score/prob tensors
    # (None = softmax dtype = f32, the HF-parity default).  bfloat16 halves
    # the HBM traffic the attention passes are bound on (softmax
    # max/exp/sum reductions still run f32 in registers); see
    # ops/attention.py::gated_bias_attention.
    score_dtype: Any = None
    # where the per-head-output attention dropout happens when the block
    # attention kernel is active:
    #   "xla"    — nn.Dropout on the kernel's output (default; the only
    #              option for the XLA and streaming-flash paths);
    #   "kernel" — inside ops/block_attention.py with in-kernel hardware
    #              PRNG (like the fused FFN): the [B,H,T,D] rng-bit
    #              generation, mask store/unpack and bwd apply (~10 ms of
    #              the round-3 step) leave the XLA program entirely.  Same
    #              Bernoulli semantics, kernel-private bitstream; falls
    #              back to "xla" on CPU (interpret stubs the PRNG) and
    #              under model parallelism (per-shard streams would
    #              collide).
    attn_dropout_impl: str = "xla"
    # the two remaining per-layer XLA dropout sites (attention output +
    # post-attention hidden dropout; the FFN's two sites are already
    # inside the fused-FFN kernel):
    #   "xla"    — nn.Dropout (rbg bit generation + mask apply + a
    #              [B,T,C] mask residual per site, ~7.6 ms+ of the 486
    #              step profile, docs/round3_status.md §10);
    #   "kernel" — ops/fused_dropout.py: in-kernel hardware-PRNG masks,
    #              regenerated bit-exactly in backward (zero residuals).
    #              Same Bernoulli semantics, kernel-private bitstream
    #              (rbg precedent); the attention-output site applies
    #              post-head-merge on [B,T,C] instead of [B,H,T,D] —
    #              an elementwise iid mask is permutation-invariant in
    #              distribution.  Falls back to "xla" on CPU (interpret
    #              stubs the PRNG) and under model parallelism
    #              (pallas_call does not partition under GSPMD).
    dropout_impl: str = "xla"
    # attention input-projection formulation:
    #   "xla"   — four separate nn.Dense dots (q/k/v from hidden, the
    #             8-wide rel-pos gate from the per-head reshape);
    #   "fused" — one [C, 3C+8H] dot: the q/k/v kernels concatenated with
    #             a block-diagonal embedding of the shared [D,8] gate
    #             kernel, so the layer input is read from HBM once instead
    #             of four times and XLA sees a single aligned MXU dot
    #             (3200 output lanes = 25×128 tiles) in fwd, one dx dot
    #             and one dW dot in bwd.  Identical parameter tree (the
    #             per-projection tensors are concatenated at apply time);
    #             adds ~4% FLOPs on the qkv dot for the zero block-diag
    #             columns.  Exact same math — zeros contribute exactly 0.
    qkv_impl: str = "xla"
    # rematerialise the conv feature encoder in backward: its activations
    # dominate residual HBM for long clips (layer-0 alone is
    # [B, T/5, 512] ≈ 1 GB bf16 at bs 32 × 10 s) yet the frontend is only
    # a few % of step FLOPs.  Needed for the reference baseline's e2e SER
    # fine-tune geometry (bs 32 × ≤10 s, frontend unfrozen per
    # run_train_e2e.sh --freeze_ssl=False) to fit v5e HBM.
    frontend_remat: bool = False
    # pad the transformer stack's frame axis to a multiple of this (1 =
    # off).  5 s clips yield T=249 frames — NOT a multiple of the TPU's
    # 8-sublane tiling, so every [B,T,C]↔[B·T,C] boundary (the fused-FFN
    # flatten, its pad/slice) is a real HBM repack (~6 ms/step in the
    # round-3 profile: pad.18 + slice.23 + reshape.818/819).  Padding once
    # to 128 (one lane tile: 249→256) makes those reshapes free bitcasts
    # and removes the block-attention kernel's per-layer T padding.  The
    # extra frames are ~FLOP-free — the MXU and the Pallas kernels already
    # compute on 256-padded tiles — and are *masked*: zero-filled before
    # the positional conv (exactly HF's zero-pad-right semantics, so valid
    # frames are bit-identical), excluded from attention via the additive
    # key mask (exp underflows to exactly 0), per-frame ops (LN/FFN) cannot
    # mix frames, and the pad is sliced off before pooling.  Dropout/
    # LayerDrop bitstream shapes change (rbg precedent: same distribution).
    seq_pad_multiple: int = 1


    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def large(cls, **kw) -> "WavLMConfig":
        """microsoft/wavlm-large (the reference's encoder backbone)."""
        return cls(**kw)

    @classmethod
    def base_plus(cls, **kw) -> "WavLMConfig":
        """microsoft/wavlm-base-plus (used by the reference's smoke test,
        ``src/models/encoder.py:36``)."""
        return cls(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, conv_bias=False,
            feat_extract_norm="group", do_stable_layer_norm=False,
            layerdrop=0.05, **kw,
        )

    @classmethod
    def tiny(cls, **kw) -> "WavLMConfig":
        """Small config for tests (golden comparisons vs HF)."""
        kw.setdefault("dtype", jnp.float32)
        return cls(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, conv_dim=(32,) * 3,
            conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=40, max_bucket_distance=100, **kw,
        )

    @classmethod
    def from_model_name(cls, name: str, **kw) -> "WavLMConfig":
        if "tiny" in name:  # dev/smoke-test runs
            kw.pop("use_flash_attention", None)
            return cls.tiny(**kw)
        if "large" in name:
            return cls.large(**kw)
        if "base" in name:
            return cls.base_plus(**kw)
        raise ValueError(f"unknown WavLM variant: {name}")

    def feature_lengths(self, input_lengths):
        """Conv-stack output length for given waveform lengths.

        Equivalent of HF ``_get_feat_extract_output_lengths``:
        ``L -> (L - kernel) // stride + 1`` per conv layer.
        """
        lengths = input_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            lengths = (lengths - k) // s + 1
        return lengths


def _use_block_kernel(t: int) -> bool:
    """Flash-attention dispatch: at short T the one-block dense-bias
    kernel (ops/block_attention.py) replaces the streaming Toeplitz
    kernel — the shear + streaming-softmax machinery only pays off when
    K/V must stream (docs/round3_status.md §7)."""
    from nrse_tpu.ops.block_attention import MAX_T_PAD

    return t <= MAX_T_PAD


def strided_conv_matmul(h, kernel, bias, k, s):
    """VALID strided 1-D convolution as free reshapes + MXU dots.

    ``y[:, t] = Σ_j x[:, s·t+j] @ W[j] + b`` is regrouped into
    ``ceil(k/s)`` dots: tap group ``g`` covers taps ``g·s .. g·s+w-1``
    (``w = min(s, k-g·s)``), whose inputs for all ``t`` are exactly the
    rows ``g·s .. g·s+s·t_out-1`` of ``x`` — a zero-copy row-major
    reshape to ``[B, t_out, s·C]`` (plus a trailing zero-pad of at most
    ``k-s`` rows that only ever lands in sliced-away channels).  Total
    FLOPs equal the conv's; every dot is a large ``[B·t_out, w·C]×[w·C,
    C_out]`` matmul XLA schedules straight onto the MXU, and the
    surrounding LN/GELU fusion is untouched (no custom-call boundary —
    the failure mode of the fused Pallas frontend, docs/round3_status.md
    §7).  Partial sums accumulate in f32; the result is rounded to
    ``x.dtype`` exactly like ``nn.Conv``'s output cast.

    Covers the reference encoder's HF conv feature extractor
    (``/root/reference/src/models/encoder.py:14``; wavlm-large layers
    1-6: k=3/k=2, s=2, C=512).
    """
    b, t, c = h.shape
    cout = kernel.shape[-1]
    t_out = (t - k) // s + 1
    w = kernel.astype(h.dtype)

    def tap_group(g):
        lo = g * s
        width = min(s, k - lo)
        need = lo + s * t_out
        hg = h if need <= t else jnp.pad(h, ((0, 0), (0, need - t), (0, 0)))
        xg = hg[:, lo:need, :].reshape(b, t_out, s * c)
        if width < s:
            xg = xg[:, :, : width * c]
        return xg, width

    if c * k <= 32:
        # Tiny channel count (the raw-audio layer 0: C=1, k=10): the full
        # im2col is only k·c values per frame — materialise it (concat of
        # the tap-group views, ~12 MB at bs 36 × 5 s) and run ONE dot, so
        # the [B, t_out, C_out] output is written exactly once instead of
        # once per tap group.  This is the path XLA's strided-conv
        # lowering misses: the profile shows layer 0 at ~10× its
        # bandwidth floor on the strided im2col gather.
        cols = [tap_group(g)[0] for g in range(-(-k // s))]
        x = jnp.concatenate(cols, axis=-1)               # [B, t_out, k·c]
        acc = jnp.dot(x, w.reshape(k * c, cout))
    else:
        acc = None
        for g in range(-(-k // s)):
            xg, width = tap_group(g)
            lo = g * s
            wg = w[lo:lo + width].reshape(width * c, cout)
            # dot outputs stay at the activation dtype: f32 partials
            # measured −13% on the whole step (587 MB/layer extra HBM at
            # L1); the MXU still accumulates each dot in f32 internally,
            # so the only cost of bf16 partials is one rounding per group.
            part = jnp.dot(xg, wg)
            acc = part if acc is None else acc + part
    if bias is not None:
        acc = (acc.astype(jnp.float32) + bias.astype(jnp.float32))
    return acc.astype(h.dtype)


class ConvFeatureEncoder(nn.Module):
    """Strided 1-D conv stack: 16 kHz samples → ~50 Hz frame features."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, input_values):
        cfg = self.config
        h = input_values[:, :, None].astype(cfg.dtype)  # [B, T, 1] (NWC)
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            if (cfg.frontend_norm == "fused"
                    and cfg.feat_extract_norm == "layer"
                    and s == 2 and k in (2, 3) and h.shape[-1] == dim):
                # whole conv+LN+gelu block in ONE Pallas kernel (fwd+bwd);
                # param tree identical to the nn.Conv/nn.LayerNorm layout
                from nrse_tpu.ops.fused_frontend import (
                    ConvParams,
                    LNParams,
                    fused_conv_ln_gelu,
                )

                kernel, cbias = ConvParams(
                    dim, k, h.shape[-1], use_bias=cfg.conv_bias,
                    param_dtype=cfg.param_dtype, name=f"conv_{i}",
                )()
                scale, lbias = LNParams(
                    dim, param_dtype=cfg.param_dtype,
                    name=f"layer_norm_{i}",
                )()
                h = fused_conv_ln_gelu(
                    h, kernel, cbias, scale, lbias, cfg.layer_norm_eps
                )
                continue
            tiny_c = h.shape[-1] * k <= 32  # single-dot im2col territory
            if (s > 1
                    and ((cfg.frontend_conv in ("matmul", "matmul0")
                          and tiny_c)
                         or (cfg.frontend_conv == "matmul"
                             and h.shape[-1] >= 8))):
                # same conv as reshape+dot on the MXU (same param tree —
                # ConvParams mirrors nn.Conv's names/shapes/initialisers).
                # "matmul0" applies ONLY to tiny-C layers (the raw-audio
                # layer 0), keeping XLA's conv+LN+gelu fusion for the
                # C=512 layers where the matmul form measured slower.
                from nrse_tpu.ops.fused_frontend import ConvParams

                kernel, cbias = ConvParams(
                    dim, k, h.shape[-1], use_bias=cfg.conv_bias,
                    param_dtype=cfg.param_dtype, name=f"conv_{i}",
                )()
                h = strided_conv_matmul(
                    h, kernel, cbias if cfg.conv_bias else None, k, s
                )
            else:
                h = nn.Conv(
                    dim, (k,), strides=(s,), padding="VALID",
                    use_bias=cfg.conv_bias, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name=f"conv_{i}",
                )(h)
            if cfg.feat_extract_norm == "layer":
                # three interchangeable channel-LN implementations (same
                # math + param layout; see WavLMConfig.frontend_norm)
                if cfg.frontend_norm == "pallas":
                    from nrse_tpu.ops.pallas_norm import (
                        PallasChannelLayerNorm,
                    )

                    ln_cls = PallasChannelLayerNorm
                elif cfg.frontend_norm == "mxu":
                    from nrse_tpu.ops.mxu_norm import MXUChannelLayerNorm

                    ln_cls = MXUChannelLayerNorm
                else:
                    ln_cls = None
                if ln_cls is not None:
                    h = ln_cls(
                        epsilon=cfg.layer_norm_eps,
                        param_dtype=cfg.param_dtype,
                        name=f"layer_norm_{i}",
                    )(h).astype(cfg.dtype)
                else:
                    h = nn.LayerNorm(
                        epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                        param_dtype=cfg.param_dtype, name=f"layer_norm_{i}",
                    )(h).astype(cfg.dtype)
            elif cfg.feat_extract_norm == "group" and i == 0:
                h = nn.GroupNorm(
                    num_groups=dim, dtype=jnp.float32,
                    param_dtype=cfg.param_dtype, name="group_norm",
                )(h).astype(cfg.dtype)
            h = jax.nn.gelu(h, approximate=False)
        return h  # [B, T_frames, conv_dim[-1]]


class FeatureProjection(nn.Module):
    config: WavLMConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=cfg.param_dtype, name="layer_norm",
        )(x).astype(cfg.dtype)
        h = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="projection",
        )(norm)
        h = nn.Dropout(cfg.feat_proj_dropout)(h, deterministic=deterministic)
        return h


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding with weight normalisation.

    Parameters are stored factored as ``weight_g``/``weight_v`` (torch
    ``weight_norm`` over all dims except the kernel axis), matching the
    checkpoint-bridge key layout the reference manipulates
    (``baseline/train_ft_cat_ser_weighted_checkpoint.py:148-153``).
    """

    config: WavLMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        c = cfg.hidden_size
        g = cfg.num_conv_pos_embedding_groups
        k = cfg.num_conv_pos_embeddings

        weight_v = self.param(
            "weight_v",
            nn.initializers.normal(stddev=jnp.sqrt(4.0 / (k * c))),
            (c, c // g, k), cfg.param_dtype,
        )
        weight_g = self.param(
            "weight_g", nn.initializers.ones, (1, 1, k), cfg.param_dtype
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), cfg.param_dtype)

        # weight_norm(dim=2): per kernel position, normalise over (out, in).
        norm = jnp.sqrt(
            jnp.sum(weight_v.astype(jnp.float32) ** 2, axis=(0, 1), keepdims=True)
            + 1e-12
        )
        weight = (weight_g * weight_v / norm).astype(cfg.dtype)

        lhs = jnp.transpose(x, (0, 2, 1)).astype(cfg.dtype)  # NCW
        out = jax.lax.conv_general_dilated(
            lhs, weight, window_strides=(1,), padding=[(k // 2, k // 2)],
            dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=g,
        )
        if k % 2 == 0:  # SamePad: drop the trailing element
            out = out[:, :, :-1]
        out = out + bias[None, :, None].astype(cfg.dtype)
        out = jax.nn.gelu(out, approximate=False)
        return jnp.transpose(out, (0, 2, 1))


class _DenseParams(nn.Module):
    """Declare an ``nn.Dense``-identical param subtree ({kernel, bias})
    without running its dot — lets the fused-qkv path own the matmul while
    keeping the exact checkpoint layout of the four separate projections."""

    in_features: int
    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return kernel, bias


class GatedAttention(nn.Module):
    """Self-attention with WavLM's gated relative position bias."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, hidden, pos_bias, key_padding_mask=None,
                 deterministic: bool = True):
        cfg = self.config
        b, t, c = hidden.shape
        h, d = cfg.num_attention_heads, cfg.head_dim
        dense = partial(
            nn.Dense, dtype=cfg.dtype, param_dtype=cfg.param_dtype
        )

        def split_heads(x):
            return jnp.transpose(x.reshape(b, t, h, d), (0, 2, 1, 3))

        if cfg.qkv_impl == "fused":
            # One [C, 3C+8H] dot: q|k|v kernels side by side, the shared
            # [D, 8] gate kernel embedded block-diagonally (row i·D+d_,
            # col 3C+i·8+j holds gate_kernel[d_, j]) — the gate math is
            # identical because the off-block zeros contribute exactly 0.
            wq, bq = _DenseParams(c, c, cfg.param_dtype, name="q_proj")()
            wk, bk = _DenseParams(c, c, cfg.param_dtype, name="k_proj")()
            wv, bv = _DenseParams(c, c, cfg.param_dtype, name="v_proj")()
            wg, bg = _DenseParams(
                d, 8, cfg.param_dtype, name="gru_rel_pos_linear")()
            eye = jnp.eye(h, dtype=wg.dtype)
            gate_block = (eye[:, None, :, None]
                          * wg[None, :, None, :]).reshape(c, h * 8)
            w_all = jnp.concatenate(
                [wq, wk, wv, gate_block], axis=1).astype(cfg.dtype)
            b_all = jnp.concatenate(
                [bq, bk, bv, jnp.tile(bg, h)]).astype(cfg.dtype)
            fused = hidden.astype(cfg.dtype) @ w_all + b_all
            q = split_heads(fused[..., :c])
            k = split_heads(fused[..., c:2 * c])
            v = split_heads(fused[..., 2 * c:3 * c])
            proj = jnp.transpose(
                fused[..., 3 * c:].reshape(b, t, h, 8), (0, 2, 1, 3)
            )
        else:
            q = split_heads(dense(c, name="q_proj")(hidden))
            k = split_heads(dense(c, name="k_proj")(hidden))
            v = split_heads(dense(c, name="v_proj")(hidden))

            # Per-(batch, head, query) gate computed from the attention
            # input (not the q projection) — HF WavLMAttention semantics.
            gh = jnp.transpose(hidden.reshape(b, t, h, d), (0, 2, 1, 3))
            proj = dense(8, name="gru_rel_pos_linear")(gh)  # [B, H, T, 8]
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj.astype(jnp.float32))
        gate_a, gate_b = gates[..., 0], gates[..., 1]
        const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (h,), cfg.param_dtype
        )
        gate = gate_a * (gate_b * const[None, :, None] - 1.0) + 2.0  # [B,H,T]

        kernel_dropped = False
        if cfg.use_flash_attention:
            if pos_bias.ndim == 3:
                # short T: dense-bias one-block kernel (no shear, no
                # streaming softmax); the encoder produced the dense
                # [H,T,T] bias exactly as for the XLA path
                from nrse_tpu.ops.block_attention import (
                    block_gated_attention,
                )

                p = 0.0 if deterministic else cfg.attention_dropout
                if (cfg.attn_dropout_impl == "kernel" and p > 0.0
                        and not _tp_active()):
                    # per-head-output dropout INSIDE the kernel (see the
                    # attn_dropout_impl config comment); CPU uses the
                    # masked kernel variant — same compute path
                    key = self.make_rng("dropout")
                    if jax.default_backend() == "cpu":
                        dmask = (jax.random.bernoulli(key, 1 - p, q.shape)
                                 .astype(jnp.float32) / (1 - p))
                        out = block_gated_attention(
                            q, k, v, gate, pos_bias, key_padding_mask,
                            dropout_mask=dmask,
                        )
                    else:
                        seed = jax.random.bits(key, (2,), jnp.uint32)
                        out = block_gated_attention(
                            q, k, v, gate, pos_bias, key_padding_mask,
                            p_drop=p, dropout_seed=seed,
                        )
                    kernel_dropped = True
                else:
                    out = block_gated_attention(
                        q, k, v, gate, pos_bias, key_padding_mask
                    )
            else:
                from nrse_tpu.ops.flash_attention import (
                    flash_gated_attention,
                )

                out = flash_gated_attention(
                    q, k, v, gate, pos_bias, key_padding_mask
                )
        else:
            attn_fn = partial(
                gated_bias_attention, score_dtype=cfg.score_dtype
            )
            if cfg.remat in ("attn", "attn+ffn", "light", "attn+ln"):
                # Recompute the [B, H, T, T] attention internals in the
                # backward pass instead of saving them: they dominate scan
                # residual HBM (~5 GB at bs 36 over 24 layers at T=249) yet
                # the two attention matmuls + softmax are only ~T/4D ≈ 6%
                # of layer FLOPs — vs ~33% recompute for full-layer remat.
                # Residuals kept: q/k/v/gate (O(T)).  Inner remat (like the
                # "ffn" mode) rather than an outer scan-body policy because
                # named-saveable policies break lax.cond partial-eval under
                # LayerDrop (branches would save different residual sets).
                attn_fn = jax.checkpoint(attn_fn, prevent_cse=False)
            out = attn_fn(q, k, v, gate, pos_bias, key_padding_mask)
        want_drop = (cfg.attention_dropout > 0.0 and not deterministic
                     and not kernel_dropped)
        if want_drop and not _hw_dropout_active(cfg):
            # HF drops attention *probabilities*; with the factored/flash
            # path we drop the per-head outputs instead (documented
            # deviation — probability dropout would force materialising
            # the [B,H,T,T] tensor this design exists to avoid).  Applies
            # to BOTH attention paths so flash training keeps the same
            # regularisation as the XLA path.
            out = nn.Dropout(cfg.attention_dropout)(
                out, deterministic=deterministic
            )

        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, c)
        if want_drop and _hw_dropout_active(cfg):
            # kernel site sits post-head-merge: the [B,T,C] last dim is a
            # lane multiple (D=64 is not), and an elementwise iid mask is
            # permutation-invariant in distribution
            out = _hw_drop(self, out, cfg.attention_dropout)
        return dense(c, name="out_proj")(out)


def _hw_dropout_active(cfg) -> bool:
    """True when ops/fused_dropout.py handles the per-layer dropout sites
    (see the ``WavLMConfig.dropout_impl`` comment for the fallbacks)."""
    return cfg.dropout_impl == "kernel" and not _tp_active()


def _hw_drop(module, x, p):
    """``hw_dropout`` with the flax ``dropout`` rng stream; CPU feeds an
    XLA-built mask to the masked kernel variant (same compute path —
    interpret mode stubs the hardware PRNG)."""
    from nrse_tpu.ops.fused_dropout import hw_dropout, hw_dropout_masked

    key = module.make_rng("dropout")
    if jax.default_backend() == "cpu":
        mask = (jax.random.bernoulli(key, 1.0 - p, x.shape)
                .astype(jnp.float32) / (1.0 - p))
        return hw_dropout_masked(x, mask)
    seed = jax.random.bits(key, (2,), jnp.uint32)
    return hw_dropout(x, seed, p)


def _tp_active() -> bool:
    """True when a mesh with a model axis > 1 is registered
    (``parallel.mesh.set_flash_tp_mesh`` — the shared Pallas-kernel TP
    registry; kernels cannot observe the surrounding jit's shardings)."""
    from nrse_tpu.parallel.mesh import tp_model_parallel

    return tp_model_parallel()


class FeedForward(nn.Module):
    config: WavLMConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        c, f = x.shape[-1], cfg.intermediate_size
        # Mosaic needs 128-lane-aligned shapes; interpret mode (CPU tests)
        # accepts anything, so small golden configs still cover the path
        lane = 128 if jax.default_backend() != "cpu" else 8
        if (cfg.ffn_impl == "fused" and c % lane == 0
                and (f % 512 == 0 or (f < 512 and f % lane == 0))
                and not _tp_active()):
            # under a model>1 mesh the FFN weights are Megatron-sharded
            # ([C, F/n]·[F/n, C] + psum) and GSPMD cannot partition a
            # pallas_call — fall back to the XLA pair, which GSPMD
            # shards/collects correctly (see parallel/mesh.py rules)
            return self._fused(x, deterministic)
        h = nn.Dense(
            cfg.intermediate_size, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="intermediate_dense",
        )(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(cfg.activation_dropout)(h, deterministic=deterministic)
        h = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="output_dense",
        )(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        return h

    def _fused(self, x, deterministic):
        """Both FFN matmuls + exact-erf GELU + both dropout sites as ONE
        Pallas program (ops/fused_ffn.py) — param tree identical to the
        nn.Dense pair, so checkpoints and the HF converter are untouched.
        Dropout masks come from the in-kernel hardware PRNG on TPU; on
        CPU (interpret mode stubs the PRNG) they are built XLA-side and
        fed to the masked kernel variant — same compute path."""
        from nrse_tpu.ops.fused_ffn import (
            DenseParams,
            fused_ffn,
            fused_ffn_masked,
        )

        cfg = self.config
        c, f = x.shape[-1], cfg.intermediate_size
        w1, b1 = DenseParams(f, c, cfg.param_dtype,
                             name="intermediate_dense")()
        w2, b2 = DenseParams(c, f, cfg.param_dtype, name="output_dense")()
        p_act = 0.0 if deterministic else cfg.activation_dropout
        p_hid = 0.0 if deterministic else cfg.hidden_dropout
        if p_act == 0.0 and p_hid == 0.0:
            return fused_ffn(x, w1, b1, w2, b2,
                             jnp.zeros((2,), jnp.uint32), 0.0, 0.0)
        key = self.make_rng("dropout")
        if jax.default_backend() == "cpu":
            ka, kh = jax.random.split(key)
            ma = (jax.random.bernoulli(ka, 1 - p_act, x.shape[:-1] + (f,))
                  .astype(jnp.float32) / (1 - p_act)) if p_act else \
                jnp.ones(x.shape[:-1] + (f,), jnp.float32)
            mh = (jax.random.bernoulli(kh, 1 - p_hid, x.shape)
                  .astype(jnp.float32) / (1 - p_hid)) if p_hid else \
                jnp.ones(x.shape, jnp.float32)
            return fused_ffn_masked(x, w1, b1, w2, b2, ma, mh)
        seed = jax.random.bits(key, (2,), jnp.uint32)
        return fused_ffn(x, w1, b1, w2, b2, seed, p_act, p_hid)


class EncoderLayer(nn.Module):
    """One transformer layer; pre-LN ("stable") or post-LN variant."""

    config: WavLMConfig

    def _body(self, hidden, pos_bias, key_padding_mask, deterministic):
        cfg = self.config
        if isinstance(pos_bias, tuple):  # per-layer gather from the table
            embed, buckets = pos_bias
            pos_bias = jnp.transpose(jnp.take(embed, buckets, axis=0),
                                     (2, 0, 1))
        # "light" also remats the LayerNorms: their f32 outputs are the
        # residual-HBM tail once attention + FFN internals recompute
        # (6 × f32[L, B, T, C] ≈ 5.2 GB at bs 36), and recomputing a LN
        # from the saved bf16 carry is a trivial VPU pass.
        ln_cls = nn.remat(nn.LayerNorm, prevent_cse=False) \
            if cfg.remat in ("light", "attn+ln") else nn.LayerNorm
        ln = partial(
            ln_cls, epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=cfg.param_dtype,
        )
        attn = GatedAttention(cfg, name="attention")
        # static_argnums counts self: (self=0, x=1, deterministic=2)
        ff_cls = nn.remat(FeedForward, prevent_cse=False, static_argnums=(2,)) \
            if cfg.remat in ("ffn", "attn+ffn", "light") else FeedForward
        ff = ff_cls(cfg, name="feed_forward")
        if cfg.hidden_dropout > 0.0 and _hw_dropout_active(cfg):
            def drop(y, deterministic):
                return y if deterministic else _hw_drop(
                    self, y, cfg.hidden_dropout
                )
        else:
            drop = nn.Dropout(cfg.hidden_dropout)

        if cfg.do_stable_layer_norm:
            x = ln(name="layer_norm")(hidden).astype(cfg.dtype)
            x = attn(x, pos_bias, key_padding_mask, deterministic)
            hidden = hidden + drop(x, deterministic=deterministic)
            y = ln(name="final_layer_norm")(hidden).astype(cfg.dtype)
            hidden = hidden + ff(y, deterministic)
        else:
            x = attn(hidden, pos_bias, key_padding_mask, deterministic)
            hidden = hidden + drop(x, deterministic=deterministic)
            hidden = ln(name="layer_norm")(hidden).astype(cfg.dtype)
            hidden = hidden + ff(hidden, deterministic)
            hidden = ln(name="final_layer_norm")(hidden).astype(cfg.dtype)
        return hidden

    @nn.compact
    def __call__(self, hidden, pos_bias, key_padding_mask=None,
                 deterministic: bool = True, layer_idx=None):
        cfg = self.config
        if (cfg.layerdrop <= 0.0 or deterministic
                or self.is_initializing()):
            return self._body(hidden, pos_bias, key_padding_mask,
                              deterministic)

        # LayerDrop with real skipped compute: ONE scalar draw per layer per
        # step (HF semantics — the whole batch skips together, never layer
        # 0); lax.cond executes only the taken branch at runtime, so the
        # expected `layerdrop` fraction of layer FLOPs is genuinely saved,
        # unlike a compute-then-select formulation.
        keep = jax.random.bernoulli(
            self.make_rng("layerdrop"), 1.0 - cfg.layerdrop
        )
        if layer_idx is not None:
            keep = keep | (layer_idx == 0)

        def run(mdl, h):
            return mdl._body(h, pos_bias, key_padding_mask, deterministic)

        def skip(mdl, h):
            return h

        return nn.cond(keep, run, skip, self, hidden)


class _ScanLayer(nn.Module):
    """nn.scan body: EncoderLayer with the (carry, out) contract."""

    config: WavLMConfig
    deterministic: bool

    @nn.compact
    def __call__(self, hidden, pos_bias, key_padding_mask, layer_idx):
        out = EncoderLayer(self.config, name="layer")(
            hidden, pos_bias, key_padding_mask, self.deterministic,
            layer_idx,
        )
        return out, None


class WavLMTransformerEncoder(nn.Module):
    """Transformer encoder stack (stable-LN layout for wavlm-large)."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, hidden, attention_mask=None, deterministic: bool = True):
        cfg = self.config
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)

        hidden = hidden + PositionalConvEmbedding(cfg, name="pos_conv_embed")(hidden)
        if not cfg.do_stable_layer_norm:
            hidden = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=cfg.param_dtype, name="layer_norm",
            )(hidden).astype(cfg.dtype)
        hidden = nn.Dropout(cfg.hidden_dropout)(hidden, deterministic=deterministic)

        # Encoder-level relative position bias table (HF keeps it in layer 0;
        # the converter re-homes it here).
        rel_attn_embed = self.param(
            "rel_attn_embed", nn.initializers.normal(stddev=0.02),
            (cfg.num_buckets, cfg.num_attention_heads), cfg.param_dtype,
        )
        t = hidden.shape[1]
        per_layer = cfg.per_layer_pos_bias
        if per_layer == "auto":
            per_layer = t > 512
        if cfg.use_flash_attention and not _use_block_kernel(t):
            # Toeplitz generator [H, 2T]: the streaming flash kernel
            # shears bias blocks out of this vector on-chip; the scan
            # cotangent (and the table scatter-add) are O(T), so the
            # [H, T, T] tensor never exists in HBM at any sequence length.
            pos_bias = rel_bias_vector(
                rel_attn_embed.astype(cfg.dtype), t,
                cfg.num_buckets, cfg.max_bucket_distance,
            )
        elif per_layer:
            # XLA path at long T — factored form: (table, on-device bucket
            # matrix); each layer gathers its own [H,T,T] tile
            # (remat-friendly, tiny cotangent).  The table is cast to the
            # compute dtype so the transient tile is half-size.
            buckets = relative_position_buckets_jnp(
                t, t, cfg.num_buckets, cfg.max_bucket_distance)
            pos_bias = (rel_attn_embed.astype(cfg.dtype), buckets)
        else:
            pos_bias = compute_position_bias(
                rel_attn_embed.astype(jnp.float32), t, t,
                cfg.num_buckets, cfg.max_bucket_distance,
            )

        body_cls = _ScanLayer
        if cfg.remat in (True, "full"):
            body_cls = nn.remat(_ScanLayer, prevent_cse=False)
        elif cfg.remat == "dots":
            # save MXU (matmul) outputs, recompute elementwise ops — the
            # sweet spot with flash attention: ~200 MB/layer of residuals
            # instead of full activation saves, at near-zero recompute cost
            body_cls = nn.remat(
                _ScanLayer, prevent_cse=False,
                policy=jax.checkpoint_policies.dots_saveable,
            )
        # cfg.remat == "attn" is handled inside GatedAttention (inner remat
        # of the attention core; see the comment there) — the scan body
        # itself is not rematerialised in that mode.

        # One compiled layer body scanned over stacked parameters.
        stack = nn.scan(
            body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "layerdrop": True},
            in_axes=(nn.broadcast, nn.broadcast, 0),
            length=cfg.num_hidden_layers,
            unroll=cfg.scan_unroll,
        )(cfg, deterministic, name="layers")
        hidden, _ = stack(hidden, pos_bias, attention_mask,
                          jnp.arange(cfg.num_hidden_layers))

        if cfg.do_stable_layer_norm:
            hidden = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=cfg.param_dtype, name="layer_norm",
            )(hidden).astype(cfg.dtype)
        return hidden


class WavLMModel(nn.Module):
    """Full model: conv frontend + projection + SpecAugment + transformer.

    Returns ``(sequence [B,T',C], pooled [B,C])``; the pooled output is the
    masked mean over frames (the BYOL towers consume it — SURVEY.md §3.5).
    """

    config: WavLMConfig

    @nn.compact
    def __call__(self, input_values, attention_mask=None,
                 deterministic: bool = True, apply_spec_augment=None):
        cfg = self.config
        if input_values.ndim == 3:  # [B, 1, T] parity (encoder.py:20-22)
            input_values = input_values[:, 0, :]

        fe_cls = ConvFeatureEncoder
        if cfg.frontend_remat:
            # prevent_cse=True is required here: the frontend sits at jit
            # top level (no scan/cond CSE barrier), and with CSE allowed
            # XLA merges the backward recompute with the forward run,
            # silently re-materialising the residuals remat exists to drop
            # (measured: identical 16.35G HBM peak with prevent_cse=False)
            fe_cls = nn.remat(ConvFeatureEncoder)
        feats = fe_cls(cfg, name="feature_extractor")(input_values)
        t_frames = feats.shape[1]

        frame_mask = None
        if attention_mask is not None:
            lengths = self.config.feature_lengths(
                jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
            )
            frame_mask = (
                jnp.arange(t_frames)[None, :] < lengths[:, None]
            ).astype(jnp.int32)

        hidden = FeatureProjection(cfg, name="feature_projection")(
            feats, deterministic
        )

        do_specaug = cfg.apply_spec_augment if apply_spec_augment is None \
            else apply_spec_augment
        if do_specaug and cfg.mask_time_prob > 0.0:
            masked_spec_embed = self.param(
                "masked_spec_embed",
                nn.initializers.uniform(scale=1.0),
                (cfg.hidden_size,), cfg.param_dtype,
            )
            if not deterministic:
                time_mask = _sample_time_mask(
                    self.make_rng("spec_augment"),
                    hidden.shape[0], t_frames,
                    cfg.mask_time_prob, cfg.mask_time_length,
                    cfg.mask_time_min_masks,
                )
                hidden = jnp.where(
                    time_mask[..., None],
                    masked_spec_embed[None, None, :].astype(hidden.dtype),
                    hidden,
                )

        # Tile-align the frame axis for the whole transformer stack (see
        # the seq_pad_multiple docstring).  Pad frames are zeros (= HF's
        # conv zero-padding) and masked out of attention; valid frames are
        # numerically unchanged, and the pad is sliced off again below.
        pad_t = 0
        if cfg.seq_pad_multiple > 1:
            t_pad = -(-t_frames // cfg.seq_pad_multiple) * cfg.seq_pad_multiple
            pad_t = t_pad - t_frames
        enc_mask = frame_mask
        if pad_t:
            hidden = jnp.pad(hidden, ((0, 0), (0, pad_t), (0, 0)))
            if frame_mask is None:
                enc_mask = (jnp.arange(t_pad)[None, :] < t_frames).astype(
                    jnp.int32
                ) * jnp.ones((hidden.shape[0], 1), jnp.int32)
            else:
                enc_mask = jnp.pad(frame_mask, ((0, 0), (0, pad_t)))

        hidden = WavLMTransformerEncoder(cfg, name="encoder")(
            hidden, enc_mask, deterministic
        )
        if pad_t:
            hidden = hidden[:, :t_frames, :]

        if frame_mask is not None:
            m = frame_mask[..., None].astype(hidden.dtype)
            pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
        else:
            pooled = jnp.mean(hidden, axis=1)
        return hidden, pooled


def smoke_test(variant: str = "tiny", batch: int = 2,
               seconds: float = 1.0) -> bool:
    """Dummy-batch forward + NaN/Inf check (parity with the reference's
    encoder smoke test, ``src/models/encoder.py:34-64``)."""
    import numpy as np

    cfg = WavLMConfig.from_model_name(variant) if variant != "tiny" \
        else WavLMConfig.tiny()
    model = WavLMModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, int(16000 * seconds)))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x)
    seq, pooled = model.apply(variables, x)
    print("Embeddings shape:", seq.shape, "pooled:", pooled.shape)
    ok = bool(jnp.isfinite(seq).all() and jnp.isfinite(pooled).all())
    print("Embeddings are numerically stable." if ok
          else "Warning: embeddings contain NaN/Inf values!")
    return ok


def _sample_time_mask(rng, batch, length, prob, span, min_masks):
    """Vectorised SpecAugment span sampling ([B, T] boolean).

    Same statistics as HF ``_compute_mask_indices`` (span count
    ``max(min_masks, round(prob * T / span))``, uniform span starts,
    overlaps allowed); the exact numpy sampling procedure differs — this is
    random augmentation, not a numerics contract.
    """
    n_spans = max(min_masks, int(prob * length / span + 0.5))
    starts = jax.random.randint(
        rng, (batch, n_spans), 0, max(1, length - span)
    )
    idx = jnp.arange(length)[None, None, :]
    in_span = (idx >= starts[..., None]) & (idx < starts[..., None] + span)
    return jnp.any(in_span, axis=1)


if __name__ == "__main__":
    import sys

    smoke_test(sys.argv[1] if len(sys.argv) > 1 else "tiny")
