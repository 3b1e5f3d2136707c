"""PyTorch → JAX WavLM weight conversion.

Plays the role of the reference's checkpoint key-remapping bridge
(``baseline/train_ft_cat_ser_weighted_checkpoint.py:138-160``: stripping
``online_encoder.model.`` prefixes and mapping the weight-norm
parametrisation keys ``parametrizations.weight.original{0,1}`` ↔
``weight_{g,v}``), generalised into a full HF-``WavLMModel``-state-dict →
``nrse_tpu.models.wavlm.WavLMModel`` parameter-pytree converter.

Handles:
  * torch Linear ``[out, in]`` → flax kernel ``[in, out]`` transposes;
  * torch Conv1d ``[out, in, k]`` → flax ``nn.Conv`` kernel ``[k, in, out]``;
  * weight-normalised positional conv (both old ``weight_g``/``weight_v``
    and new ``parametrizations.weight.original0/1`` key spellings);
  * re-homing layer-0's ``rel_attn_embed`` to the encoder level;
  * stacking the per-layer transformer weights into the scanned ``[L, ...]``
    layout.

Host-side, numpy only — no torch import needed when given a plain
``{name: np.ndarray}`` mapping.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from nrse_tpu.models.wavlm import WavLMConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layer_norm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Drop a leading module prefix (e.g. ``online_encoder.model.``) —
    the reference's checkpoint-bridge behaviour."""
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def hf_wavlm_to_params(state_dict: Mapping[str, Any],
                       config: WavLMConfig) -> Dict[str, Any]:
    """Convert an HF ``WavLMModel`` state dict to our parameter pytree."""
    # read through the caller's mapping (never mutated) — the full-scale
    # converter test wraps it to assert every key is consumed
    sd = state_dict
    p: Dict[str, Any] = {}

    # conv feature encoder ---------------------------------------------------
    fe: Dict[str, Any] = {}
    for i in range(len(config.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        conv = {"kernel": np.transpose(_np(sd[f"{base}.conv.weight"]), (2, 1, 0))}
        if f"{base}.conv.bias" in sd:
            conv["bias"] = _np(sd[f"{base}.conv.bias"])
        fe[f"conv_{i}"] = conv
        if config.feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = _layer_norm(sd, f"{base}.layer_norm")
        elif config.feat_extract_norm == "group" and i == 0:
            fe["group_norm"] = _layer_norm(sd, f"{base}.layer_norm")
    p["feature_extractor"] = fe

    # feature projection -----------------------------------------------------
    p["feature_projection"] = {
        "layer_norm": _layer_norm(sd, "feature_projection.layer_norm"),
        "projection": _linear(sd, "feature_projection.projection"),
    }
    if "masked_spec_embed" in sd:
        p["masked_spec_embed"] = _np(sd["masked_spec_embed"])

    # positional conv embedding (weight-norm factored) -----------------------
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.parametrizations.weight.original0" in sd:
        wg = _np(sd[f"{pc}.parametrizations.weight.original0"])
        wv = _np(sd[f"{pc}.parametrizations.weight.original1"])
    else:  # legacy torch weight_norm naming
        wg = _np(sd[f"{pc}.weight_g"])
        wv = _np(sd[f"{pc}.weight_v"])
    enc: Dict[str, Any] = {
        "pos_conv_embed": {
            "weight_g": wg.reshape(1, 1, -1),
            "weight_v": wv,
            "bias": _np(sd[f"{pc}.bias"]),
        },
        "layer_norm": _layer_norm(sd, "encoder.layer_norm"),
        # layer 0 owns the bias table in HF; it lives encoder-level here
        "rel_attn_embed": _np(
            sd["encoder.layers.0.attention.rel_attn_embed.weight"]
        ),
    }

    # transformer layers → stacked scan layout -------------------------------
    def layer_tree(i: int) -> Dict[str, Any]:
        base = f"encoder.layers.{i}"
        attn = {
            "q_proj": _linear(sd, f"{base}.attention.q_proj"),
            "k_proj": _linear(sd, f"{base}.attention.k_proj"),
            "v_proj": _linear(sd, f"{base}.attention.v_proj"),
            "out_proj": _linear(sd, f"{base}.attention.out_proj"),
            "gru_rel_pos_linear": _linear(
                sd, f"{base}.attention.gru_rel_pos_linear"
            ),
            "gru_rel_pos_const": _np(
                sd[f"{base}.attention.gru_rel_pos_const"]
            ).reshape(-1),
        }
        return {
            "attention": attn,
            "layer_norm": _layer_norm(sd, f"{base}.layer_norm"),
            "final_layer_norm": _layer_norm(sd, f"{base}.final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": _linear(
                    sd, f"{base}.feed_forward.intermediate_dense"
                ),
                "output_dense": _linear(
                    sd, f"{base}.feed_forward.output_dense"
                ),
            },
        }

    trees = [layer_tree(i) for i in range(config.num_hidden_layers)]
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)
    enc["layers"] = {"layer": stacked}
    p["encoder"] = enc
    return {"params": p}


def _torch_bn(sd: Mapping[str, Any], prefix: str):
    """torch BatchNorm1d → (params {scale,bias}, stats {mean,var})."""
    return (
        {"scale": _np(sd[f"{prefix}.weight"]),
         "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])},
    )


def _projection_head(sd: Mapping[str, Any], prefix: str):
    """torch Sequential [Linear, BN, ReLU, Linear, BN]
    (multi_layer_heads.py:4-24) → our ProjectionHead trees."""
    params, stats = {}, {}
    params["dense_0"] = _linear(sd, f"{prefix}.layers.0")
    params["bn_0"], stats["bn_0"] = _torch_bn(sd, f"{prefix}.layers.1")
    params["dense_1"] = _linear(sd, f"{prefix}.layers.3")
    params["bn_1"], stats["bn_1"] = _torch_bn(sd, f"{prefix}.layers.4")
    return params, stats


def _prediction_head(sd: Mapping[str, Any], prefix: str):
    """torch Sequential [Linear, BN, ReLU, Linear, BN, ReLU, Linear]
    (multi_layer_heads.py:27-48) → our PredictionHead trees."""
    params, stats = {}, {}
    params["dense_0"] = _linear(sd, f"{prefix}.layers.0")
    params["bn_0"], stats["bn_0"] = _torch_bn(sd, f"{prefix}.layers.1")
    params["dense_1"] = _linear(sd, f"{prefix}.layers.3")
    params["bn_1"], stats["bn_1"] = _torch_bn(sd, f"{prefix}.layers.4")
    params["dense_2"] = _linear(sd, f"{prefix}.layers.6")
    return params, stats


def reference_byol_to_variables(state_dict: Mapping[str, Any],
                                config: WavLMConfig):
    """Full bridge: a reference ``BYOLSpeechModel`` torch state dict (the
    ``model_state_dict`` inside its ``.pt`` checkpoints,
    ``train_byol.py:207-240``) → our ``BYOLVariables``.

    Handles the ``online_encoder.model.*`` prefix stripping and weight-norm
    key remap the reference's own bridge performs
    (``baseline/train_ft_cat_ser_weighted_checkpoint.py:138-160``), plus the
    BYOL heads including BatchNorm running statistics.
    """
    from nrse_tpu.models.byol import BYOLVariables

    def tower(encoder_prefix, projector_prefix, predictor_prefix=None):
        enc = hf_wavlm_to_params(
            strip_prefix(state_dict, f"{encoder_prefix}.model."), config
        )["params"]
        proj_p, proj_s = _projection_head(state_dict, projector_prefix)
        params = {"encoder": enc, "projector": proj_p}
        stats = {"projector": proj_s}
        if predictor_prefix is not None:
            pred_p, pred_s = _prediction_head(state_dict, predictor_prefix)
            params["predictor"] = pred_p
            stats["predictor"] = pred_s
        return {"params": params, "batch_stats": stats}

    online = tower("online_encoder", "online_projector", "online_predictor")
    target = tower("target_encoder", "target_projector")
    return BYOLVariables(online=online, target=target)


def load_reference_byol_checkpoint(path: str, config: WavLMConfig):
    """Load a reference ``.pt`` BYOL checkpoint file → ``BYOLVariables``.

    Accepts both the full checkpoint dict ({epoch, model_state_dict,
    optimizer_state_dict, loss, similarity} — ``train_byol.py:207-240``) and
    a bare state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return reference_byol_to_variables(sd, config)


def load_hf_wavlm(model_name_or_path: str, config: WavLMConfig):
    """Instantiate/load an HF WavLM (torch, host) and convert.

    Requires ``transformers`` + ``torch`` (available on the host image;
    never on the TPU hot path)."""
    from transformers import WavLMModel as HFWavLMModel

    hf = HFWavLMModel.from_pretrained(model_name_or_path)
    return hf_wavlm_to_params(hf.state_dict(), config)
