"""JAX → PyTorch checkpoint export (the reverse bridge).

The reference's workflow is bidirectional in spirit: BYOL checkpoints flow
into an *external* torch harness via key remapping
(``baseline/train_ft_cat_ser_weighted_checkpoint.py:138-160``), and the
baseline scripts persist/consume ``final_{ssl,pool,ser}.pt`` torch state
dicts (``baseline/eval_cat_ser_weighted_with_list.py:158-206``).  This
module is the exact inverse of :mod:`nrse_tpu.models.convert` — it lets the
reference's own tooling (HF ``WavLMModel.load_state_dict``, the challenge
harness's ``torch.load(final_*.pt)``) consume models trained by this
framework.

Layouts produced:
  * ``params_to_hf_wavlm_state`` — a complete HF ``WavLMModel`` state dict
    (torch ``[out, in]`` linears, ``[out, in, k]`` convs, weight-norm
    positional conv in either the modern ``parametrizations.weight.
    original{0,1}`` or legacy ``weight_{g,v}`` spelling, per-layer
    ``rel_attn_embed`` re-homed to layer 0).
  * ``byol_variables_to_reference_state`` — the reference
    ``BYOLSpeechModel`` state dict (``online_encoder.model.*``,
    ``online_projector.layers.*`` Sequential indices, BatchNorm running
    stats) as saved by ``train_byol.py:207-240``.
  * ``baseline_params_to_final_pt`` — the three challenge-harness dicts:
    ``final_ssl.pt`` (HF WavLM), ``final_pool.pt``
    (``AttentiveStatisticsPooling``: ``sap_linear.{weight,bias}`` +
    ``attention``, reference ``src/models/pool.py:30-35``), ``final_ser.pt``
    (``net.EmotionRegression``: ``fc.{i}.{0,1}.*`` Sequential +
    ``out.0.*``, usage ``eval_cat_ser_weighted_with_list.py:204-206``).

Host-side numpy; ``torch`` is only imported by the ``save_*`` helpers.
Round-trip bit-parity with ``convert.py`` is pinned by
``tests/test_export_torch.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from nrse_tpu.models.wavlm import WavLMConfig

__all__ = [
    "params_to_hf_wavlm_state",
    "byol_variables_to_reference_state",
    "baseline_params_to_final_pt",
    "save_reference_byol_checkpoint",
    "save_baseline_final_pt",
]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _unwrap(params: Mapping[str, Any]) -> Mapping[str, Any]:
    """Accept either a bare param tree or the ``{'params': ...}`` wrapper."""
    if "params" in params and isinstance(params["params"], Mapping):
        return params["params"]
    return params


def _linear(out: Dict[str, np.ndarray], prefix: str, tree: Mapping[str, Any]):
    out[f"{prefix}.weight"] = _np(tree["kernel"]).T
    if "bias" in tree:
        out[f"{prefix}.bias"] = _np(tree["bias"])


def _layer_norm(out: Dict[str, np.ndarray], prefix: str,
                tree: Mapping[str, Any]):
    out[f"{prefix}.weight"] = _np(tree["scale"])
    out[f"{prefix}.bias"] = _np(tree["bias"])


def params_to_hf_wavlm_state(
    params: Mapping[str, Any],
    config: WavLMConfig,
    weight_norm_style: str = "parametrizations",
) -> Dict[str, np.ndarray]:
    """Our WavLM parameter pytree → HF ``WavLMModel`` state dict (numpy).

    ``weight_norm_style`` picks the positional-conv key spelling:
    ``"parametrizations"`` (modern torch, what ``HFModel.state_dict()``
    emits today and what the reference bridge remaps at
    ``train_ft_cat_ser_weighted_checkpoint.py:148-153``) or ``"g_v"``
    (legacy ``weight_g``/``weight_v``).
    """
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}

    # conv feature encoder: flax [k, in, out] → torch [out, in, k]
    fe = p["feature_extractor"]
    for i in range(len(config.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        conv = fe[f"conv_{i}"]
        sd[f"{base}.conv.weight"] = np.transpose(_np(conv["kernel"]), (2, 1, 0))
        if "bias" in conv:
            sd[f"{base}.conv.bias"] = _np(conv["bias"])
        if config.feat_extract_norm == "layer":
            _layer_norm(sd, f"{base}.layer_norm", fe[f"layer_norm_{i}"])
        elif config.feat_extract_norm == "group" and i == 0:
            _layer_norm(sd, f"{base}.layer_norm", fe["group_norm"])

    fp = p["feature_projection"]
    _layer_norm(sd, "feature_projection.layer_norm", fp["layer_norm"])
    _linear(sd, "feature_projection.projection", fp["projection"])
    if "masked_spec_embed" in p:
        sd["masked_spec_embed"] = _np(p["masked_spec_embed"])

    enc = p["encoder"]
    pc = "encoder.pos_conv_embed.conv"
    wg = _np(enc["pos_conv_embed"]["weight_g"]).reshape(1, 1, -1)
    wv = _np(enc["pos_conv_embed"]["weight_v"])
    if weight_norm_style == "parametrizations":
        sd[f"{pc}.parametrizations.weight.original0"] = wg
        sd[f"{pc}.parametrizations.weight.original1"] = wv
    elif weight_norm_style == "g_v":
        sd[f"{pc}.weight_g"] = wg
        sd[f"{pc}.weight_v"] = wv
    else:
        raise ValueError(f"unknown weight_norm_style: {weight_norm_style!r}")
    sd[f"{pc}.bias"] = _np(enc["pos_conv_embed"]["bias"])
    _layer_norm(sd, "encoder.layer_norm", enc["layer_norm"])

    # stacked scan layout [L, ...] → per-layer HF keys; the shared bias
    # table lives encoder-level here, on layer 0 in HF
    stacked = enc["layers"]["layer"]
    n_layers = config.num_hidden_layers
    for i in range(n_layers):
        base = f"encoder.layers.{i}"
        attn = stacked["attention"]
        _linear(sd, f"{base}.attention.q_proj",
                {k: v[i] for k, v in attn["q_proj"].items()})
        _linear(sd, f"{base}.attention.k_proj",
                {k: v[i] for k, v in attn["k_proj"].items()})
        _linear(sd, f"{base}.attention.v_proj",
                {k: v[i] for k, v in attn["v_proj"].items()})
        _linear(sd, f"{base}.attention.out_proj",
                {k: v[i] for k, v in attn["out_proj"].items()})
        _linear(sd, f"{base}.attention.gru_rel_pos_linear",
                {k: v[i] for k, v in attn["gru_rel_pos_linear"].items()})
        sd[f"{base}.attention.gru_rel_pos_const"] = _np(
            attn["gru_rel_pos_const"][i]
        ).reshape(1, attn["gru_rel_pos_const"][i].size, 1, 1)
        if i == 0:
            sd[f"{base}.attention.rel_attn_embed.weight"] = _np(
                enc["rel_attn_embed"]
            )
        _layer_norm(sd, f"{base}.layer_norm",
                    {k: v[i] for k, v in stacked["layer_norm"].items()})
        _layer_norm(sd, f"{base}.final_layer_norm",
                    {k: v[i] for k, v in stacked["final_layer_norm"].items()})
        ff = stacked["feed_forward"]
        _linear(sd, f"{base}.feed_forward.intermediate_dense",
                {k: v[i] for k, v in ff["intermediate_dense"].items()})
        _linear(sd, f"{base}.feed_forward.output_dense",
                {k: v[i] for k, v in ff["output_dense"].items()})
    return sd


def _bn_out(sd: Dict[str, np.ndarray], prefix: str,
            params: Mapping[str, Any], stats: Mapping[str, Any]):
    """flax BN (params {scale,bias} + batch_stats {mean,var}) → torch
    BatchNorm1d keys, incl. the ``num_batches_tracked`` buffer a strict
    torch ``load_state_dict`` requires."""
    sd[f"{prefix}.weight"] = _np(params["scale"])
    sd[f"{prefix}.bias"] = _np(params["bias"])
    sd[f"{prefix}.running_mean"] = _np(stats["mean"])
    sd[f"{prefix}.running_var"] = _np(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _projection_head_out(sd, prefix, params, stats):
    """Inverse of ``convert._projection_head``: torch Sequential
    [Linear, BN, ReLU, Linear, BN] (``multi_layer_heads.py:4-24``)."""
    _linear(sd, f"{prefix}.layers.0", params["dense_0"])
    _bn_out(sd, f"{prefix}.layers.1", params["bn_0"], stats["bn_0"])
    _linear(sd, f"{prefix}.layers.3", params["dense_1"])
    _bn_out(sd, f"{prefix}.layers.4", params["bn_1"], stats["bn_1"])


def _prediction_head_out(sd, prefix, params, stats):
    """Inverse of ``convert._prediction_head``: torch Sequential
    [Linear, BN, ReLU, Linear, BN, ReLU, Linear]
    (``multi_layer_heads.py:27-48``)."""
    _linear(sd, f"{prefix}.layers.0", params["dense_0"])
    _bn_out(sd, f"{prefix}.layers.1", params["bn_0"], stats["bn_0"])
    _linear(sd, f"{prefix}.layers.3", params["dense_1"])
    _bn_out(sd, f"{prefix}.layers.4", params["bn_1"], stats["bn_1"])
    _linear(sd, f"{prefix}.layers.6", params["dense_2"])


def byol_variables_to_reference_state(
    variables, config: WavLMConfig,
) -> Dict[str, np.ndarray]:
    """``BYOLVariables`` → the reference ``BYOLSpeechModel`` state dict
    (the ``model_state_dict`` inside its ``.pt`` checkpoints,
    ``train_byol.py:207-240``)."""
    sd: Dict[str, np.ndarray] = {}

    def tower(tree, encoder_prefix, projector_prefix, predictor_prefix=None):
        params, stats = tree["params"], tree["batch_stats"]
        enc = params_to_hf_wavlm_state(params["encoder"], config)
        for k, v in enc.items():
            sd[f"{encoder_prefix}.model.{k}"] = v
        _projection_head_out(sd, projector_prefix, params["projector"],
                             stats["projector"])
        if predictor_prefix is not None:
            _prediction_head_out(sd, predictor_prefix, params["predictor"],
                                 stats["predictor"])

    tower(variables.online, "online_encoder", "online_projector",
          "online_predictor")
    tower(variables.target, "target_encoder", "target_projector")
    return sd


def save_reference_byol_checkpoint(
    path: str, variables, config: WavLMConfig, *,
    epoch: int = 0, loss: float = 0.0, similarity: float = 0.0,
    optimizer_state: Any = None,
) -> None:
    """Write a reference-format BYOL ``.pt`` checkpoint
    ({epoch, model_state_dict, optimizer_state_dict, loss, similarity} —
    ``train_byol.py:207-240``) that the reference's own bridge
    (``train_ft_cat_ser_weighted_checkpoint.py:138-160``) can load."""
    import torch

    sd = byol_variables_to_reference_state(variables, config)
    torch.save({
        "epoch": epoch,
        "model_state_dict": {k: torch.from_numpy(np.array(v, copy=True))
                             for k, v in sd.items()},
        "optimizer_state_dict": optimizer_state,
        "loss": loss,
        "similarity": similarity,
    }, path)


def baseline_params_to_final_pt(
    params: Mapping[str, Any], config: WavLMConfig,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray],
           Dict[str, np.ndarray]]:
    """``BaselineSER`` params (subtrees ``ssl``/``pool``/``ser``) → the
    three challenge-harness state dicts (``final_{ssl,pool,ser}.pt``,
    ``eval_cat_ser_weighted_with_list.py:158-206``)."""
    p = _unwrap(params)

    ssl_sd = params_to_hf_wavlm_state(p["ssl"], config)

    pool = p["pool"]
    pool_sd = {
        "sap_linear.weight": _np(pool["sap_linear_kernel"]).T,
        "sap_linear.bias": _np(pool["sap_linear_bias"]),
        "attention": _np(pool["attention"]),
    }

    ser = p["ser"]
    ser_sd: Dict[str, np.ndarray] = {}
    i = 0
    while f"fc_{i}" in ser:
        # external net.EmotionRegression: fc = ModuleList of
        # Sequential[Linear, LayerNorm, ReLU, Dropout]
        _linear(ser_sd, f"fc.{i}.0", ser[f"fc_{i}"])
        _layer_norm(ser_sd, f"fc.{i}.1", ser[f"norm_{i}"])
        i += 1
    _linear(ser_sd, "out.0", ser["out"])
    return ssl_sd, pool_sd, ser_sd


def save_baseline_final_pt(out_dir: str, params: Mapping[str, Any],
                           config: WavLMConfig,
                           prefix: str = "final") -> None:
    """Write ``{prefix}_{ssl,pool,ser}.pt`` under ``out_dir`` (torch)."""
    import os

    import torch

    def t(sd):
        return {k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}

    ssl_sd, pool_sd, ser_sd = baseline_params_to_final_pt(params, config)
    os.makedirs(out_dir, exist_ok=True)
    torch.save(t(ssl_sd), os.path.join(out_dir, f"{prefix}_ssl.pt"))
    torch.save(t(pool_sd), os.path.join(out_dir, f"{prefix}_pool.pt"))
    torch.save(t(ser_sd), os.path.join(out_dir, f"{prefix}_ser.pt"))
