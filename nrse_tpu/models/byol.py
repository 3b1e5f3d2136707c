"""BYOL dual-tower model for noise-robust speech embeddings.

Capability parity with reference ``src/models/byol.py:10-129``
(``BYOLSpeechModel``: online encoder+projector+predictor, frozen target
encoder+projector initialised as a copy, EMA target update
``t = d·t + (1−d)·o``, forward = online(clean) vs stop-grad target(noisy);
``byol_loss``: ``2 − 2·mean(cos_sim)`` with epsilon/clamp guards).

TPU-native design:
  * Parameters are explicit pytrees (``BYOLVariables``) instead of module
    state — the EMA update is a pure ``tree_map`` lerp that runs *inside*
    the jitted train step with donated buffers, so the target copy costs
    one fused elementwise pass, not a per-tensor host loop
    (reference ``byol.py:62-73`` loops in Python every step).
  * The towers consume the encoder's masked-mean pooled ``[B, 1024]``
    utterance embedding (resolving the reference's shape inconsistency,
    SURVEY.md §3.5).
  * The target forward uses ``stop_gradient`` + separate parameters — no
    ``requires_grad`` machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze, unfreeze

from nrse_tpu.models.heads import PredictionHead, ProjectionHead
from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel


class OnlineNetwork(nn.Module):
    """Encoder → projector → predictor."""

    encoder_config: WavLMConfig
    projection_dim: int = 1024
    prediction_dim: int = 2048

    @nn.compact
    def __call__(self, input_values, deterministic: bool = True):
        _, pooled = WavLMModel(self.encoder_config, name="encoder")(
            input_values, deterministic=deterministic
        )
        pooled = pooled.astype(jnp.float32)
        proj = ProjectionHead(
            self.projection_dim, self.projection_dim, name="projector"
        )(pooled, use_running_average=deterministic)
        pred = PredictionHead(
            self.prediction_dim, self.projection_dim, name="predictor"
        )(proj, use_running_average=deterministic)
        return pred, proj, pooled


class TargetNetwork(nn.Module):
    """Encoder → projector (no predictor); same submodule names as
    OnlineNetwork so parameters copy/EMA across by subtree."""

    encoder_config: WavLMConfig
    projection_dim: int = 1024

    @nn.compact
    def __call__(self, input_values, deterministic: bool = True):
        _, pooled = WavLMModel(self.encoder_config, name="encoder")(
            input_values, deterministic=deterministic
        )
        pooled = pooled.astype(jnp.float32)
        proj = ProjectionHead(
            self.projection_dim, self.projection_dim, name="projector"
        )(pooled, use_running_average=deterministic)
        return proj, pooled


class _OnlineHeads(nn.Module):
    """Projector → predictor only, same submodule names as OnlineNetwork
    so the online params/batch_stats subtrees apply directly.

    Exists for the fused eval step: it lets the similarity readout and the
    BYOL loss share ONE online-encoder forward per view (XLA does not CSE
    the duplicated 24-layer scan; deduplicating it at the trace level cut
    the measured serving step from 4 to 3 encoder passes)."""

    projection_dim: int = 1024
    prediction_dim: int = 2048

    @nn.compact
    def __call__(self, pooled, deterministic: bool = True):
        proj = ProjectionHead(
            self.projection_dim, self.projection_dim, name="projector"
        )(pooled, use_running_average=deterministic)
        pred = PredictionHead(
            self.prediction_dim, self.projection_dim, name="predictor"
        )(proj, use_running_average=deterministic)
        return pred, proj


class _TargetHead(nn.Module):
    """Projector only, named as in TargetNetwork (see _OnlineHeads)."""

    projection_dim: int = 1024

    @nn.compact
    def __call__(self, pooled, deterministic: bool = True):
        return ProjectionHead(
            self.projection_dim, self.projection_dim, name="projector"
        )(pooled, use_running_average=deterministic)


@dataclasses.dataclass
class BYOLVariables:
    """All state of the dual-tower model (a pytree)."""

    online: Dict[str, Any]  # {'params': ..., 'batch_stats': ...}
    target: Dict[str, Any]


jax.tree_util.register_dataclass(
    BYOLVariables, data_fields=["online", "target"], meta_fields=[]
)


class BYOLSpeechModel:
    """Functional orchestrator of the two towers (API mirror of
    reference ``BYOLSpeechModel``, re-expressed for JAX)."""

    def __init__(self, config: Dict[str, Any],
                 encoder_config: Optional[WavLMConfig] = None):
        model_cfg = config.get("model", {})
        tpu_cfg = config.get("tpu", {})
        if encoder_config is None:
            encoder_config = WavLMConfig.from_model_name(
                model_cfg.get("name", "microsoft/wavlm-large"),
                dtype=jnp.bfloat16
                if tpu_cfg.get("compute_dtype", "bfloat16") == "bfloat16"
                else jnp.float32,
                use_flash_attention=tpu_cfg.get("flash_attention", False),
                remat=tpu_cfg.get("remat", False),
                frontend_norm=tpu_cfg.get("frontend_norm", "mxu"),
                frontend_conv=tpu_cfg.get("frontend_conv", "xla"),
                ffn_impl=tpu_cfg.get("ffn_impl", "xla"),
                score_dtype=jnp.bfloat16
                if tpu_cfg.get("score_dtype", "float32") == "bfloat16"
                else None,
                seq_pad_multiple=int(tpu_cfg.get("seq_pad_multiple", 1)),
                attn_dropout_impl=tpu_cfg.get("attn_dropout_impl", "xla"),
                dropout_impl=tpu_cfg.get("dropout_impl", "xla"),
                qkv_impl=tpu_cfg.get("qkv_impl", "xla"),
                frontend_remat=bool(tpu_cfg.get("frontend_remat", False)),
            )
        self.encoder_config = encoder_config
        self.projection_dim = model_cfg.get("projection_dim", 1024)
        self.prediction_dim = model_cfg.get("prediction_dim", 2048)
        self.ema_decay = model_cfg.get("ema_decay", 0.997)
        self.online = OnlineNetwork(
            encoder_config, self.projection_dim, self.prediction_dim
        )
        self.target = TargetNetwork(encoder_config, self.projection_dim)

    # -- initialisation ----------------------------------------------------
    def init(self, rng, sample_input) -> BYOLVariables:
        """Init online tower; target starts as a copy of the shared
        subtrees (reference ``_copy_weights``, ``byol.py:57``).

        The copy must be a REAL buffer copy (``jnp.copy``), not an aliased
        reference: the fused train step donates the whole state, and a
        buffer appearing twice in a donated pytree makes the runtime donate
        it twice — a runtime ``INVALID_ARGUMENT`` on TPU (this was
        round 1's "donation is broken on this backend").
        """
        online_vars = unfreeze(self.online.init(
            {"params": rng}, sample_input, True
        ))
        target_vars = {
            col: {k: jax.tree.map(jnp.copy, tree[k])
                  for k in ("encoder", "projector") if k in tree}
            for col, tree in online_vars.items()
        }
        return BYOLVariables(online=online_vars, target=target_vars)

    # -- forward -----------------------------------------------------------
    def apply(self, variables: BYOLVariables, clean_input_values,
              noisy_input_values, deterministic: bool = True,
              rngs: Optional[Dict[str, Any]] = None,
              ) -> Tuple[jnp.ndarray, jnp.ndarray, BYOLVariables]:
        """Forward both towers (reference ``forward``, ``byol.py:75-97``).

        Returns ``(online_pred, target_proj, new_variables)``; in training
        mode both towers' BatchNorm running statistics advance (the torch
        reference keeps both towers in train mode during training).
        """
        mutable = False if deterministic else ["batch_stats"]
        out = self.online.apply(
            variables.online, clean_input_values, deterministic,
            rngs=rngs, mutable=mutable,
        )
        if deterministic:
            pred, _, _ = out
            new_online = variables.online
        else:
            (pred, _, _), updated = out
            new_online = {**variables.online, **unfreeze(updated)}

        tgt_rngs = None
        if rngs is not None:
            tgt_rngs = {k: jax.random.fold_in(v, 1) for k, v in rngs.items()}
        out = self.target.apply(
            variables.target, noisy_input_values, deterministic,
            rngs=tgt_rngs, mutable=mutable,
        )
        if deterministic:
            proj, _ = out
            new_target = variables.target
        else:
            (proj, _), updated = out
            new_target = {**variables.target, **unfreeze(updated)}

        proj = jax.lax.stop_gradient(proj)
        return pred, proj, BYOLVariables(online=new_online, target=new_target)

    # -- EMA ---------------------------------------------------------------
    def ema_update(self, variables: BYOLVariables,
                   decay: Optional[float] = None) -> BYOLVariables:
        """Target ← decay·target + (1−decay)·online for the shared subtrees
        (reference ``_update_target_network``, ``byol.py:62-73``)."""
        d = self.ema_decay if decay is None else decay
        online_shared = {
            k: variables.online["params"][k] for k in ("encoder", "projector")
        }
        new_target_params = jax.tree.map(
            lambda t, o: d * t + (1.0 - d) * o,
            variables.target["params"], online_shared,
        )
        new_target = {**variables.target, "params": new_target_params}
        return BYOLVariables(online=variables.online, target=new_target)

    # -- downstream --------------------------------------------------------
    def get_encoder_variables(self, variables: BYOLVariables) -> Dict[str, Any]:
        """Online-encoder subtree for downstream tasks (``get_encoder``,
        ``byol.py:99``)."""
        return {
            col: tree["encoder"]
            for col, tree in variables.online.items()
            if "encoder" in tree
        }

    def encode(self, variables: BYOLVariables, input_values,
               attention_mask=None, deterministic: bool = True):
        """Run only the online encoder → (sequence, pooled)."""
        enc_vars = self.get_encoder_variables(variables)
        return WavLMModel(self.encoder_config).apply(
            enc_vars, input_values, attention_mask, deterministic
        )

    def encode_target(self, variables: BYOLVariables, input_values,
                      attention_mask=None, deterministic: bool = True):
        """Run only the target encoder → (sequence, pooled)."""
        enc_vars = {
            col: tree["encoder"]
            for col, tree in variables.target.items()
            if "encoder" in tree
        }
        return WavLMModel(self.encoder_config).apply(
            enc_vars, input_values, attention_mask, deterministic
        )

    def online_heads(self, variables: BYOLVariables, pooled,
                     deterministic: bool = True):
        """Projector+predictor on a precomputed online pooled embedding →
        ``(pred, proj)``.  Same math as the tail of ``OnlineNetwork``
        (including its f32 cast); lets eval reuse one encoder forward for
        both the loss and the similarity readout."""
        head_vars = {
            col: {k: tree[k] for k in ("projector", "predictor") if k in tree}
            for col, tree in variables.online.items()
        }
        return _OnlineHeads(self.projection_dim, self.prediction_dim).apply(
            head_vars, pooled.astype(jnp.float32), deterministic
        )

    def target_projector(self, variables: BYOLVariables, pooled,
                         deterministic: bool = True):
        """Projector on a precomputed target pooled embedding → proj."""
        head_vars = {
            col: {k: tree[k] for k in ("projector",) if k in tree}
            for col, tree in variables.target.items()
        }
        return _TargetHead(self.projection_dim).apply(
            head_vars, pooled.astype(jnp.float32), deterministic
        )


def byol_loss_per_sample(online_pred, target_proj) -> jnp.ndarray:
    """Per-sample ``2 − 2·cosine_similarity`` [B] with the reference's
    numerical guards (``byol.py:104-129``): +1e-10 offset,
    eps-normalisation, similarity clamped to [−1, 1]."""
    online_pred = online_pred.astype(jnp.float32) + 1e-10
    target_proj = target_proj.astype(jnp.float32) + 1e-10
    o = online_pred / jnp.maximum(
        jnp.linalg.norm(online_pred, axis=1, keepdims=True), 1e-10
    )
    t = target_proj / jnp.maximum(
        jnp.linalg.norm(target_proj, axis=1, keepdims=True), 1e-10
    )
    similarity = jnp.clip(jnp.sum(o * t, axis=1), -1.0, 1.0)
    return 2.0 - 2.0 * similarity


def byol_loss(online_pred, target_proj, weights=None) -> jnp.ndarray:
    """Mean BYOL loss; optional per-sample ``weights`` [B] mask out
    degenerate items (e.g. invalid SNR mixes, where the 'noisy' view would
    collapse onto the clean one — the reference drops such items in its
    dataset retry loop, ``noisy_speech_dataset.py:56-116``)."""
    per_sample = byol_loss_per_sample(online_pred, target_proj)
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
