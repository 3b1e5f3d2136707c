"""Reference torch BYOL checkpoint → BYOLVariables bridge test.

Builds a synthetic torch BYOLSpeechModel-shaped state dict (tiny HF WavLM +
torch Linear/BatchNorm1d heads in the reference's Sequential layout),
converts it, and checks forward equivalence of the heads and the encoder
against torch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nrse_tpu.models.byol import BYOLSpeechModel
from nrse_tpu.models.convert import reference_byol_to_variables
from tests.test_wavlm_golden import make_hf_tiny


def torch_projection_head(input_dim, hidden, out):
    import torch.nn as nn

    return nn.Sequential(
        nn.Linear(input_dim, hidden), nn.BatchNorm1d(hidden), nn.ReLU(),
        nn.Linear(hidden, out), nn.BatchNorm1d(out),
    )


def torch_prediction_head(input_dim, hidden, out):
    import torch.nn as nn

    return nn.Sequential(
        nn.Linear(input_dim, hidden), nn.BatchNorm1d(hidden), nn.ReLU(),
        nn.Linear(hidden, hidden), nn.BatchNorm1d(hidden), nn.ReLU(),
        nn.Linear(hidden, out),
    )


@pytest.fixture(scope="module")
def reference_checkpoint():
    torch.manual_seed(1)
    hf_online, cfg = make_hf_tiny(stable_layer_norm=True)
    hf_target, _ = make_hf_tiny(stable_layer_norm=True)
    d, pdim, hdim = 64, 32, 48

    # reference heads wrap their Sequential in a `.layers` attribute
    # (multi_layer_heads.py:14,40) — reproduce that key layout
    modules = {
        "online_encoder.model": hf_online,
        "target_encoder.model": hf_target,
        "online_projector.layers": torch_projection_head(d, pdim, pdim),
        "target_projector.layers": torch_projection_head(d, pdim, pdim),
        "online_predictor.layers": torch_prediction_head(pdim, hdim, pdim),
    }
    # give BN running stats non-trivial values
    sd = {}
    for prefix, module in modules.items():
        for k, v in module.state_dict().items():
            if "running_var" in k:
                v = v + torch.rand_like(v)
            if "running_mean" in k:
                v = v + 0.1 * torch.randn_like(v)
            sd[f"{prefix}.{k}"] = v
    return sd, cfg, pdim, hdim


def test_bridge_loads_and_runs(reference_checkpoint):
    sd, cfg, pdim, hdim = reference_checkpoint
    variables = reference_byol_to_variables(sd, cfg)
    model = BYOLSpeechModel(
        {"model": {"projection_dim": pdim, "prediction_dim": hdim,
                   "ema_decay": 0.99}},
        encoder_config=cfg,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32)
    )
    pred, proj, _ = model.apply(variables, x, x, deterministic=True)
    assert pred.shape == (2, pdim) and proj.shape == (2, pdim)
    assert np.isfinite(np.asarray(pred)).all()


def test_bridge_head_forward_matches_torch(reference_checkpoint):
    """Eval-mode projector output matches torch bit-for-bit on the same
    pooled features."""
    sd, cfg, pdim, hdim = reference_checkpoint
    variables = reference_byol_to_variables(sd, cfg)

    from nrse_tpu.models.heads import ProjectionHead

    feats = np.random.default_rng(1).standard_normal((4, 64)).astype(np.float32)

    proj_torch = torch_projection_head(64, pdim, pdim)
    proj_torch.load_state_dict({
        k.replace("online_projector.layers.", ""): v
        for k, v in sd.items() if k.startswith("online_projector.layers.")
    })
    proj_torch.eval()
    with torch.no_grad():
        ref = proj_torch(torch.from_numpy(feats)).numpy()

    head = ProjectionHead(pdim, pdim)
    ours = head.apply(
        {"params": variables.online["params"]["projector"],
         "batch_stats": variables.online["batch_stats"]["projector"]},
        jnp.asarray(feats), use_running_average=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_bridge_encoder_matches_torch(reference_checkpoint):
    sd, cfg, pdim, hdim = reference_checkpoint
    variables = reference_byol_to_variables(sd, cfg)
    model = BYOLSpeechModel(
        {"model": {"projection_dim": pdim, "prediction_dim": hdim,
                   "ema_decay": 0.99}},
        encoder_config=cfg,
    )
    x = np.random.default_rng(2).standard_normal((2, 8000)).astype(np.float32)
    seq, pooled = model.encode(variables, jnp.asarray(x), deterministic=True)

    from transformers import WavLMModel as HFModel

    from tests.test_wavlm_golden import make_hf_tiny as _mk

    hf = _mk(True)[0]
    hf.load_state_dict({
        k.replace("online_encoder.model.", ""): v
        for k, v in sd.items() if k.startswith("online_encoder.model.")
    })
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    err = np.abs(np.asarray(seq) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, err
