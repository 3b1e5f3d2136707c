"""JAX → torch reverse-bridge tests (inverse of models/convert.py).

Proves the reference's own tooling can consume rebuilt models:
  * a fresh HF ``WavLMModel`` strict-loads our exported state dict and is
    bit-identical to the source model;
  * reference-format BYOL ``.pt`` checkpoints round-trip through
    ``convert.reference_byol_to_variables`` with bit parity;
  * ``final_{ssl,pool,ser}.pt`` strict-load into torch modules in the
    external harness's layout (``net.EmotionRegression`` /
    ``AttentiveStatisticsPooling``, reference ``src/models/pool.py:30-35``,
    usage ``baseline/eval_cat_ser_weighted_with_list.py:158-206``) with
    forward parity on the heads.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nrse_tpu.models.convert import (
    hf_wavlm_to_params,
    load_reference_byol_checkpoint,
    reference_byol_to_variables,
)
from nrse_tpu.models.export_torch import (
    baseline_params_to_final_pt,
    byol_variables_to_reference_state,
    params_to_hf_wavlm_state,
    save_baseline_final_pt,
    save_reference_byol_checkpoint,
)
from tests.test_checkpoint_bridge import reference_checkpoint  # noqa: F401
from tests.test_wavlm_golden import make_hf_tiny


def _style(sd):
    return ("parametrizations"
            if any("parametrizations.weight.original0" in k for k in sd)
            else "g_v")


@pytest.mark.parametrize("stable_layer_norm", [True, False])
def test_hf_export_strict_load_bit_identical(stable_layer_norm):
    hf, cfg = make_hf_tiny(stable_layer_norm=stable_layer_norm)
    src_sd = hf.state_dict()

    params = hf_wavlm_to_params(src_sd, cfg)
    out_sd = params_to_hf_wavlm_state(params, cfg,
                                      weight_norm_style=_style(src_sd))

    assert set(out_sd) == set(src_sd)
    for k in src_sd:
        assert np.array_equal(out_sd[k], src_sd[k].detach().numpy()), k

    # strict torch-side load into a FRESH model (what reference tooling does)
    fresh, _ = make_hf_tiny(stable_layer_norm=stable_layer_norm)
    with torch.no_grad():
        for p in fresh.parameters():
            p.mul_(0.0)  # guarantee the load actually changes something
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in out_sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    x = torch.from_numpy(
        np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
    )
    with torch.no_grad():
        a = hf(x).last_hidden_state.numpy()
        b = fresh(x).last_hidden_state.numpy()
    assert np.array_equal(a, b)


def test_byol_reference_state_roundtrip(reference_checkpoint):  # noqa: F811
    sd, cfg, _, _ = reference_checkpoint
    variables = reference_byol_to_variables(sd, cfg)
    out = byol_variables_to_reference_state(variables, cfg)

    src = {k: v.detach().numpy() for k, v in sd.items()}
    # the reverse bridge normalises the weight-norm spelling to the modern
    # `parametrizations` keys — the same set the fixture's torch modules emit
    assert set(out) == set(src)
    for k, v in src.items():
        assert np.array_equal(out[k], v), k


def test_byol_pt_file_roundtrip(reference_checkpoint, tmp_path):  # noqa: F811
    sd, cfg, _, _ = reference_checkpoint
    variables = reference_byol_to_variables(sd, cfg)
    path = str(tmp_path / "best_val_loss.pt")
    save_reference_byol_checkpoint(path, variables, cfg,
                                   epoch=3, loss=0.21, similarity=0.97)

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    assert ckpt["epoch"] == 3 and ckpt["loss"] == pytest.approx(0.21)
    # the reference bridge's own key filter+remap
    # (train_ft_cat_ser_weighted_checkpoint.py:138-160) finds the encoder
    wavlm = {k.replace("online_encoder.model.", ""): v
             for k, v in ckpt["model_state_dict"].items()
             if k.startswith("online_encoder.model.")}
    assert any("parametrizations.weight.original0" in k for k in wavlm)

    re_vars = load_reference_byol_checkpoint(path, cfg)
    flat_a = jax.tree.leaves(variables)
    flat_b = jax.tree.leaves(re_vars)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))


class _TorchASP(torch.nn.Module):
    """Reference AttentiveStatisticsPooling param layout
    (src/models/pool.py:30-35)."""

    def __init__(self, input_size):
        super().__init__()
        self.sap_linear = torch.nn.Linear(input_size, input_size)
        self.attention = torch.nn.Parameter(
            torch.empty(input_size, 1).normal_()
        )


class _TorchEmotionRegression(torch.nn.Module):
    """External net.EmotionRegression layout: fc = ModuleList of
    Sequential[Linear, LayerNorm, ReLU, Dropout]; out = Sequential[Linear]
    (loaded at eval_cat_ser_weighted_with_list.py:204-206)."""

    def __init__(self, input_dim, hidden_dim, num_layers, output_dim,
                 dropout=0.5):
        super().__init__()
        blocks = []
        for i in range(num_layers):
            blocks.append(torch.nn.Sequential(
                torch.nn.Linear(input_dim if i == 0 else hidden_dim,
                                hidden_dim),
                torch.nn.LayerNorm(hidden_dim),
                torch.nn.ReLU(),
                torch.nn.Dropout(dropout),
            ))
        self.fc = torch.nn.ModuleList(blocks)
        self.out = torch.nn.Sequential(
            torch.nn.Linear(hidden_dim, output_dim)
        )

    def forward(self, x):
        for block in self.fc:
            x = block(x)
        return self.out(x)


def test_baseline_final_pt_torch_load(tmp_path):
    from nrse_tpu.baseline.pipeline import BaselineSER
    from nrse_tpu.models.wavlm import WavLMConfig

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    model = BaselineSER(cfg, head_dim=48, head_layers=2)
    t = 4000
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, t)),
        jnp.ones((2, t)),
    )["params"]

    save_baseline_final_pt(str(tmp_path), params, cfg)
    ssl_sd, pool_sd, ser_sd = baseline_params_to_final_pt(params, cfg)

    # ssl: strict-loadable by a fresh HF WavLM of the same geometry
    hf, _ = make_hf_tiny(stable_layer_norm=True)
    loaded_ssl = torch.load(str(tmp_path / "final_ssl.pt"),
                            map_location="cpu", weights_only=True)
    missing, unexpected = hf.load_state_dict(loaded_ssl, strict=True)
    assert not missing and not unexpected

    # pool: reference ASP layout strict load
    pool = _TorchASP(cfg.hidden_size)
    missing, unexpected = pool.load_state_dict(
        torch.load(str(tmp_path / "final_pool.pt"), map_location="cpu",
                   weights_only=True),
        strict=True,
    )
    assert not missing and not unexpected
    assert np.array_equal(pool.sap_linear.weight.detach().numpy(),
                          np.asarray(params["pool"]["sap_linear_kernel"]).T)

    # ser: external-harness layout strict load + forward parity vs flax
    ser = _TorchEmotionRegression(2 * cfg.hidden_size, 48, 2, 8).eval()
    missing, unexpected = ser.load_state_dict(
        torch.load(str(tmp_path / "final_ser.pt"), map_location="cpu",
                   weights_only=True),
        strict=True,
    )
    assert not missing and not unexpected

    pooled = np.random.default_rng(1).standard_normal(
        (4, 2 * cfg.hidden_size)).astype(np.float32)
    from nrse_tpu.baseline.net import EmotionRegression

    flax_head = EmotionRegression(hidden_dim=48, num_layers=2, output_dim=8)
    want = flax_head.apply({"params": params["ser"]}, jnp.asarray(pooled),
                           deterministic=True)
    with torch.no_grad():
        got = ser(torch.from_numpy(pooled)).numpy()
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)
