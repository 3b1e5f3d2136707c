"""End-to-end SER trainer tests on the mock MSP corpus (tiny encoder)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def emo_config(mock_msp_dir, tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("emo_ckpt")
    return {
        "model": {"name": "wavlm-tiny", "projection_dim": 32,
                  "prediction_dim": 64, "ema_decay": 0.99},
        "training": {"batch_size": 4, "num_workers": 2, "seed": 42,
                     "log_dir": str(ckpt / "logs")},
        "data": {
            "noise_data_path": str(mock_msp_dir / "noise"),
            "sample_rate": 16000, "max_audio_length": 1.0,
            "snr_range": [5, 10], "validation_ratio": 0.2,
        },
        "logging": {"wandb_mode": "disabled", "level": "ERROR",
                    "console_level": "ERROR"},
        "emotion": {
            "labels_file": str(mock_msp_dir / "labels_consensus.csv"),
            "audio_dir": str(mock_msp_dir / "Audios"),
            "encoder_checkpoint": None,
            "checkpoint_dir": str(ckpt / "cat"),
            "train_dataset_split": "Development",
            "validataion_dataset_split": "Test1",
            "hidden_dim": 32, "batch_size": 4, "learning_rate": 1e-3,
            "fine_tuning_lr": 1e-4, "scheduler_patience": 2,
            "weight_decay": 1e-4, "dropout_rate": 0.1,
            "classifier_epochs": 2, "fine_tuning_epochs": 1, "patience": 5,
            "unfreeze_encoder": True, "add_noise_during_training": True,
            "use_class_weights": True, "categorical_only": True,
        },
        # batch 4 must divide the data axis (the placer now raises instead
        # of silently dropping sharding) — use 2 of the 8 virtual devices
        "tpu": {"compute_dtype": "float32", "flash_attention": False,
                "mesh": {"data": 2, "model": 1}},
    }


def test_emotion_dataset_items(mock_msp_dir):
    from nrse_tpu.data.emotion_dataset import EmotionDataset

    ds = EmotionDataset(
        labels_file=str(mock_msp_dir / "labels_consensus.csv"),
        audio_dir=str(mock_msp_dir / "Audios"),
        split="Development", max_audio_length=1.0,
        categorical_only=True,
    )
    # 7 Development rows, one is X → filtered with categorical_only
    assert len(ds) == 6
    item = ds.sample(0, np.random.default_rng(0))
    assert item["input_values"].shape == (16000,)
    assert item["attention_mask"].shape == (16000,)
    assert 0 <= item["C"] < 8
    # mask reflects true audio length (files are < 1 s → padded)
    assert 0 < item["attention_mask"].sum() <= 16000


def test_emotion_dataset_keeps_invalid_when_not_categorical_only(mock_msp_dir):
    from nrse_tpu.data.emotion_dataset import EmotionDataset

    ds = EmotionDataset(
        labels_file=str(mock_msp_dir / "labels_consensus.csv"),
        audio_dir=str(mock_msp_dir / "Audios"),
        split="Development", max_audio_length=1.0,
        categorical_only=False,
    )
    assert len(ds) == 7  # X row kept (mapped to 8)


def test_categorical_trainer_two_phase(emo_config):
    import copy

    from nrse_tpu.train.categorical_emotions import train_categorical_emotions

    result = train_categorical_emotions(copy.deepcopy(emo_config))
    assert 0.0 <= result["best_f1"] <= 1.0
    import os

    ck = emo_config["emotion"]["checkpoint_dir"]
    assert os.path.isdir(os.path.join(ck, "best_classifier_model"))
    assert os.path.isdir(os.path.join(ck, "best_fine_tuned_model"))
    assert os.path.exists(os.path.join(
        emo_config["training"]["log_dir"], "val_confusion_matrix.png"))


def test_dimensional_trainer(emo_config, tmp_path):
    import copy

    from nrse_tpu.train.dimentional_emotions import train_dimensional_emotions

    cfg = copy.deepcopy(emo_config)
    cfg["emotion"]["checkpoint_dir"] = str(tmp_path / "dim")
    cfg["emotion"]["unfreeze_encoder"] = False
    result = train_dimensional_emotions(cfg)
    assert -1.0 <= result["best_ccc"] <= 1.0
    import os

    assert os.path.exists(os.path.join(
        cfg["training"]["log_dir"], "val_scatter_arousal.png"))


def test_dimensional_trainer_full_encoder_e2e(emo_config, tmp_path):
    """gradual_unfreeze=False in the DIMENSIONAL trainer also trains the
    conv frontend in phase 2 (--freeze_ssl=False parity with the
    categorical trainer; train_ft_cat_ser_weighted_checkpoint.py:209-214)."""
    import copy

    import jax
    import jax.numpy as jnp

    from nrse_tpu.train import dimentional_emotions as dim_mod
    from nrse_tpu.train.dimentional_emotions import train_dimensional_emotions

    cfg = copy.deepcopy(emo_config)
    cfg["emotion"].update({
        "checkpoint_dir": str(tmp_path / "dim_e2e"),
        "unfreeze_encoder": True,
        "gradual_unfreeze": False,
        "classifier_epochs": 1,
        "fine_tuning_epochs": 1,
        "patience": 3,
    })
    # capture the rest_scale each train_step is called with, per phase
    seen = []
    orig = dim_mod.make_emotion_train_step

    def spy_make(*a, **kw):
        step = orig(*a, **kw)

        def wrapped(state, batch, cw, scale, lr, rest_scale=0.0):
            seen.append(float(jnp.asarray(rest_scale)))
            return step(state, batch, cw, scale, lr, rest_scale)

        return wrapped

    dim_mod.make_emotion_train_step = spy_make
    try:
        result = train_dimensional_emotions(cfg)
    finally:
        dim_mod.make_emotion_train_step = orig
    assert -1.0 <= result["best_ccc"] <= 1.0
    # phase 1 steps run with rest_scale 0.0, phase 2 with 1.0
    assert 0.0 in seen and 1.0 in seen
    assert seen[0] == 0.0 and seen[-1] == 1.0


def test_gradual_unfreeze_schedule():
    from nrse_tpu.models.emotion import gradually_unfrozen_layers

    # reference: layers from total*(1-(e+1)/E) upward (top-down)
    assert gradually_unfrozen_layers(0, 10, 24) == list(range(21, 24))
    assert gradually_unfrozen_layers(9, 10, 24) == list(range(0, 24))
    assert gradually_unfrozen_layers(0, 1, 24) == list(range(0, 24))


def test_layer_gradient_gating(emo_config):
    """Frozen encoder: encoder grads zero, head grads nonzero."""
    from nrse_tpu.models.emotion import (
        EmotionClassifier,
        apply_layer_unfreeze_to_grads,
        layer_gradient_scale,
    )
    from nrse_tpu.models.wavlm import WavLMConfig

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    model = EmotionClassifier(cfg, hidden_dim=32, num_emotions=8)
    x = jnp.zeros((2, 8000))
    mask = jnp.ones((2, 8000))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, mask)["params"]
    grads = jax.tree.map(jnp.ones_like, params)
    gated = apply_layer_unfreeze_to_grads(
        grads, layer_gradient_scale(cfg.num_hidden_layers, [])
    )
    assert float(jnp.abs(jax.tree.leaves(
        {"k": gated["encoder"]})[0]).max()) == 0.0
    assert all(
        float(jnp.abs(leaf).max()) == 1.0
        for leaf in jax.tree.leaves(gated["categorical_out"])
    )
    # partial unfreeze: stacked layer grads survive only at unfrozen indices
    gated2 = apply_layer_unfreeze_to_grads(
        grads, layer_gradient_scale(cfg.num_hidden_layers, [1])
    )
    stacked = jax.tree.leaves(
        gated2["encoder"]["encoder"]["layers"]
    )[0]
    assert float(jnp.abs(stacked[0]).max()) == 0.0
    assert float(jnp.abs(stacked[1]).max()) == 1.0
    # rest_scale=1.0 (--freeze_ssl=False): non-layer encoder grads
    # (conv frontend etc.) survive instead of being zeroed
    gated3 = apply_layer_unfreeze_to_grads(
        grads, layer_gradient_scale(cfg.num_hidden_layers,
                                    range(cfg.num_hidden_layers)),
        rest_scale=1.0,
    )
    fe = jax.tree.leaves(gated3["encoder"]["feature_extractor"])
    assert all(float(jnp.abs(leaf).max()) == 1.0 for leaf in fe)


def test_full_encoder_step_trains_frontend():
    """rest_scale=1.0 in the train step moves the conv-frontend params —
    the reference baseline's --freeze_ssl=False semantics
    (train_ft_cat_ser_weighted_checkpoint.py:209-214)."""
    from nrse_tpu.models.emotion import layer_gradient_scale
    from nrse_tpu.train.emotion_trainer import make_emotion_train_step

    cfg, model, opt, state, batch = _tiny_emotion_setup()
    step = make_emotion_train_step(model, opt, "categorical",
                                   cfg.num_hidden_layers)
    all_layers = layer_gradient_scale(
        cfg.num_hidden_layers, range(cfg.num_hidden_layers))
    weights = jnp.ones((8,))

    def max_abs_diff(a, b):
        return max(float(jnp.abs(x - y).max())
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    # rest_scale=0.0: frontend frozen even with all layers unfrozen
    s0, _ = step(state, batch, weights, all_layers, 1e-2, jnp.float32(0.0))
    assert max_abs_diff(s0.params["encoder"]["feature_extractor"],
                        state.params["encoder"]["feature_extractor"]) == 0.0
    assert max_abs_diff(s0.params["encoder"]["encoder"],
                        state.params["encoder"]["encoder"]) > 0.0
    # rest_scale=1.0: frontend trains too
    s1, _ = step(state, batch, weights, all_layers, 1e-2, jnp.float32(1.0))
    assert max_abs_diff(s1.params["encoder"]["feature_extractor"],
                        state.params["encoder"]["feature_extractor"]) > 0.0


def test_batch_placer_sharding():
    import jax
    import jax.numpy as jnp

    from nrse_tpu.train.emotion_trainer import make_batch_placer

    cfg = {"tpu": {"mesh": {"data": -1, "model": 1}}}
    place_batch, place_state = make_batch_placer(cfg, batch_size=8)
    batch = {"input_values": np.zeros((8, 100), np.float32)}
    placed = place_batch(batch)
    assert len(placed["input_values"].sharding.device_set) == 8

    # non-divisible batch raises (same contract as train_byol)
    with pytest.raises(ValueError, match="divisible"):
        make_batch_placer(cfg, batch_size=3)


def test_emotion_trainer_loads_byol_orbax_checkpoint(emo_config, tmp_path,
                                                     tiny_wav_dir):
    """Full pipeline handoff: BYOL pretrain checkpoint → SER trainer."""
    import copy

    import yaml

    import train_byol
    from nrse_tpu.train.categorical_emotions import load_pretrained_encoder

    byol_cfg = {
        "model": {"name": "wavlm-tiny", "projection_dim": 32,
                  "prediction_dim": 64, "ema_decay": 0.99},
        "training": {"batch_size": 8, "num_workers": 2, "num_epochs": 1,
                     "learning_rate": 1e-3, "weight_decay": 1e-5,
                     "checkpoint_dir": str(tmp_path / "byol_ck"),
                     "log_dir": str(tmp_path / "byol_logs"), "seed": 42,
                     "early_stopping_metric": "val_loss",
                     "early_stopping_patience": 5,
                     "early_stopping_min_delta": 0.0},
        "data": {"clean_data_path": str(tiny_wav_dir / "clean"),
                 "noise_data_path": str(tiny_wav_dir / "noise"),
                 "sample_rate": 16000, "max_audio_length": 1.0,
                 "snr_range": [0, 5], "validation_ratio": 0.34},
        "logging": {"wandb_mode": "disabled", "level": "ERROR",
                    "console_level": "ERROR", "visualization_interval": 100},
        "tpu": {"mesh": {"data": -1, "model": 1}, "prefetch_depth": 0},
    }
    p = tmp_path / "byol.yaml"
    p.write_text(yaml.safe_dump(byol_cfg))
    train_byol.main(["--config", str(p), "--device", "cpu"])

    cfg = copy.deepcopy(emo_config)
    cfg["emotion"]["encoder_checkpoint"] = str(
        tmp_path / "byol_ck" / "best_val_loss")
    enc = load_pretrained_encoder(cfg, jnp.zeros((2, 16000)))
    assert enc is not None
    assert "feature_extractor" in enc and "encoder" in enc


def _tiny_emotion_setup(seed=0):
    from nrse_tpu.models.emotion import EmotionClassifier
    from nrse_tpu.models.wavlm import WavLMConfig
    from nrse_tpu.train.emotion_trainer import create_emotion_state
    from nrse_tpu.train.schedules import make_emotion_optimizer

    cfg = WavLMConfig.tiny(layerdrop=0.0)
    model = EmotionClassifier(cfg, hidden_dim=32, num_emotions=8)
    batch = {
        "input_values": jnp.asarray(
            np.random.default_rng(seed).standard_normal((2, 8000)),
            jnp.float32),
        "attention_mask": jnp.ones((2, 8000)),
        "C": jnp.asarray([1, 3], jnp.int32),
        "A": jnp.zeros((2,)), "V": jnp.zeros((2,)), "D": jnp.zeros((2,)),
    }
    opt = make_emotion_optimizer(1e-2, weight_decay=1e-2)
    state = create_emotion_state(model, jax.random.PRNGKey(0), batch, opt)
    return cfg, model, opt, state, batch


def test_frozen_encoder_params_bit_identical():
    """Phase-1 freeze: encoder params (incl. AdamW weight decay) must not
    move at all — reference requires_grad semantics."""
    from nrse_tpu.models.emotion import layer_gradient_scale
    from nrse_tpu.train.emotion_trainer import make_emotion_train_step

    cfg, model, opt, state, batch = _tiny_emotion_setup()
    step = make_emotion_train_step(model, opt, "categorical",
                                   cfg.num_hidden_layers)
    frozen = layer_gradient_scale(cfg.num_hidden_layers, [])
    weights = jnp.ones((8,))
    new_state, metrics = step(state, batch, weights, frozen, 1e-2)
    assert np.isfinite(float(metrics["loss"]))

    def max_abs_diff(a, b):
        return max(float(jnp.abs(x - y).max())
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert max_abs_diff(new_state.params["encoder"],
                        state.params["encoder"]) == 0.0
    # heads DID train
    assert max_abs_diff(new_state.params["categorical_out"],
                        state.params["categorical_out"]) > 0.0


def test_emotion_optimizer_clips_gradients():
    """SER optimizer clips to global-norm 1.0 before AdamW (reference
    categorical_emotions.py:330 / dimentional_emotions.py:337)."""
    import optax

    from nrse_tpu.train.schedules import (
        make_emotion_optimizer,
        set_injected_learning_rate,
    )

    params = {"w": jnp.zeros((4,))}
    huge = {"w": jnp.full((4,), 1e6)}
    opt = make_emotion_optimizer(1.0, weight_decay=0.0)
    os_ = opt.init(params)
    set_injected_learning_rate(os_, 1.0)  # chain-nested lookup works
    updates, _ = opt.update(huge, os_, params)
    # after clip, adam normalises: |update| <= lr (+eps slack)
    assert float(jnp.abs(updates["w"]).max()) <= 1.0 + 1e-5
    # and the clip state is genuinely in the chain
    assert isinstance(os_, tuple) and len(os_) == 2


def test_nested_inject_hyperparams_all_updated():
    """With NESTED inject_hyperparams states, every level must receive the
    new LR — the walk must keep descending after the first hit (ADVICE r2:
    an 'elif' stopped at the outermost node, silently freezing inner LRs)."""
    import optax

    from nrse_tpu.train.schedules import set_injected_learning_rate

    inner = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1)
    outer = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(optax.scale(1.0), inner)
    )(learning_rate=0.1)
    os_ = outer.init({"w": jnp.zeros((2,))})

    set_injected_learning_rate(os_, 0.5)

    found = []

    def collect(state):
        if hasattr(state, "hyperparams"):
            found.append(float(state.hyperparams["learning_rate"]))
        if isinstance(state, tuple):
            for sub in state:
                collect(sub)

    collect(os_)
    assert len(found) >= 2 and all(lr == 0.5 for lr in found)
