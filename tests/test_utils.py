import json
import os
import time

import numpy as np

from nrse_tpu.train.early_stopping import EarlyStopping
from nrse_tpu.train.emotion_trainer import ReduceLROnPlateau
from nrse_tpu.utils.profiling import StepTimer, ThroughputMeter
from nrse_tpu.utils.wandb_utils import get_wandb


def test_early_stopping_min_mode():
    es = EarlyStopping(patience=2, min_delta=0.01, mode="min")
    assert not es(1.0)
    assert not es(0.95)   # improvement
    assert not es(0.949)  # < min_delta → counter 1
    assert es(0.949)      # counter 2 == patience → stop
    assert es.early_stop


def test_early_stopping_max_mode():
    es = EarlyStopping(patience=1, mode="max")
    assert not es(0.5)
    assert not es(0.6)
    assert es(0.55)  # no improvement, patience 1 → stop
    assert es.early_stop


def test_reduce_lr_on_plateau():
    sched = ReduceLROnPlateau(1e-3, mode="max", factor=0.5, patience=1)
    assert sched.step(0.5) == 1e-3
    assert sched.step(0.6) == 1e-3   # improved
    assert sched.step(0.55) == 1e-3  # bad epoch 1 (<= patience)
    assert sched.step(0.55) == 5e-4  # bad epoch 2 → halve


def test_throughput_meter():
    m = ThroughputMeter(n_chips=2)
    m.update(36, 5.0)
    m.update(36, 5.0)
    time.sleep(0.05)
    assert m.steps == 2
    assert m.audio_sec_per_sec_per_chip > 0
    # 360 audio-sec over >=0.05s on 2 chips → < 3600
    assert m.audio_sec_per_sec_per_chip <= 360 / 0.05 / 2


def test_step_timer_smoothing():
    t = StepTimer(alpha=0.5)
    assert t.tick() is None
    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and t.smoothed is not None


def test_wandb_stub_writes_jsonl(tmp_path):
    wandb = get_wandb("disabled")
    run = wandb.init(project="t", config={}, mode="offline",
                     dir=str(tmp_path))
    wandb.log({"loss": 1.5, "img": wandb.Image("x.png")})
    wandb.finish()
    files = [f for f in os.listdir(tmp_path) if f.startswith("wandb_stub")]
    assert len(files) == 1
    rec = json.loads(open(tmp_path / files[0]).readline())
    assert rec["loss"] == 1.5 and rec["img"] == "x.png"


def test_wandb_stub_disabled_writes_nothing(tmp_path):
    wandb = get_wandb("disabled")
    wandb.init(project="t", config={}, mode="disabled", dir=str(tmp_path))
    wandb.log({"a": 1})
    wandb.finish()
    assert not [f for f in os.listdir(tmp_path) if f.startswith("wandb_stub")]


def test_scrape_problematic_files(tmp_path):
    from nrse_tpu.utils.preprocess_audio_files import (
        prune_label_list,
        scrape_problematic_files_from_logs,
    )

    log = tmp_path / "train.log"
    log.write_text(
        "2025-01-01 INFO ok\n"
        "2025-01-01 ERROR Error loading audio file /data/a.wav: boom\n"
        "2025-01-01 ERROR Error loading audio file /data/b.wav: boom\n"
    )
    bad = scrape_problematic_files_from_logs([str(log)])
    assert sorted(os.path.basename(p) for p in bad) == ["a.wav", "b.wav"]

    lst = tmp_path / "list.txt"
    lst.write_text("x/a.wav; H; A:1; V:1; D:1;\nx/c.wav; N; A:1; V:1; D:1;\n")
    kept = prune_label_list(str(lst), str(tmp_path / "out.txt"), bad)
    assert kept == 1
