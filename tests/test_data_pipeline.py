import numpy as np
import pytest

from nrse_tpu.data.loader import HostDataLoader, PrefetchLoader
from nrse_tpu.data.noisy_speech_dataset import NoiseRobustSpeechDataset, create_dataloaders


@pytest.fixture(scope="module")
def dataset(tiny_wav_dir):
    return NoiseRobustSpeechDataset(
        clean_data_path=str(tiny_wav_dir / "clean"),
        noise_data_path=str(tiny_wav_dir / "noise"),
        sample_rate=16000,
        max_audio_length=1.0,
        snr_range=[0, 5, 10],
    )


def test_sample_shapes(dataset):
    item = dataset.sample(0, np.random.default_rng(0))
    assert item["clean"].shape == (16000,)
    assert item["noise"].shape == (16000,)
    assert item["snr"] in (0.0, 5.0, 10.0)


def test_host_loader_batches(dataset):
    loader = HostDataLoader(dataset, np.arange(len(dataset)), batch_size=4,
                            shuffle=True, seed=1, num_workers=2,
                            drop_last=True)
    batches = list(loader)
    assert len(batches) == len(dataset) // 4 == len(loader)
    b = batches[0]
    assert b["clean"].shape == (4, 16000)
    assert b["snr"].shape == (4,)


def test_loader_pads_last_batch(dataset):
    loader = HostDataLoader(dataset, np.arange(5), batch_size=4,
                            shuffle=False, num_workers=2, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1]["clean"].shape == (4, 16000)  # padded, static shape
    assert batches[1]["__count__"] == 1


def test_shuffle_reshuffles_across_epochs(dataset, tiny_wav_dir):
    # snr sampling differs per epoch due to epoch-seeded item rngs
    loader = HostDataLoader(dataset, np.arange(len(dataset)), batch_size=6,
                            shuffle=True, seed=3, num_workers=1)
    e1 = next(iter(loader))["snr"]
    e2 = next(iter(loader))["snr"]
    assert not np.array_equal(e1, e2)


def test_prefetch_loader_device_put(dataset):
    import jax

    loader = HostDataLoader(dataset, np.arange(4), batch_size=2,
                            shuffle=False, num_workers=1)
    pf = PrefetchLoader(loader, depth=2)
    out = list(pf)
    assert len(out) == 2
    assert isinstance(out[0]["clean"], jax.Array)


def test_prefetch_surfaces_worker_errors(dataset):
    class Broken:
        def __iter__(self):
            raise RuntimeError("decode exploded")

        def __len__(self):
            return 1

    with pytest.raises(RuntimeError, match="decode exploded"):
        list(PrefetchLoader(Broken()))


def test_create_dataloaders_split(tiny_wav_dir):
    config = {
        "data": {
            "clean_data_path": str(tiny_wav_dir / "clean"),
            "noise_data_path": str(tiny_wav_dir / "noise"),
            "sample_rate": 16000,
            "max_audio_length": 1.0,
            "snr_range": [0, 5],
            "validation_ratio": 0.34,
        },
        "training": {"batch_size": 2, "num_workers": 2, "seed": 42},
    }
    train, val = create_dataloaders(config)
    assert len(train.indices) == 4 and len(val.indices) == 2
    assert set(train.indices) | set(val.indices) == set(range(6))
    assert not set(train.indices) & set(val.indices)


def test_native_batch_fast_path_matches_shapes(dataset):
    """sample_batch (native C++ path) produces the same batch structure."""
    from nrse_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native runtime not built")
    rngs = [np.random.default_rng(i) for i in range(4)]
    batch = dataset.sample_batch(np.arange(4), rngs)
    assert batch is not None
    assert batch["clean"].shape == (4, 16000)
    assert batch["noise"].shape == (4, 16000)
    assert batch["snr"].shape == (4,)
    assert np.isfinite(batch["clean"]).all()
    assert np.abs(batch["clean"]).max() > 1e-4


def test_loader_uses_fast_path(dataset):
    from nrse_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native runtime not built")
    loader = HostDataLoader(dataset, np.arange(len(dataset)), batch_size=4,
                            shuffle=False, num_workers=1, drop_last=True)
    batch = next(iter(loader))
    assert set(batch) == {"clean", "noise", "snr", "__count__"}


def test_synthetic_corpus_resumes_after_interrupt(tmp_path):
    """An interrupted generate_corpus run (no .complete marker, files
    partially written) must regenerate only the missing/truncated files —
    large (100k+) bench corpora cannot afford a from-scratch restart."""
    import os

    from nrse_tpu.data.synthetic import generate_corpus

    root = str(tmp_path / "corpus")
    clean_dir, noise_dir = generate_corpus(root, 6, 3, seconds=0.3,
                                           verbose=False)
    # simulate an interrupt: drop the marker, delete one file, truncate one
    os.remove(os.path.join(root, ".complete"))
    os.remove(os.path.join(clean_dir, "speech_000004.wav"))
    kept = os.path.join(clean_dir, "speech_000001.wav")
    kept_mtime = os.path.getmtime(kept)
    with open(os.path.join(clean_dir, "speech_000005.wav"), "wb") as f:
        f.write(b"RIFF")  # truncated (< 1 KiB) ⇒ must be rewritten
    generate_corpus(root, 6, 3, seconds=0.3, verbose=False)
    assert os.path.exists(os.path.join(root, ".complete"))
    names = sorted(os.listdir(clean_dir))
    assert names == [f"speech_{i:06d}.wav" for i in range(6)]
    assert os.path.getsize(os.path.join(clean_dir, "speech_000005.wav")) > 1024
    # untouched files are skipped, not rewritten
    assert os.path.getmtime(kept) == kept_mtime


def test_synthetic_emotion_corpus_roundtrip(tmp_path):
    """generate_emotion_corpus writes the MSP-Podcast v1.11 schema the
    emotion pipeline consumes: EmotionDataset must parse the CSV, find the
    audio, and yield masked tensors with valid class indices for both
    splits (the SER quality-evidence path, tools/ser_report.py)."""
    from nrse_tpu.data.emotion_dataset import EmotionDataset
    from nrse_tpu.data.synthetic import generate_emotion_corpus

    audio_dir, csv_path = generate_emotion_corpus(
        str(tmp_path), n_train=12, n_dev=6, seconds=1.0, verbose=False
    )
    for split, expect in (("Train", 12), ("Development", 6)):
        ds = EmotionDataset(
            labels_file=csv_path, audio_dir=audio_dir, split=split,
            max_audio_length=1.0,
        )
        assert len(ds) == expect
        import numpy as np

        item = ds.sample(0, np.random.default_rng(0))
        assert item["input_values"].shape == (16000,)
        assert item["attention_mask"].shape == (16000,)
        assert 0 <= int(item["C"]) <= 7
        for k in ("A", "V", "D"):
            assert np.isfinite(float(item[k]))
