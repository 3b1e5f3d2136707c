"""Cold-cache readahead: native fadvise binding + loader integration.

The first epoch over a cold corpus is disk-latency-bound (round-3: 328.5
cold vs 453.7 warm audio-sec/sec); ``HostDataLoader`` advises the kernel
(POSIX_FADV_WILLNEED via ``nrse_readahead``) a few batches ahead of the
decode pool through the dataset's ``readahead_paths`` hook.
"""

import numpy as np
import pytest

from nrse_tpu.runtime.native import native_available, native_readahead


@pytest.fixture
def wav_dir(tmp_path):
    from nrse_tpu.audio import save_wav

    t = np.arange(1600) / 16000.0
    for i in range(6):
        save_wav(str(tmp_path / f"x{i}.wav"),
                 (0.5 * np.sin(2 * np.pi * (200 + 40 * i) * t))
                 .astype(np.float32), 16000)
    return str(tmp_path)


def test_native_readahead_no_crash(wav_dir, tmp_path):
    import os

    paths = [os.path.join(wav_dir, f) for f in sorted(os.listdir(wav_dir))]
    if not native_available():
        assert native_readahead(paths) is False
        pytest.skip("native runtime unavailable")
    assert native_readahead(paths) is True
    assert native_readahead([]) is True
    # missing files are skipped silently (open fails, advise continues)
    assert native_readahead([str(tmp_path / "missing.wav")]) is True


def test_loader_readahead_hook(wav_dir):
    from nrse_tpu.data.loader import HostDataLoader
    from nrse_tpu.data.noisy_speech_dataset import NoiseRobustSpeechDataset

    ds = NoiseRobustSpeechDataset(wav_dir, wav_dir, max_audio_length=0.1)
    assert len(ds.readahead_paths([0, 2])) == 2

    got_on = [b["clean"].shape for b in HostDataLoader(
        ds, list(range(len(ds))), batch_size=2, shuffle=True,
        readahead_batches=2)]
    got_off = [b["clean"].shape for b in HostDataLoader(
        ds, list(range(len(ds))), batch_size=2, shuffle=True,
        readahead_batches=0)]
    assert got_on == got_off and len(got_on) == 3


def test_loader_readahead_without_hook(wav_dir):
    """Datasets without readahead_paths keep working (hook is optional)."""
    from nrse_tpu.data.loader import HostDataLoader

    class Plain:
        def sample(self, idx, rng):
            return {"x": np.zeros(4, np.float32)}

    dl = HostDataLoader(Plain(), [0, 1, 2, 3], batch_size=2,
                        readahead_batches=4)
    assert sum(1 for _ in dl) == 2
