"""BYOL clean/noisy pair dataset.

Capability parity with reference ``src/data/noisy_speech_dataset.py:12-194``
(``NoiseRobustSpeechDataset``: per item load a clean file + a random noise
file + a random SNR from ``snr_range``, mix, peak-normalise both, feature
extract both, retry-next-file on failure (max 5); ``create_dataloaders``:
seeded 85/15 random split into shuffled-train / ordered-val loaders).

TPU-native split of responsibilities: the host side (this module) only
*decodes* — clean and noise waveforms at fixed 5 s shapes plus the sampled
SNR.  The arithmetic (SNR scaling, peak norm, z-norm feature extraction)
runs on device inside the jitted train step via
``nrse_tpu.audio.augment.make_byol_views``, overlapped with compute by the
``PrefetchLoader``.  A ``featurize=True`` mode reproduces the reference's
host-side pipeline exactly (used for parity tests and CPU debugging).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional

import numpy as np

from nrse_tpu.audio.augment import add_noise_to_speech
from nrse_tpu.audio.io import get_audio_files, load_and_process_audio
from nrse_tpu.data.loader import HostDataLoader
from nrse_tpu.utils.logging_utils import logger


class NoiseRobustSpeechDataset:
    def __init__(self,
                 clean_data_path: str,
                 noise_data_path: str,
                 sample_rate: int = 16000,
                 max_audio_length: float = 5.0,
                 snr_range: Optional[List[float]] = None,
                 feature_extractor=None,
                 featurize: bool = False):
        self.sample_rate = sample_rate
        self.max_samples = int(max_audio_length * sample_rate)
        self.snr_range = snr_range or [0, 5, 10, 15, 20]
        self.feature_extractor = feature_extractor
        self.featurize = featurize

        self.clean_files = get_audio_files(clean_data_path)
        self.noise_files = get_audio_files(noise_data_path)
        print(
            f"Found {len(self.clean_files)} clean files and "
            f"{len(self.noise_files)} noise files."
        )

    def __len__(self) -> int:
        return len(self.clean_files)

    def readahead_paths(self, indices) -> List[str]:
        """Files an upcoming batch will read — the loader advises the
        kernel (POSIX_FADV_WILLNEED) a few batches ahead so a cold-cache
        first epoch overlaps disk latency with decode/compute.  Clean
        files only: the noise pool is small (19k vs 151k reference
        corpus) and hot after the first few hundred batches, and the
        per-item noise pick depends on the item RNG."""
        return [self.clean_files[int(i)] for i in indices]

    def _load(self, path: str, rng) -> Optional[np.ndarray]:
        pyrng = random.Random(int(rng.integers(0, 2**31)))
        return load_and_process_audio(
            path, sample_rate=self.sample_rate,
            max_audio_length=self.max_samples / self.sample_rate,
            random_crop=True, rng=pyrng,
        )

    def sample_batch(self, indices, item_rngs) -> Optional[Dict[str, np.ndarray]]:
        """Vectorised batch assembly via the native C++ loader.

        Decodes/resamples/crops the whole clean+noise batch with the
        multithreaded native runtime; items the native decoder rejects fall
        back to the per-item Python path (which carries the reference's
        retry semantics).  Returns None when the native runtime is absent
        (HostDataLoader then uses per-item ``sample``).
        """
        if self.featurize:
            return None  # parity path stays per-item
        try:
            from nrse_tpu.runtime.native import native_available, native_load_batch

            if not native_available():
                return None
        except Exception:
            return None

        n = len(indices)
        clean_paths = [self.clean_files[int(i)] for i in indices]
        noise_idx = [int(r.integers(0, len(self.noise_files))) for r in item_rngs]
        noise_paths = [self.noise_files[j] for j in noise_idx]
        seeds = np.asarray(
            [r.integers(1, 2**62) for r in item_rngs], np.uint64
        )
        clean, clean_len = native_load_batch(
            clean_paths, self.sample_rate, self.max_samples, True, seeds
        )
        noise, noise_len = native_load_batch(
            noise_paths, self.sample_rate, self.max_samples, True, seeds + 1
        )
        snr = np.asarray(
            [self.snr_range[int(r.integers(0, len(self.snr_range)))]
             for r in item_rngs], np.float32,
        )
        batch = {"clean": clean, "noise": noise, "snr": snr}
        # per-item fallback for native failures (retry semantics live there)
        bad = np.nonzero((clean_len < 0) | (noise_len < 0))[0]
        for j in bad:
            item = self.sample(int(indices[j]), item_rngs[j])
            for k in batch:
                batch[k][j] = item[k]
        return batch

    def sample(self, idx: int, rng: np.random.Generator
               ) -> Dict[str, np.ndarray]:
        """One training item with the reference's retry semantics
        (``__getitem__``, ``noisy_speech_dataset.py:54-116``)."""
        max_attempts = 5
        for attempt in range(max_attempts):
            clean = self._load(self.clean_files[idx], rng)
            if clean is None:
                logger.warning(
                    f"Invalid clean speech file, trying next (attempt {attempt+1})"
                )
                idx = (idx + 1) % len(self.clean_files)
                continue
            noise_idx = int(rng.integers(0, len(self.noise_files)))
            noise = self._load(self.noise_files[noise_idx], rng)
            if noise is None:
                logger.warning(
                    f"Invalid noise file, trying another (attempt {attempt+1})"
                )
                continue
            snr = float(self.snr_range[int(rng.integers(0, len(self.snr_range)))])

            # degenerate-power guard so the on-device mix is always valid
            if float(np.mean(clean**2)) < 1e-10 or float(np.mean(noise**2)) < 1e-10:
                continue

            if not self.featurize:
                return {
                    "clean": clean[0].astype(np.float32),
                    "noise": noise[0].astype(np.float32),
                    "snr": np.float32(snr),
                }

            # host-side parity path (reference :89-148)
            noisy = add_noise_to_speech(clean, noise, snr)
            if noisy is None:
                continue
            clean_n = clean / (np.abs(clean).max() + 1e-8)
            noisy_n = noisy / (np.abs(noisy).max() + 1e-8)
            fe = self.feature_extractor
            if fe is not None:
                clean_n = fe(clean_n.squeeze(), self.sample_rate)["input_values"]
                noisy_n = fe(noisy_n.squeeze(), self.sample_rate)["input_values"]
            return {
                "clean_input_values": clean_n.squeeze().astype(np.float32),
                "noisy_input_values": noisy_n.squeeze().astype(np.float32),
                "snr": np.float32(snr),
            }
        raise RuntimeError(
            f"failed to assemble a valid item after {max_attempts} attempts "
            f"(started at index {idx})"
        )


def create_dataloaders(config, feature_extractor=None, featurize: bool = False):
    """Seeded random split + train/val loaders (reference
    ``create_dataloaders``, ``noisy_speech_dataset.py:151-194``)."""
    data_cfg = config["data"]
    train_cfg = config["training"]
    dataset = NoiseRobustSpeechDataset(
        clean_data_path=data_cfg["clean_data_path"],
        noise_data_path=data_cfg["noise_data_path"],
        sample_rate=data_cfg["sample_rate"],
        max_audio_length=data_cfg["max_audio_length"],
        snr_range=data_cfg["snr_range"],
        feature_extractor=feature_extractor,
        featurize=featurize,
    )
    val_ratio = data_cfg.get("validation_ratio", 0.1)
    n = len(dataset)
    val_size = int(n * val_ratio)
    train_size = n - val_size
    logger.info(
        f"Splitting dataset: {train_size} training samples, {val_size} "
        f"validation samples"
    )
    seed = train_cfg.get("seed", 42)
    perm = np.random.default_rng(seed).permutation(n)
    train_idx, val_idx = perm[:train_size], perm[train_size:]

    num_workers = train_cfg.get("num_workers", 8)
    bs = train_cfg["batch_size"]

    # Multi-host: every process loads its strided shard of the index space
    # and a per-process slice of the global batch; identity when
    # single-process.  The split/permutation above is seed-deterministic,
    # so all processes agree on it without communication.
    from nrse_tpu.parallel.distributed import process_count, process_index

    nproc = process_count()
    if nproc > 1:
        if bs % nproc != 0:
            raise ValueError(
                f"training.batch_size={bs} must be divisible by the "
                f"process count ({nproc})"
            )
        bs = bs // nproc
        pid = process_index()
        train_idx = train_idx[pid::nproc]
        val_idx = val_idx[pid::nproc]
        # equal step counts on every process (ragged tails deadlock the
        # gradient all-reduce)
        train_idx = train_idx[: train_size // nproc]
        val_idx = val_idx[: (len(perm) - train_size) // nproc]
    train_loader = HostDataLoader(
        dataset, train_idx, bs, shuffle=True, seed=seed,
        num_workers=num_workers, drop_last=True,
    )
    val_loader = HostDataLoader(
        dataset, val_idx, bs, shuffle=False, seed=seed,
        num_workers=num_workers, drop_last=False,
    )
    return train_loader, val_loader
