"""Host data loading: threaded item workers + device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=8,
pin_memory=True)`` (``noisy_speech_dataset.py:178-192``) with a TPU-shaped
pipeline:

  * ``HostDataLoader`` — a thread pool decodes/assembles fixed-shape numpy
    batches (audio decode releases the GIL in the native runtime; threads
    are enough, no process fork).
  * ``PrefetchLoader`` — a background thread keeps ``depth`` batches ahead,
    already ``device_put`` with the mesh sharding, so the TPU never waits
    on host I/O (double-buffered H2D, SURVEY.md §7 step 8).

Static shapes are preserved for XLA: the train loader drops the last ragged
batch; eval loaders pad it and report the true count.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class HostDataLoader:
    """Batched iterator over a dataset with per-item worker threads.

    ``dataset`` must expose ``sample(index, rng) -> Dict[str, np.ndarray]``
    returning fixed-shape arrays; failures must be handled inside
    ``sample`` (retry semantics live in the dataset, matching the
    reference's ``__getitem__`` retry loop).
    """

    def __init__(self, dataset, indices: Sequence[int], batch_size: int,
                 shuffle: bool = False, seed: int = 0, num_workers: int = 8,
                 drop_last: bool = True, readahead_batches: int = 4):
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.epoch = 0
        # cold-corpus mitigation: advise the kernel (readahead) this many
        # batches ahead of the decode pool, via the dataset's optional
        # `readahead_paths(indices)` hook + the native runtime's
        # posix_fadvise.  0 disables.
        self.readahead_batches = readahead_batches

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(order)
        self.epoch += 1

        bs = self.batch_size
        n_batches = len(self)
        # datasets may expose a vectorised `sample_batch` (native C++
        # multithreaded decode) — prefer it over per-item Python workers
        fast_path = getattr(self.dataset, "sample_batch", None)

        ra_hook = getattr(self.dataset, "readahead_paths", None)
        ra_depth = self.readahead_batches if ra_hook is not None else 0
        if ra_depth:
            from nrse_tpu.runtime.native import native_readahead

            def advise(b_future):
                if b_future < n_batches:
                    native_readahead(ra_hook(
                        order[b_future * bs : (b_future + 1) * bs]))

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(n_batches):
                if ra_depth:
                    # fire-and-forget: a pool worker open+fadvise+closes
                    # the files batch b+depth will decode
                    pool.submit(advise, b + ra_depth if b else 1)
                    if b == 0:  # prime the window on the first batch
                        for k in range(2, ra_depth + 1):
                            pool.submit(advise, k)
                chunk = order[b * bs : (b + 1) * bs]
                true_count = len(chunk)
                if true_count < bs:  # pad for static shapes (eval only)
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], bs - true_count)]
                    )
                item_rngs = [
                    np.random.default_rng(
                        (self.seed, self.epoch, b, i)
                    )
                    for i in range(bs)
                ]
                batch = fast_path(chunk, item_rngs) if fast_path else None
                if batch is None:
                    items = list(pool.map(
                        lambda a: self.dataset.sample(int(a[0]), a[1]),
                        zip(chunk, item_rngs),
                    ))
                    batch = {
                        k: np.stack([it[k] for it in items]) for k in items[0]
                    }
                batch["__count__"] = np.asarray(true_count, np.int32)
                yield batch


class PrefetchLoader:
    """Wraps a batch iterable; a daemon thread stays ``depth`` batches
    ahead, placing each on device (optionally mesh-sharded)."""

    def __init__(self, loader, depth: int = 2,
                 sharding: Optional[Any] = None,
                 transform: Optional[Callable] = None,
                 placer: Optional[Callable] = None):
        """``placer`` (optional) fully replaces device placement — used by
        the multi-host path to assemble per-process batches into global
        mesh-sharded arrays (``parallel.distributed.make_global_batch``)."""
        self.loader = loader
        self.depth = depth
        self.sharding = sharding
        self.transform = transform
        self.placer = placer

    def __len__(self):
        return len(self.loader)

    def _put(self, batch):
        import jax

        count = batch.pop("__count__", None)
        if self.transform is not None:
            batch = self.transform(batch)
        if self.placer is not None:
            batch = self.placer(batch)
        elif self.sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.device_put(x, self.sharding), batch
            )
        else:
            batch = jax.tree.map(jax.device_put, batch)
        if count is not None:
            batch["__count__"] = int(count)
        return batch

    def __iter__(self):
        if self.depth <= 0:  # synchronous fallback (debug / CPU testing)
            for batch in self.loader:
                yield self._put(batch)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for batch in self.loader:
                    q.put(self._put(batch))
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
