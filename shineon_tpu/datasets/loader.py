"""Host data loader: shuffled, per-process-sharded, prefetching batch iterator.

Replaces torch DataLoader + DistributedSampler (reference:
models/base_model.py:111-146, SURVEY §2.10). TPU-native plan:

  * every JAX process loads its own shard of the index space (the
    DistributedSampler equivalent is ``process_index``/``process_count``
    striding with a seeded per-epoch shuffle — seed parity: 420, train.py:29),
  * batches are collated into numpy arrays with STATIC shapes (drop_last) so
    the jitted step never retraces,
  * a background thread pool decodes samples and a small queue prefetches
    batches, overlapping host IO with device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict]) -> Dict:
    """Stack numpy leaves into a leading batch axis; non-arrays become lists."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, str):
            out[key] = vals
            continue
        if isinstance(first, np.ndarray) and first.dtype.kind in "USO":
            out[key] = [list(v) for v in vals] if first.ndim else vals
            continue
        if isinstance(first, np.ndarray) or isinstance(
            first, (np.floating, np.integer, float, int)
        ):
            out[key] = np.stack([np.asarray(v) for v in vals], axis=0)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Map-style dataset -> iterator of collated numpy batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 420,
        workers: int = 0,
        drop_last: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        prefetch: int = 2,
        limit_batches: Optional[float] = None,
    ):
        import jax

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.workers = workers
        self.drop_last = drop_last
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        self.prefetch = prefetch
        self.limit_batches = limit_batches
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (DistributedSampler.set_epoch parity)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        # pad so every process sees the same number of samples, then stride
        total = -(-n // self.process_count) * self.process_count
        if total > n:
            order = np.concatenate([order, order[: total - n]])
        return order[self.process_index::self.process_count]

    def __len__(self) -> int:
        per_proc = -(-len(self.dataset) // self.process_count)
        nb = per_proc // self.batch_size if self.drop_last else -(-per_proc // self.batch_size)
        if self.limit_batches is not None:
            if isinstance(self.limit_batches, float) and self.limit_batches <= 1.0:
                nb = max(1, int(nb * self.limit_batches))
            else:
                nb = min(nb, int(self.limit_batches))
        return nb

    def _batch_indices(self) -> List[np.ndarray]:
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        batches = [
            idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)
        ]
        return batches[: len(self)]

    def __iter__(self) -> Iterator[Dict]:
        batches = self._batch_indices()
        if self.workers <= 0:
            for batch_idx in batches:
                yield collate([self.dataset[int(i)] for i in batch_idx])
            return

        # threaded decode + bounded prefetch queue
        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, map(int, batch_idx)))
                    q.put(collate(samples))
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
