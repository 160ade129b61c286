"""Batching loader with background prefetch.

Replaces the reference's torch DataLoader usage (`tools/train.py:165-181`).
Host work per sample is only decode + one cv2.warpAffine (datasets.py); the
rest of the augmentation pipeline runs on device, so a small thread pool is
enough to keep the TPU fed. Batches are plain dicts of stacked numpy arrays;
the trainer moves them to the mesh with `device_put_batch`.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def _collate(self, samples) -> dict:
        batch = {}
        keys = samples[0].keys()
        for k in keys:
            vals = [s[k] for s in samples]
            if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) or isinstance(
                vals[0], (np.floating, np.integer, float, int)
            ):
                batch[k] = np.stack([np.asarray(v) for v in vals])
            else:
                batch[k] = list(vals)
        batch["_n"] = len(samples)
        return batch

    def _pad(self, samples) -> list:
        """Pad the final partial batch by repeating the last sample, so
        compiled shapes stay static; `_n` records the real count."""
        out = list(samples)
        while len(out) < self.batch_size:
            out.append(samples[-1])
        return out

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        n = len(indices)
        batches = []
        for start in range(0, n, self.batch_size):
            chunk = indices[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)

        sample_rng_base = self.seed * 100003 + self.epoch

        def produce(batch_indices):
            samples = []
            for i in batch_indices:
                rng = np.random.RandomState((sample_rng_base + int(i)) % (2**31))
                samples.append(self.dataset.get_sample(int(i), rng))
            real = len(samples)
            if real < self.batch_size:
                samples = self._pad(samples)
            b = self._collate(samples)
            b["_n"] = real
            return b

        if self.num_threads <= 1:
            for bidx in batches:
                yield produce(bidx)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for bidx in batches:
                    if stop.is_set():
                        break
                    q.put(produce(bidx))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
