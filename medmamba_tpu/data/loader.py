"""Host-side batch loader with background prefetch.

Replaces the reference's torch DataLoader worker pool (train.py:162-170) with a
double-buffered background-thread pipeline: while the device runs step N, the host
gathers/decodes batch N+1 and (optionally) transfers it to a sharded device buffer.
When the native C++ gather extension is available (``medmamba_tpu.data.native``)
the uint8 index-gather runs there, off the GIL.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


class BatchLoader:
    """Deterministic, seeded, shuffling batch iterator over a dataset.

    dataset must provide ``__len__`` and ``get_batch(idx) -> (images_u8, labels)``.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 42, drop_last: bool = False,
                 prefetch: int = 2, pad_to_full: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # pad the final partial batch to the full batch size with label -1
        # (keeps a single static shape -> one XLA compile; the trainer masks
        # label<0 in loss/accuracy)
        self.pad_to_full = pad_to_full

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
        return rng.permutation(n)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._order(epoch_idx)
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for i in range(nb):
                    if stop.is_set():
                        return
                    idx = order[i * self.batch_size:(i + 1) * self.batch_size]
                    imgs, labels = self.dataset.get_batch(idx)
                    if self.pad_to_full and len(idx) < self.batch_size:
                        pad = self.batch_size - len(idx)
                        imgs = np.concatenate(
                            [imgs, np.repeat(imgs[-1:], pad, 0)], 0)
                        labels = np.concatenate(
                            [labels, np.full((pad,), -1, labels.dtype)], 0)
                    q.put((imgs, labels))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
