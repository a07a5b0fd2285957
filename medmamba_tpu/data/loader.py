"""Host-side batch loader with background prefetch.

Replaces the reference's torch DataLoader worker pool (train.py:162-170) with a
double-buffered background-thread pipeline: while the device runs step N, the host
gathers/decodes batch N+1 and (optionally) transfers it to a sharded device buffer.
When the native C++ gather extension is available (``medmamba_tpu.data.native``)
the uint8 index-gather runs there, off the GIL.
"""
from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterator, Optional, Tuple

import numpy as np


def device_prefetch(iterator: Iterator, put_fn: Callable, depth: int = 2):
    """Yield device-resident batches, transferring ``depth`` batches ahead.

    ``put_fn(*host_batch)`` performs the (async) host->device transfer (e.g.
    ``shard_batch``). Keeping ``depth`` transfers in flight overlaps H2D DMA
    for batch N+1 with compute of step N -- the analogue of the reference's
    ``pin_memory=True`` + CUDA-stream overlap (train.py:166-170).
    """
    buf = collections.deque()
    for item in iterator:
        buf.append(put_fn(*item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class BatchLoader:
    """Deterministic, seeded, shuffling batch iterator over a dataset.

    dataset must provide ``__len__`` and ``get_batch(idx) -> (images_u8, labels)``.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 42, drop_last: bool = False,
                 prefetch: int = 2, pad_to_full: bool = True,
                 pad_multiple: int = 1, process_index: int = 0,
                 process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Multi-host data parallelism (SURVEY §2.7 DCN axis): with
        # ``process_count`` > 1 every process builds the SAME seeded global
        # shuffle, then yields only its contiguous 1/process_count slice of
        # each global batch -- ``parallel.mesh.shard_batch`` reassembles the
        # global array from the per-process slices
        # (jax.make_array_from_process_local_data). batch_size stays the
        # GLOBAL batch so recipes are process-count-invariant.
        assert 0 <= process_index < process_count, (process_index,
                                                    process_count)
        if process_count > 1:
            assert pad_to_full, "multi-host loading requires pad_to_full " \
                "(every process must yield the same static local shape)"
        self.process_index = process_index
        self.process_count = process_count
        # pad the final partial batch to the full batch size with label -1
        # (keeps a single static shape -> one XLA compile; the trainer masks
        # label<0 in loss/accuracy)
        self.pad_to_full = pad_to_full
        # Optionally round EVERY batch up to a multiple of ``pad_multiple``
        # (the scan kernel blocks the batch dimension in 8s, so batch 100
        # runs with batch-block 4). Padded rows carry label -1 and
        # contribute exactly zero to every gradient (masked loss/BN; the
        # scan's padded rows have u = gy = 0). MEASURED NET-NEGATIVE at the
        # NPZ recipe (143.9 vs 149.0 img/s on v5e: +4% padded compute
        # outweighs the batch-block-8 gain), so OFF by default; kept as an
        # experiment knob for future block-shape changes.
        self.pad_multiple = (max(1, pad_multiple)
                             if pad_to_full and batch_size >= pad_multiple
                             else 1)

    @property
    def padded_batch_size(self) -> int:
        m = self.pad_multiple
        return -(-self.batch_size // m) * m

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

    def _materialize(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch this process's slice of one GLOBAL batch (indices ``idx``),
        padded rows (repeat-last image, label -1) included.

        Single-process (the default): the whole batch, padded to
        ``padded_batch_size`` as before. Multi-process: global row range
        [pi*lb, (pi+1)*lb) of the padded global batch, lb = padded/count --
        every process fetches only its own rows from disk."""
        target = self.padded_batch_size if self.pad_to_full else len(idx)
        pc, pi = self.process_count, self.process_index
        assert target % pc == 0, (target, pc)
        lb = target // pc
        lo = pi * lb
        real = idx[lo:min(lo + lb, len(idx))]
        if len(real) == 0:
            # the entire local slice is padding (tiny final batch): repeat
            # the batch's last real example, all rows masked with label -1
            imgs, labels = self.dataset.get_batch(idx[-1:])
            imgs = np.repeat(imgs, lb, 0)
            labels = np.full((lb,), -1, labels.dtype)
            return imgs, labels
        imgs, labels = self.dataset.get_batch(real)
        if len(real) < lb:
            pad = lb - len(real)
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
            labels = np.concatenate(
                [labels, np.full((pad,), -1, labels.dtype)], 0)
        return imgs, labels

    def epoch(self, epoch_idx: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._order(epoch_idx)
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checking_stop(item) -> bool:
            # A plain q.put can block forever if the consumer abandoned the
            # generator (stop is only observable between puts); poll instead.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for i in range(nb):
                    if stop.is_set():
                        return
                    idx = order[i * self.batch_size:(i + 1) * self.batch_size]
                    if not put_checking_stop(self._materialize(idx)):
                        return
            except BaseException as e:  # surface loader errors to the consumer
                put_checking_stop(e)
            else:
                put_checking_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
