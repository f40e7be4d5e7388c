"""Host input pipeline: sharded sampling + threaded prefetch loader.

Replaces the reference's torch DataLoader + DistributedSampler stack
(reference vilt/datamodules/multitask_datamodule.py:35-51): each host
reads only its own shard of every epoch permutation
(``rank::world_size``, same slicing DistributedSampler uses), workers
are a thread pool decoding/transforming ahead of the training loop, and
batches come out as plain numpy dicts ready for ``jax.device_put``.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class ConcatDataset:
    """Concatenation of datasets (reference uses torch ConcatDataset,
    multitask_datamodule.py:35-37)."""

    def __init__(self, datasets: Sequence[Any]):
        self.datasets = [d for d in datasets if len(d) > 0]
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def __getitem__(self, idx: int):
        di = int(np.searchsorted(self.offsets, idx, side="right")) - 1
        return self.datasets[di][idx - int(self.offsets[di])]

    @property
    def corpus(self) -> List[str]:
        out: List[str] = []
        for d in self.datasets:
            out.extend(getattr(d, "corpus", []))
        return out


class DataLoader:
    """Deterministic epoch iteration with per-host sharding and threaded
    prefetch.  `set_epoch` reshuffles (DistributedSampler semantics)."""

    def __init__(self, dataset, batch_size: int,
                 collate_fn: Callable[[List[Dict[str, Any]]], Dict[str, Any]],
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 num_workers: int = 4, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self.skip_batches = 0

    def set_epoch(self, epoch: int, skip_batches: int = 0):
        """`skip_batches` fast-forwards iteration past the first N
        batches of this epoch WITHOUT decoding them (mid-epoch
        preemption resume: the epoch permutation is a pure function of
        seed+epoch, so skipping reproduces the interrupted epoch's
        exact continuation).  `len()` still reports the full epoch."""
        self.epoch = epoch
        self.skip_batches = skip_batches

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.RandomState(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        idx = order[self.process_index::self.process_count]
        n_real = len(idx)
        # Every host must iterate the SAME number of batches: hosts run
        # collectives in lockstep, and the trainer's resume math
        # (train/loop.py) assumes steps_per_epoch == len(loader) on
        # every host.  order[pi::pc] shards differ by one element when
        # pc does not divide n, so equalize:
        if self.drop_last:
            # truncate every shard to the common floor(n/pc) — batches
            # per host == n // (pc*bs) exactly (at most pc-1 samples
            # dropped per epoch, reshuffled back in the next epoch)
            idx = idx[: n // self.process_count]
        elif n_real:
            # pad by wrap-around up to the common ceil(n/pc), then to a
            # batch multiple, so every batch is full-size/static — the
            # same repetition DistributedSampler applies to make the
            # set divisible (reference multitask_datamodule.py:44-47);
            # rows past n_real are masked invalid downstream so each
            # sample is still counted exactly once globally
            common = -(-n // self.process_count)
            total = -(-common // self.batch_size) * self.batch_size
            if total > n_real:
                reps = -(-total // n_real)
                idx = np.concatenate([idx] * reps)[:total]
        return idx, n_real

    def __len__(self) -> int:
        idx, _ = self._indices()
        return len(idx) // self.batch_size

    def _batches(self) -> Iterator[np.ndarray]:
        idx, n_real = self._indices()
        end = len(idx) // self.batch_size * self.batch_size
        start = min(self.skip_batches * self.batch_size, end)
        for s in range(start, end, self.batch_size):
            # validity mask so wrap-around rows are evaluated but never
            # counted (the reference's DistributedSampler evaluates each
            # sample exactly once per process)
            valid = np.arange(s, s + self.batch_size) < n_real
            yield idx[s:s + self.batch_size], valid

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def make_batch(bidx, valid):
            samples = list(pool.map(self.dataset.__getitem__, bidx))
            batch = self.collate_fn(samples)
            # host-only metadata (underscore keys stay off-device)
            batch["_valid"] = valid
            return batch

        def producer():
            try:
                for bidx, valid in self._batches():
                    if stop.is_set():
                        return
                    out_q.put(make_batch(bidx, valid))
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = out_q.get()
                if b is None:
                    break
                yield b
        finally:
            stop.set()
            pool.shutdown(wait=False)
