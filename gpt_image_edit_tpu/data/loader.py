"""Parallel host-side data loading.

The reference runs 16 torch DataLoader workers for PIL/cv2/tokenizer work
(ref:train_denoiser.py:646-683 num_workers). Here a thread pool builds
samples concurrently (the hot path is the C++ image-prep library + numpy,
which release the GIL) and a bounded queue prefetches collated batches so
the TPU step never waits on input prep."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        collator: Callable,
        *,
        batch_size: int,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self._stop = threading.Event()
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        self._thread: Optional[threading.Thread] = None

    def _bucket_key(self, sample) -> tuple:
        """Samples are grouped by target resolution (and ref count class) so
        every batch is shape-homogeneous — multi-resolution training via
        per-bucket batching instead of the reference's hetero pad/mask path
        (ref:train_denoiser.py:904-916)."""
        shape = tuple(sample["target_pixels"].shape)
        refs = sample.get("ref_pixels")
        k = 0 if refs is None else (1 if refs.ndim == 3 else refs.shape[0])
        kclass = 0 if k == 0 else (1 << (k - 1).bit_length())
        return (shape, kclass)

    def _index_stream(self, rng):
        """Epoch-shuffled indices WITHOUT replacement — torch DataLoader
        shuffle=True semantics (ref:train_denoiser.py:646-683); reshuffles
        every epoch."""
        while True:
            for i in rng.permutation(len(self.dataset)):
                yield int(i)

    def _producer(self):
        rng = np.random.default_rng(self.seed)
        stream = self._index_stream(rng)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        buckets: dict = {}
        try:
            while not self._stop.is_set():
                idxs = [next(stream) for _ in range(self.batch_size)]
                for s in pool.map(self.dataset.__getitem__, idxs):
                    buckets.setdefault(self._bucket_key(s), []).append(s)
                ready = [k for k, v in buckets.items() if len(v) >= self.batch_size]
                for key in ready:
                    samples = buckets[key][: self.batch_size]
                    buckets[key] = buckets[key][self.batch_size:]
                    batch = self.collator(samples)
                    while not self._stop.is_set():
                        try:
                            self._queue.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
        finally:
            pool.shutdown(wait=False)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self._thread is None:
            self._thread = threading.Thread(target=self._producer, daemon=True)
            self._thread.start()
        while True:
            yield self._queue.get()

    def stop(self):
        self._stop.set()
