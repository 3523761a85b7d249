"""Input pipeline: bucketed, host-prefetched batch iterator.

Replaces the reference's torch DataLoader + rank-sliced batch lists
(`/root/reference/utils/commons/dataset_utils.py:260-334`,
`tasks/tts/speech_base.py:57-141`): batches are assembled on the host with a
static bucket ladder (bounded XLA shape set) and prefetched on a background
thread; under data parallelism the single-controller shards each global batch
across the mesh (conan_tpu.parallel.shard_batch) instead of per-rank slicing.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

from conan_tpu.data.batching import BucketLadder, batch_by_size, size_shuffled_indices


class BatchIterator:
    """Endless (or single-pass) iterator of collated numpy batches."""

    def __init__(self, dataset, collate_fn: Callable, *, max_tokens: int | None,
                 max_sentences: int | None, shuffle: bool = True, endless: bool = True,
                 seed: int = 1234, bucket: BucketLadder | None = None,
                 required_batch_size_multiple: int = 1, prefetch: int = 4):
        self.ds = dataset
        self.collate = collate_fn
        self.max_tokens = max_tokens
        self.max_sentences = max_sentences
        self.shuffle = shuffle
        self.endless = endless
        self.rng = np.random.default_rng(seed)
        self.bucket = bucket
        self.bs_mult = required_batch_size_multiple
        self.prefetch = prefetch

    def _epoch_batches(self) -> list[list[int]]:
        sizes = np.asarray(self.ds.sizes)
        if self.shuffle:
            idx = size_shuffled_indices(sizes, self.rng)
        else:
            idx = np.arange(len(sizes))
        batches = batch_by_size(idx, lambda i: int(sizes[i]),
                                max_tokens=self.max_tokens,
                                max_sentences=self.max_sentences,
                                required_batch_size_multiple=self.bs_mult)
        if self.shuffle:
            self.rng.shuffle(batches)
        return batches

    def _make_batch(self, index_list: list[int]) -> dict:
        samples = [self.ds[i] for i in index_list]
        if self.bucket is not None:
            max_len = max(s["mel"].shape[0] if "mel" in s else len(s["content"])
                          for s in samples)
            return self.collate(samples, target_len=self.bucket.fit(max_len))
        return self.collate(samples)

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        err: list[BaseException] = []

        def producer():
            try:
                while not stop.is_set():
                    for bl in self._epoch_batches():
                        if stop.is_set():
                            return
                        batch = self._make_batch(bl)
                        if batch:
                            q.put(batch)
                    if not self.endless:
                        break
            except BaseException as e:  # surface data errors to the consumer —
                # a swallowed exception would end training as if it completed
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    if err:
                        raise RuntimeError("data pipeline producer failed") from err[0]
                    return
                yield b
        finally:
            stop.set()
