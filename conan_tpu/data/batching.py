"""Batching: token-budget bucketing + static-shape bucket ladder.

``batch_by_size`` is semantics-compatible with the reference
(`/root/reference/utils/commons/dataset_utils.py:94-148`): length-sorted
shuffled indices packed under max_tokens × max_sentences.

TPU design delta (SURVEY.md §7): batches are padded UP to a fixed bucket
ladder of lengths so XLA compiles a handful of shapes instead of one per
batch; host-side sharding slices the batch across data-parallel replicas
(replacing the reference's rank-sliced batch lists, dataset_utils.py:317-329).
"""

from __future__ import annotations

import sys

import numpy as np


def batch_by_size(indices, num_tokens_fn, max_tokens=None, max_sentences=None,
                  required_batch_size_multiple: int = 1) -> list[list[int]]:
    max_tokens = max_tokens if max_tokens is not None else sys.maxsize
    max_sentences = max_sentences if max_sentences is not None else sys.maxsize
    bsz_mult = required_batch_size_multiple

    sample_len = 0
    sample_lens: list[int] = []
    batch: list[int] = []
    batches: list[list[int]] = []
    for idx in indices:
        idx = int(idx)
        n = num_tokens_fn(idx)
        sample_lens.append(n)
        sample_len = max(sample_len, n)
        assert sample_len <= max_tokens, (idx, sample_len, max_tokens)
        num_tokens = (len(batch) + 1) * sample_len
        full = len(batch) > 0 and (
            num_tokens > max_tokens or len(batch) == max_sentences)
        if full:
            mod_len = max(bsz_mult * (len(batch) // bsz_mult), len(batch) % bsz_mult)
            batches.append(batch[:mod_len])
            batch = batch[mod_len:]
            sample_lens = sample_lens[mod_len:]
            sample_len = max(sample_lens) if sample_lens else 0
        batch.append(idx)
    if batch:
        batches.append(batch)
    return batches


def size_shuffled_indices(sizes: np.ndarray, rng: np.random.Generator,
                          sort_by_len: bool = True) -> np.ndarray:
    """Reference BaseDataset.ordered_indices: shuffle then stable-sort by size."""
    idx = rng.permutation(len(sizes))
    if sort_by_len:
        idx = idx[np.argsort(np.asarray(sizes)[idx], kind="mergesort")]
    return idx


class BucketLadder:
    """Round a batch's max length up to a fixed ladder so every (B, T) shape
    comes from a small static set — bounds XLA recompilation."""

    def __init__(self, min_len: int = 128, max_len: int = 3000,
                 growth: float = 1.3, multiple: int = 8):
        lens = []
        l = float(min_len)
        while l < max_len:
            lens.append(int(-(-l // multiple) * multiple))
            l *= growth
        lens.append(int(-(-max_len // multiple) * multiple))
        self.lengths = sorted(set(lens))

    def fit(self, length: int) -> int:
        for l in self.lengths:
            if length <= l:
                return l
        return self.lengths[-1]


def collate_1d(arrs: list[np.ndarray], pad_value=0, target_len: int | None = None) -> np.ndarray:
    T = target_len or max(len(a) for a in arrs)
    out = np.full((len(arrs), T), pad_value, dtype=arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, :len(a)] = a[:T]
    return out


def collate_2d(arrs: list[np.ndarray], pad_value=0.0, target_len: int | None = None) -> np.ndarray:
    T = target_len or max(a.shape[0] for a in arrs)
    D = arrs[0].shape[1]
    out = np.full((len(arrs), T, D), pad_value, dtype=arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, :a.shape[0]] = a[:T]
    return out


def shard_for_replicas(batches: list[list[int]], num_replicas: int,
                       rank: int | None = None) -> list[list[int]]:
    """Rank-slice with pad-to-multiple (reference dataset_utils.py:317-329).
    With rank=None returns the padded full list (for single-controller JAX,
    where the global batch is sharded by the mesh instead)."""
    if num_replicas <= 1:
        return batches
    if len(batches) % num_replicas != 0:
        batches = batches + batches[: num_replicas - len(batches) % num_replicas]
    if rank is None:
        return batches
    return batches[rank::num_replicas]
