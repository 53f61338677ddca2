"""Batching / padding (L1) - XLA-friendly replacement for pad_collate.

Parity target: ``pad_collate`` / ``pad_collate_lm``
(``/root/reference/code/dataset/data_loader.py:429-448``): pad ragged clips to
the batch max and carry per-row lengths.

TPU redesign: ragged batch shapes force one XLA compile per unique length, so
lengths are additionally padded UP to a bucket boundary
(``bucket_length``: next power of two, clamped to ``max_len``). Each bucket
compiles once; masks carry the true lengths. The loader yields numpy tuples
``(src, tgt, mask, ids, ...)`` ready for ``jax.device_put``.
"""

from __future__ import annotations

import math
import random
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def bucket_length(n: int, min_bucket: int = 32, max_len: int = 1024) -> int:
    """Smallest power-of-two >= n (clamped): bounds compile count to
    log2(max_len / min_bucket) + 1 distinct shapes."""
    b = max(min_bucket, 1 << max(0, math.ceil(math.log2(max(n, 1)))))
    return min(b, max_len)


def pad_to(arr: np.ndarray, length: int, value: float = 0.0) -> np.ndarray:
    if arr.shape[0] >= length:
        return arr[:length]
    pad = [(0, length - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=value)


def pad_collate(batch: Sequence[Tuple], min_bucket: int = 32, max_len: int = 1024):
    """Collate dyadic items (combined, listener, path, speaker_id, listener_id,
    sentiment) into padded arrays + lengths + mask.

    Returns (src, tgt, lengths, mask, (speaker_ids, listener_ids), names).
    """
    xs = [b[0] for b in batch]
    ys = [b[1] for b in batch]
    names = [b[2] for b in batch]
    sp_ids = np.asarray([b[3] for b in batch], dtype=np.int32)
    li_ids = np.asarray([b[4] for b in batch], dtype=np.int32)
    lens = np.asarray([len(x) for x in xs], dtype=np.int32)
    L = bucket_length(int(lens.max()), min_bucket, max_len)
    src = np.stack([pad_to(x, L) for x in xs])
    tgt = np.stack([pad_to(y, L) for y in ys])
    mask = np.arange(L)[None, :] < lens[:, None]
    return src, tgt, lens, mask, (sp_ids, li_ids), names


class PaddedBatchLoader:
    """Minimal shuffling batch loader over an indexable dataset.

    Replaces torch DataLoader+DistributedSampler: per-host sharding is
    ``shard_index/num_shards`` (each host loads its slice; device-level
    sharding happens via NamedSharding on the padded arrays).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, collate: Callable = pad_collate,
                 drop_last: bool = False, shard_index: int = 0,
                 num_shards: int = 1, min_bucket: int = 32, max_len: int = 1024):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.collate = collate
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.min_bucket = min_bucket
        self.max_len = max_len
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """DistributedSampler.set_epoch parity (train_vq.py:135)."""
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self) -> Iterator:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        idx = idx[self.shard_index:: self.num_shards]
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i: i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            items = [self.dataset[j] for j in chunk]
            yield self.collate(items, min_bucket=self.min_bucket, max_len=self.max_len)


def slm_batch_from_collated(collated) -> Tuple:
    """(src, tgt, lens, mask, ids, names) -> the (src_v, tgt, src_a, mask)
    tuple the SLM engines take, splitting 824 -> 56+768
    (x_engine_pt.py:30)."""
    src, tgt, lens, mask, _ids, _names = collated
    return (src[..., :56], tgt, src[..., 56:], mask)


class PrefetchLoader:
    """Background-thread batch prefetcher.

    The reference overlaps host-side data work with the device via torch
    DataLoader worker processes (``num_workers`` in the loader factories,
    ``/root/reference/code/dataset/data_loader.py:390-533``). Equivalent
    here: a daemon thread keeps up to ``depth`` batches ahead in a bounded
    queue, so pickle reads + pad-collate (and, with ``device_put=True``,
    the host->device copy) overlap the accelerator step.

    ``transform`` maps each raw batch before it is queued (e.g.
    ``slm_batch_from_collated``); exceptions raised by the dataset or the
    transform propagate to the consuming thread at the ``next()`` that
    would have yielded the failing batch. Abandoning the iterator mid-epoch
    stops the worker promptly (bounded put with a stop flag).
    """

    _SENTINEL = object()

    def __init__(self, loader, depth: int = 2,
                 transform: Optional[Callable] = None,
                 device_put: bool = False):
        self.loader = loader
        self.depth = max(1, int(depth))
        self.transform = transform
        self.device_put = device_put

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def _prepare(self, batch):
        if self.transform is not None:
            batch = self.transform(batch)
        if self.device_put:
            import jax

            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x)
                if isinstance(x, np.ndarray) else x, batch)
        return batch

    def __iter__(self) -> Iterator:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        err: List[BaseException] = []

        def worker():
            try:
                for batch in self.loader:
                    batch = self._prepare(batch)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 - propagate to consumer
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(self._SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is self._SENTINEL:
                    if err:
                        raise err[0]
                    return
                yield batch
        finally:
            stop.set()
