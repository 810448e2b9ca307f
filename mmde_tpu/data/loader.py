"""Batching + prefetching loader.

Replaces torch DataLoader worker processes + collate_fn_imu
(train.py:45-61): a thread pool decodes/augments samples ahead of time, and
batches are fixed-shape numpy dicts (IMU already statically padded by the
dataset, so no pad_sequence / recompiles). `device_prefetch` overlaps
host->device transfer with compute via a 1-deep pipeline.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_SKIP_STACK_TYPES = (str, bytes)


def collate(items: Sequence[dict]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into one batch dict. String fields
    become lists (filenames); numeric fields are stacked on axis 0."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], _SKIP_STACK_TYPES):
            out[key] = list(vals)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Minimal epoch-based loader: shuffle, parallel __getitem__, collate.

    Args:
        dataset: any object with __len__/__getitem__ returning sample dicts.
        batch_size: samples per batch.
        shuffle: reshuffle indices each epoch.
        num_workers: decode threads (0 = synchronous).
        drop_last: drop the trailing partial batch.
        prefetch: batches queued ahead.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = max(prefetch, 1)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers <= 0:
            for batch_idx in self._index_batches():
                yield collate([self.dataset[int(i)] for i in batch_idx])
            return

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            gen = self._index_batches()

            def submit(batch_idx):
                futures = [pool.submit(self.dataset.__getitem__, int(i))
                           for i in batch_idx]
                pending.append(futures)

            for _ in range(self.prefetch):
                nxt = next(gen, None)
                if nxt is None:
                    break
                submit(nxt)

            while pending:
                futures = pending.pop(0)
                nxt = next(gen, None)
                if nxt is not None:
                    submit(nxt)
                yield collate([f.result() for f in futures])


def device_prefetch(iterator, mesh=None, size: int = 2):
    """Move batches to device ahead of consumption. With a mesh, shards the
    leading dim over the data axis (mmde_tpu.parallel.shard_batch)."""
    import jax
    import jax.numpy as jnp
    from mmde_tpu.parallel.mesh import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _done = object()

    def producer():
        try:
            for batch in iterator:
                arrays = {k: v for k, v in batch.items()
                          if isinstance(v, np.ndarray)}
                rest = {k: v for k, v in batch.items()
                        if not isinstance(v, np.ndarray)}
                if mesh is not None:
                    arrays = shard_batch(arrays, mesh)
                else:
                    arrays = jax.tree.map(jnp.asarray, arrays)
                q.put((arrays, rest))
        finally:
            q.put(_done)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _done:
            break
        arrays, rest = item
        arrays.update(rest)
        yield arrays
