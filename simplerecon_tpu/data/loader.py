"""Batching + prefetching data loader (host-side).

The reference uses torch DataLoader worker processes
(`train.py:65-94`); here a thread pool decodes tuples concurrently
(PIL/numpy release the GIL for the heavy parts) and a background thread
keeps a bounded prefetch queue of ready batches, so the TPU never waits
on the host. Batches are numpy dicts `{"cur": ..., "src": ...}`; the
training driver moves them onto the device mesh with
`parallel.shard_batch`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


def collate(elements: List[Tuple[Dict, Dict]]) -> Dict[str, Dict]:
    """Stacks `(cur_data, src_data)` pairs into a batch dict."""
    cur_keys = elements[0][0].keys()
    src_keys = elements[0][1].keys()

    def stack(dicts, key):
        vals = [d[key] for d in dicts]
        if isinstance(vals[0], (str, list)):
            return vals
        return np.stack(vals, axis=0)

    cur = {k: stack([e[0] for e in elements], k) for k in cur_keys}
    src = {k: stack([e[1] for e in elements], k) for k in src_keys}
    return {"cur": cur, "src": src}


def to_train_schema(batch: Dict[str, Dict]) -> Dict[str, Dict]:
    """Adapts a reference-schema batch (depth_b1hw with channel dim) to
    the train-step schema (depth_bhw, mask_b_bhw, depth_bkhw)."""
    cur, src = dict(batch["cur"]), dict(batch["src"])
    if "depth_b1hw" in cur:
        cur["depth_bhw"] = cur.pop("depth_b1hw")[:, 0]
        cur.pop("mask_b1hw", None)
        cur["mask_b_bhw"] = cur.pop("mask_b_b1hw")[:, 0]
        # losses expect zero-filled (not NaN) GT outside the mask
        cur["depth_bhw"] = np.nan_to_num(cur["depth_bhw"], nan=0.0)
    if "depth_b1hw" in src:
        src["depth_bkhw"] = np.nan_to_num(src.pop("depth_b1hw")[:, :, 0],
                                          nan=0.0)
        src.pop("mask_b1hw", None)
        src.pop("mask_b_b1hw", None)
    return {"cur": cur, "src": src}


def device_prefetch(batches, size: int = 2, sharding=None):
    """Host->device double buffering.

    Keeps up to `size` batches already transferred to the device (or
    laid out on a mesh when `sharding` is given) ahead of the consumer,
    so the H2D copy of batch n+1 overlaps the model running batch n —
    the TPU-side equivalent of the reference's pinned-memory
    `non_blocking=True` DataLoader transfers (`train.py:65-94`).
    Non-array leaves (frame-id strings) pass through untouched.
    """
    import collections

    import jax

    def put(batch):
        def leaf(x):
            if isinstance(x, np.ndarray):
                if sharding is not None:
                    return jax.device_put(x, sharding)
                return jax.device_put(x)
            return x
        return jax.tree_util.tree_map(leaf, batch)

    it = iter(batches)
    buf = collections.deque()
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class DataLoader:
    """Iterates batches over a dataset with threaded decode + prefetch.

    Args:
        dataset: any `GenericMVSDataset`.
        batch_size: global batch size (pad-free: drops the last partial
            batch when `drop_last`).
        shuffle: reshuffle element order each epoch.
        num_workers: decode threads.
        prefetch: max ready batches queued ahead.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, prefetch: int = 4,
                 drop_last: bool = False, seed: int = 0,
                 adapter=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.adapter = adapter

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, Dict]]:
        indices = self._indices()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        chunk = indices[b * self.batch_size:
                                        (b + 1) * self.batch_size]
                        elems = list(pool.map(self.dataset.__getitem__,
                                              chunk))
                        batch = collate(elems)
                        if self.adapter is not None:
                            batch = self.adapter(batch)
                        out_q.put(batch)
                out_q.put(None)
            except BaseException as e:  # surface worker errors
                out_q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
