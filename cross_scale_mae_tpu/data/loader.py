"""Batching loader: shuffling, host sharding, threaded decode, device prefetch.

Replaces ``DistributedSampler`` + ``DataLoader(num_workers=cpu_count)``
(``main_pretrain.py:380-394``):

* **Per-host sharding**: each JAX process takes a strided slice of the epoch
  permutation (seeded per epoch like ``sampler.set_epoch``,
  main_pretrain.py:557).
* **Decode workers**: the native C++ loader (data/native) when built and the
  dataset is JPEG-backed, else a Python thread pool (PIL decode releases the
  GIL).
* **Device prefetch**: batches are transferred ahead of compute
  (double-buffered ``jax.device_put``), replacing the reference's
  synchronous per-step H2D copy (engine_pretrain.py:50).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import numpy as np

from cross_scale_mae_tpu.data.datasets import Dataset


class DataLoader:
    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_threads: int = 4,
        shard_id: int = 0,
        num_shards: int = 1,
        use_native: bool | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._native = None
        if use_native is not False:
            self._native = _try_native(dataset, batch_size, self)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng(self.seed * 100_003 + epoch).permutation(n)
        else:
            order = np.arange(n)
        if self.drop_last:
            # Truncate the GLOBAL permutation to a multiple of
            # num_shards * batch_size before striding so every host sees the
            # same steps_per_epoch — otherwise hosts can execute different
            # numbers of collective steps and the job hangs (the reference's
            # DistributedSampler pads shards to equal length for the same
            # reason).
            usable = (
                len(order) // (self.num_shards * self.batch_size)
            ) * self.num_shards * self.batch_size
            order = order[:usable]
        return order[self.shard_id :: self.num_shards]

    def steps_per_epoch(self) -> int:
        n = len(self._epoch_indices(0))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def max_shard_steps(self) -> int:
        """Largest per-shard batch count this epoch = the number of
        COLLECTIVE steps every host must execute. With drop_last=False the
        strided shards can differ by one sample, which can round up to one
        extra batch on the larger shard — a host that stops early hangs the
        others inside the sharded eval program. Hosts with fewer batches
        must feed fully-padded (all-invalid) batches up to this count."""
        if self.drop_last:
            return self.steps_per_epoch()
        largest = (len(self.dataset) + self.num_shards - 1) // self.num_shards
        return (largest + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int = 0) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yields (imgs uint8 (B, S, S, C), labels int32 (B,))."""
        if self._native is not None:
            yield from self._native.epoch(epoch)
            return
        order = self._epoch_indices(epoch)
        bs = self.batch_size
        c = self.dataset.in_c
        s = self.dataset.canvas_size
        # Temporal datasets deliver frame stacks (T, S, S, C) per sample
        # (datasets.FmowTemporalDataset.sample_shape); everything else the
        # plain (S, S, C) canvas.
        shape = tuple(getattr(self.dataset, "sample_shape", (s, s, c)))

        def load_batch(idx_batch: np.ndarray):
            imgs = np.empty((len(idx_batch),) + shape, np.uint8)
            labels = np.empty((len(idx_batch),), np.int32)
            if self.num_threads > 1 and len(idx_batch) > 1:
                from concurrent.futures import ThreadPoolExecutor

                def one(i_slot):
                    slot, i = i_slot
                    img, lab = self.dataset.load(int(i))
                    imgs[slot] = img.reshape(shape)
                    labels[slot] = lab

                with ThreadPoolExecutor(self.num_threads) as ex:
                    list(ex.map(one, enumerate(idx_batch)))
            else:
                for slot, i in enumerate(idx_batch):
                    img, lab = self.dataset.load(int(i))
                    imgs[slot] = img.reshape(shape)
                    labels[slot] = lab
            return imgs, labels

        # Pipeline: decode batch k+1 while batch k is consumed.
        batches = [order[i : i + bs] for i in range(0, len(order), bs)]
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            for b in batches:
                q.put(load_batch(b))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()


def _try_native(dataset: Dataset, batch_size: int, loader: DataLoader):
    """Bind the C++ decode/prefetch core if built and applicable."""
    try:
        from cross_scale_mae_tpu.data.native import NativeJpegLoader

        return NativeJpegLoader.maybe_create(dataset, batch_size, loader)
    except Exception:
        return None


def host_local_to_global(x: Any, sharding: Any):
    """Form a GLOBAL device array from this process's LOCAL batch shard.

    Single-process: plain ``device_put``. Multi-process: each host's loader
    yields batch/process_count rows (the DistributedSampler replacement), so
    the global array must be assembled with
    ``jax.make_array_from_process_local_data`` — ``device_put(local,
    global_sharding)`` would instead treat the LOCAL rows as the whole
    global array: global batch silently shrinks by process_count and each
    host discards (P-1)/P of what it decoded."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def device_prefetch(
    iterator: Iterator, sharding: Any = None, buffer: int = 2
) -> Iterator:
    """Move (imgs, labels) batches to device ahead of compute."""
    import jax

    def put(item):
        if sharding is None:
            return jax.tree.map(jax.device_put, item)
        return jax.tree.map(lambda x: host_local_to_global(x, sharding), item)

    pending: list = []
    for item in iterator:
        pending.append(put(item))
        if len(pending) >= buffer:
            yield pending.pop(0)
    while pending:
        yield pending.pop(0)
