"""Host → device batching with background-thread prefetch.

Replaces the reference's torch DataLoader workers (``data/datamodule.py``)
with a threaded prefetcher: the host assembles numpy batches ahead of the
training loop while the TPU computes, and batches are placed on device
(optionally with a sharding) before the step needs them.  Threads, not
processes — decode is numpy-releasing-the-GIL work and this box has one core.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

try:  # device placement is optional: tests iterate numpy batches directly
    import jax
except ImportError:  # pragma: no cover
    jax = None


def collate(samples: list[tuple]) -> dict:
    """Stack dataset samples into a training batch dict."""
    xs, ys, forcings, consts = zip(*samples)
    return {
        "input": np.stack(xs),
        "target": np.stack(ys),
        "forcings": np.stack(forcings),
        "constants": np.stack(consts),
    }


def collate_prediction(samples: list[tuple]) -> dict:
    idxs, xs, forcings, consts = zip(*samples)
    return {
        "index": np.asarray(idxs, np.int64),
        "input": np.stack(xs),
        "forcings": np.stack(forcings),
        "constants": np.stack(consts),
    }


class BatchLoader:
    """Iterable over shuffled, prefetched batches of an ERA5Dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2,
                 sharding=None, device_put: bool = True, mesh=None):
        self.dataset = dataset
        self.batch_size = batch_size  # GLOBAL batch size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.sharding = sharding
        self.device_put = device_put and jax is not None
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        self._collate = (
            collate_prediction if getattr(dataset, "prediction_stage", False) else collate
        )
        # multi-host DP: every process iterates the same seeded global order
        # but loads only its slice of each batch; global arrays are assembled
        # from the process-local shards (reference multi-node DDP semantics)
        self.mesh = mesh
        self._local_slice = None
        if mesh is not None and jax is not None and jax.process_count() > 1:
            from paradis_tpu import distributed

            self._local_slice = distributed.local_batch_slice(mesh, batch_size)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        return order

    def _place(self, batch: dict) -> dict:
        """Host batch → device arrays (global assembly on multi-host)."""
        if self._local_slice is not None:
            from paradis_tpu import distributed

            return distributed.make_global_batch(batch, self.mesh,
                                                 self.batch_size)
        if not self.device_put:
            return batch
        put = {}
        for k, v in batch.items():
            if k == "index":
                put[k] = v
            elif isinstance(self.sharding, dict):
                put[k] = jax.device_put(v, self.sharding[k]) \
                    if k in self.sharding else jax.device_put(v)
            elif self.sharding is not None:
                put[k] = jax.device_put(v, self.sharding)
            else:
                put[k] = jax.device_put(v)
        return put

    def __iter__(self) -> Iterator[dict]:
        """Two-stage prefetch pipeline: assemble → place-on-device.

        Sample assembly (zarr decode + normalization + forcings, ~19 ms at
        5.625°) and the host→device transfer (a blocking RPC of ~33 ms
        through the axon tunnel; sub-ms DMA on a real TPU host) run in
        SEPARATE threads so their latencies overlap each other and the
        device step — a single worker serializing the two stages capped the
        live training loop at ~1/(assemble+put) samples/s (measured ~15/s
        vs the 26/s device rate at 5.625°).
        """
        order = self._epoch_order()
        self._epoch += 1
        n_batches = len(self)
        q_host: queue.Queue = queue.Queue(maxsize=self.prefetch)
        q_dev: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def assemble_worker():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                    if self._local_slice is not None:
                        idxs = idxs[self._local_slice]
                    q_host.put(self._collate(
                        [self.dataset[int(i)] for i in idxs]))
                q_host.put(None)
            except Exception as e:  # surface worker errors in the consumer
                q_host.put(e)

        def place_worker():
            try:
                while not stop.is_set():
                    item = q_host.get()
                    if item is None or isinstance(item, Exception):
                        q_dev.put(item)
                        return
                    q_dev.put(self._place(item))
            except Exception as e:
                q_dev.put(e)

        threading.Thread(target=assemble_worker, daemon=True).start()
        threading.Thread(target=place_worker, daemon=True).start()
        try:
            while True:
                item = q_dev.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
