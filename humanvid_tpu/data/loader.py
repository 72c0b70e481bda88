"""Prefetching host data loader.

The reference hides decode latency behind torch DataLoader worker processes
(``train_stage_1.py:461-480``). Here a thread pool decodes/augments samples
(cv2 releases the GIL for the heavy work) while a bounded queue keeps N
batches ready; device transfer overlaps the train step via
``jax.device_put`` with a sharding. A C++ decode core can slot in under the
same interface later.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class Loader:
    """Iterate batches of a map-style dataset using a batch sampler."""

    def __init__(
        self,
        dataset,
        batch_sampler: Iterable[List[int]],
        num_workers: int = 4,
        prefetch: int = 2,
        device_put: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.device_put = device_put

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: List[BaseException] = []
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # iterator (break / exception): otherwise the producer thread
            # blocks forever holding prefetch batches (device-resident HBM
            # for stage-2 video batches) and its worker pool
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in self.batch_sampler:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                        batch = collate(samples)
                        if self.device_put is not None:
                            batch = self.device_put(batch)
                        if not put(batch):
                            return
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can observe the stop event fast
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
