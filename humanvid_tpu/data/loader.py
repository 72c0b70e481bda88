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
                from collections import deque

                with ThreadPoolExecutor(self.num_workers) as pool:
                    # sample-level pipelining: keep enough FUTURE batches
                    # submitted that every worker has a sample to decode even
                    # at batch_size 1 (a per-batch pool.map leaves N-1
                    # workers idle for small batches — measured 2.9 s/sample
                    # serial vs the pool-wide parallel rate, loader_bench r4)
                    it = iter(self.batch_sampler)
                    pending: deque = deque()

                    def refill():
                        # submit until every worker has work plus a margin,
                        # bounded in SAMPLES (a decoded stage-2 sample is
                        # ~0.5 GB of host arrays) and in batches
                        while not stop.is_set():
                            inflight = sum(len(fs) for fs in pending)
                            if pending and (
                                    inflight >= self.num_workers
                                    + max(1, self.prefetch)
                                    and len(pending) > self.prefetch):
                                return
                            if len(pending) > self.prefetch + self.num_workers:
                                return
                            batch_idx = next(it, None)
                            if batch_idx is None:
                                return
                            pending.append(
                                [pool.submit(self.dataset.__getitem__, i)
                                 for i in batch_idx])

                    refill()
                    while pending:
                        if stop.is_set():
                            for futs in pending:
                                for f in futs:
                                    f.cancel()
                            return
                        samples = [f.result() for f in pending.popleft()]
                        refill()  # resubmit before collate/put so the pool
                        # stays saturated through the host-side assembly
                        batch = collate(samples)
                        if self.device_put is not None:
                            batch = self.device_put(batch)
                        if not put(batch):
                            for futs in pending:
                                for f in futs:
                                    f.cancel()
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
