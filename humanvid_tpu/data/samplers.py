"""Orientation-bucketed batch sampling.

Behavioral parity: reference ``OrientationBatchSampler``
(``dance_image_h_v_camera.py:397-452``) — every batch is entirely horizontal
or entirely vertical (one compiled shape per orientation, the reference's
bucketing trick that we keep because it also prevents XLA recompiles), batches
shuffled with ``seed + epoch + rank``.
"""

from __future__ import annotations

import random
from typing import Iterator, List


class OrientationBatchSampler:
    def __init__(
        self,
        num_horizontal: int,
        num_vertical: int,
        batch_size: int,
        seed: int = 0,
        rank: int = 0,
        num_replicas: int = 1,
        drop_last: bool = True,
    ):
        self.num_horizontal = num_horizontal
        self.num_vertical = num_vertical
        self.batch_size = batch_size
        self.seed = seed
        self.rank = rank
        self.num_replicas = num_replicas
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _batches(self) -> List[List[int]]:
        rng = random.Random(self.seed + self.epoch + self.rank)
        h = list(range(self.num_horizontal))
        v = list(range(self.num_horizontal, self.num_horizontal + self.num_vertical))
        rng.shuffle(h)
        rng.shuffle(v)

        def chunk(idxs: List[int]) -> List[List[int]]:
            out = [idxs[i:i + self.batch_size] for i in range(0, len(idxs), self.batch_size)]
            if self.drop_last and out and len(out[-1]) < self.batch_size:
                out.pop()
            return out

        batches = chunk(h) + chunk(v)
        rng.shuffle(batches)
        # shard batches across replicas
        return batches[self.rank::self.num_replicas]

    def __iter__(self) -> Iterator[List[int]]:
        return iter(self._batches())

    def __len__(self) -> int:
        return len(self._batches())
