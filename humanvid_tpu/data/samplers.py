"""Orientation-bucketed batch sampling.

Behavioral parity: reference ``OrientationBatchSampler``
(``dance_image_h_v_camera.py:397-452``) — every batch is entirely horizontal
or entirely vertical (one compiled shape per orientation, the reference's
bucketing trick that we keep because it also prevents XLA recompiles).

Multi-replica sharding follows the reference's *distributed* variant
(``DistributedOrientationBatchSampler:454-511``): the permutation is seeded
rank-independently (``seed + epoch``) and replicas take disjoint strided
slices of the SAME batch list — per-rank seeds over per-rank slices would
shard unrelated permutations, duplicating some samples and dropping others.
Our single-host drivers shard the global batch over the device mesh instead
(rank=0, num_replicas=1), so this path only matters for multi-host input.
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
        # rank-independent seed: every replica must shuffle identically for
        # the strided shard below to partition (not resample) the batch list
        rng = random.Random(self.seed + self.epoch)
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
        # shard batches across replicas: truncate to a common multiple first
        # so every rank sees the same number of steps (unequal shards would
        # deadlock the collective train step at epoch end)
        even = len(batches) // self.num_replicas * self.num_replicas
        if even == 0:
            # fewer batches than replicas: every rank would silently yield
            # zero batches per epoch and a misconfigured multi-host run would
            # spin forever — fail loudly instead (ADVICE r1).
            raise ValueError(
                f"dataset yields {len(batches)} batches (< num_replicas="
                f"{self.num_replicas}); shrink batch_size or replica count"
            )
        return batches[:even][self.rank::self.num_replicas]

    def __iter__(self) -> Iterator[List[int]]:
        return iter(self._batches())

    def __len__(self) -> int:
        return len(self._batches())
