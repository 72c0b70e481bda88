"""Device mesh + sharding helpers.

The reference's only parallelism is DDP over NCCL via HF accelerate
(``train_stage_1.py:225-232``; SURVEY §2.9). The TPU-native equivalent: a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``window`` axis for
inference window fan-out); the train step is jitted with batch inputs sharded
over ``data`` and parameters replicated, so XLA emits the gradient ``psum``
over ICI — no hand-written collectives, and no DDP unused-parameter hacks
(functional grads make them structural).

Multi-slice scaling later adds a DCN axis the same way; the code here is
axis-name-driven so that's a config change, not a rewrite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D (or reshaped n-D) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        shape = (n_devices,)
    else:
        # fill trailing axes of size 1 unless caller reshapes explicitly
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axis_names))


def make_hierarchical_mesh(
    n_slices: int,
    devices_per_slice: Optional[int] = None,
    axis_names: Sequence[str] = ("replica", "data"),
) -> Mesh:
    """2-D DCN x ICI mesh for multi-slice data parallelism.

    The outer ``replica`` axis spans slices (its gradient all-reduce segment
    rides DCN once per step); the inner ``data`` axis spans one slice's
    chips (ICI). ``jax.devices()`` orders devices slice-major on real
    multi-slice systems, so the row-major reshape maps rows to slices; on
    the virtual CPU mesh any divisible split works. Shard batches over BOTH
    axes with ``shard_batch(mesh, ("replica", "data"))``; keep ZeRO-1
    optimizer sharding on ``data`` only so its update all-gather stays on
    ICI (``zero1_opt_sharding`` default).
    """
    devices = jax.devices()
    if devices_per_slice is None:
        if len(devices) % n_slices:
            raise ValueError(
                f"{len(devices)} devices do not split into {n_slices} slices")
        devices_per_slice = len(devices) // n_slices
    n = n_slices * devices_per_slice
    grid = np.asarray(devices[:n]).reshape(n_slices, devices_per_slice)
    return Mesh(grid, axis_names=tuple(axis_names))


def shard_batch(mesh: Mesh, axis="data") -> NamedSharding:
    """Sharding for batch-leading arrays: first axis split over ``axis``
    (a name, or a tuple of names to split over their product — e.g.
    ``("replica", "data")`` on a hierarchical mesh)."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(tree, mesh: Mesh, axis: str = "data"):
    """Device-put every leaf with its first axis sharded over ``axis``."""
    sh = shard_batch(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def zero1_opt_sharding(opt_state, mesh: Mesh, axis: str = "data",
                       min_size: int = 4096):
    """ZeRO-1-style sharding pytree for optimizer state.

    Adam moments double the trainable-parameter memory; replicating them on
    every chip (pure DP) is what overflows a single-host-memory-sized model.
    Each moment leaf whose LAST axis (channels in this codebase's NHWC /
    io-feature layouts) divides the mesh axis is sharded over it; small or
    indivisible leaves stay replicated. XLA inserts the all-gather of the
    parameter updates (the classic ZeRO-1 collective) automatically.
    """
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def leaf(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[-1] % n == 0 and np.prod(shape) >= min_size:
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
        return repl

    return jax.tree.map(leaf, opt_state)
