"""Checkpoint IO: per-module save/rotate/resume, reference-compatible export.

Behavioral parity: reference ``src/utils/util.py:17-44`` — per-module
checkpoints at step suffixes with keep-last-K rotation, and stage 2's
motion-module-only filtering (``train_stage_2.py:421-431``). Improvement over
the reference (SURVEY §5): optimizer state and the RNG/step are saved too, so
resume is exact instead of weights-only.

Formats:
- native: orbax-free msgpack via flax.serialization (single file per module)
- export: reference ``.pth`` layout through ``utils.convert.export_state_dict``
  so our checkpoints load in the PyTorch implementation and vice versa.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

COMPONENTS = ("reference_unet", "denoising_unet", "pose_guider", "camera_encoder")


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    save_dir: str,
    prefix: str,
    tree: Any,
    step: int,
    total_limit: Optional[int] = None,
) -> str:
    """Serialize ``tree`` to ``{save_dir}/{prefix}-{step}.msgpack`` with rotation."""
    os.makedirs(save_dir, exist_ok=True)
    if total_limit is not None:
        pat = re.compile(rf"^{re.escape(prefix)}-(\d+)\.msgpack$")
        existing = sorted(
            (int(m.group(1)), f)
            for f in os.listdir(save_dir)
            if (m := pat.match(f))
        )
        while len(existing) >= total_limit:
            _, f = existing.pop(0)
            os.remove(os.path.join(save_dir, f))
    path = os.path.join(save_dir, f"{prefix}-{step}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_tree_to_numpy(tree)))
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_train_checkpoint(
    save_dir: str,
    params: Dict[str, Any],
    step: int,
    opt_state: Any = None,
    components: List[str] = list(COMPONENTS),
    motion_only: bool = False,
    total_limit: Optional[int] = None,
) -> List[str]:
    """Per-module checkpoints like the reference's four .pth files per step.

    ``motion_only`` mirrors stage 2: the denoising UNet is filtered to motion
    modules (+ camera encoder saved whole).
    """
    paths = []
    for name in components:
        if name not in params:
            continue
        tree = params[name]
        if motion_only and name == "denoising_unet":
            tree = filter_motion_modules(tree)
            paths.append(save_checkpoint(save_dir, "motion_module", tree, step, total_limit))
            continue
        if motion_only and name in ("reference_unet", "pose_guider"):
            continue  # stage 2 saves only motion modules + camera encoder
        paths.append(save_checkpoint(save_dir, name, tree, step, total_limit))
    if opt_state is not None:
        paths.append(save_checkpoint(save_dir, "opt_state", opt_state, step, total_limit))
    return paths


def filter_motion_modules(unet_params: Any) -> Dict[str, Any]:
    """Subtree of the video UNet containing only motion-module parameters."""
    def prune(tree):
        out = {}
        for k, v in tree.items():
            if "_motion_" in k:
                out[k] = v
            elif isinstance(v, dict):
                sub = prune(v)
                if sub:
                    out[k] = sub
        return out
    return prune(unet_params)


def merge_motion_modules(unet_params: Any, motion_tree: Any) -> Any:
    """Merge a motion-only checkpoint back into full video-UNet params."""
    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            out[k] = merge(dst[k], v) if isinstance(v, dict) and k in dst else v
        return out
    return merge(unet_params, motion_tree)


def export_reference_pth(params: Dict[str, Any], out_dir: str, step: int) -> List[str]:
    """Write reference-layout .pth files (requires torch)."""
    import torch

    from ..utils.convert import export_state_dict

    os.makedirs(out_dir, exist_ok=True)
    kinds = {
        "reference_unet": "unet",
        "denoising_unet": "unet",
        "pose_guider": "pose_guider",
        "camera_encoder": "camera_encoder",
    }
    paths = []
    for name, kind in kinds.items():
        if name not in params:
            continue
        sd = export_state_dict(params[name], kind)
        path = os.path.join(out_dir, f"{name if name != 'camera_encoder' else 'camera_pose_encoder'}-{step}.pth")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
        paths.append(path)
    return paths


class OrbaxCheckpointer:
    """Async, sharding-preserving train-state checkpointing (production path).

    The msgpack path above gathers the full state to one host
    (``jax.device_get``) and writes a single file — fine on one chip,
    unusable for multi-host ZeRO-sharded optimizer states. Orbax writes each
    array shard from its owning process and restores onto the target
    shardings, with async saves overlapping training and keep-K rotation
    handled by the manager. Select with ``solver.checkpoint_backend: orbax``
    in the train configs (default stays the reference-compatible msgpack +
    ``.pth`` export).
    """

    def __init__(self, save_dir: str, keep: Optional[int] = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(save_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=True),
        )

    def save(self, step: int, state_tree: Any) -> None:
        """Async save; returns immediately (the manager serializes in a
        background thread while the next train steps run)."""
        self._mgr.save(step, args=self._ocp.args.StandardSave(state_tree))

    def restore(self, step: Optional[int], abstract_tree: Any) -> Any:
        """Restore ``step`` (or the latest) onto ``abstract_tree``'s
        structure/shardings (``jax.eval_shape``-style leaves allowed)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no orbax checkpoint found")
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(abstract_tree))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
