"""Train state, optimizers, and trainability masks.

Replaces the reference's ``requires_grad_`` surgery + DDP
``find_unused_parameters`` (``train_stage_1.py:346-360``,
``train_stage_2.py:194-206``) with optax ``multi_transform`` masks over a
functional param pytree.

Parity notes:
- Stage 1 trains: denoising UNet (motion off), ReferenceNet except
  ``up_blocks.3`` — plus, to match torch AdamW's skip-if-no-grad behavior,
  the ReferenceNet's ``conv_norm_out``/``conv_out`` (whose activations never
  feed the reference banks, so torch sees ``grad=None`` and never applies
  weight decay to them) — PoseGuider, CameraPoseEncoder.
- Stage 2 trains: motion modules + CameraPoseEncoder only
  (``train_stage_2.py:194-206``).
- AdamW lr 1e-5, betas (0.9, 0.999), wd 1e-2, eps 1e-8; grad-norm clip 1.0
  (``configs/train/stage{1,2}.yaml``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-5
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 1e-2
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_steps: int = 0
    lr_schedule: str = "constant"
    # reference: accelerator.accumulate(net) with
    # cfg.solver.gradient_accumulation_steps (train_stage_1.py:547); here an
    # optax.MultiSteps wrapper accumulates k microbatch grads per update.
    gradient_accumulation_steps: int = 1
    # storage dtype of Adam's first moment (optax mu_dtype); "bfloat16"
    # halves it — stage 1 trains ~1.5B params, whose fp32 mu+nu alone are
    # 12.4 GB, so this is part of the small-pod memory plan (PERF.md)
    mu_dtype: Optional[str] = None


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def stage1_trainable(component: str, path: str) -> bool:
    if component in ("denoising_unet", "pose_guider", "camera_encoder"):
        return True
    if component == "reference_unet":
        frozen_prefixes = ("params/up_3_", "params/conv_norm_out", "params/conv_out")
        return not path.startswith(frozen_prefixes)
    return False


def stage2_trainable(component: str, path: str) -> bool:
    if component == "camera_encoder":
        return True
    if component == "denoising_unet":
        return "_motion_" in path
    return False


def cast_untrainable(params: Params, predicate: Callable[[str, str], bool],
                     dtype=jnp.bfloat16) -> Params:
    """Store stage-frozen leaves in ``dtype`` (bf16) instead of fp32 masters.

    fp32 masters only matter for leaves the optimizer updates; stage-frozen
    components (e.g. the whole ReferenceNet + non-motion video UNet in stage
    2) are pure inference weights, and their fp32 copies are what pushed the
    full-scale stage-2 step past single-chip HBM (18.5 GB needed vs 15.75).
    The compute path casts params to the activation dtype at use either way.
    """
    def cast(component, tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: x if predicate(component, _path_str(path))
            else x.astype(dtype),
            tree,
        )
    return {k: cast(k, v) for k, v in params.items()}


def trainability_mask(params: Params, predicate: Callable[[str, str], bool]):
    """Pytree of 'train'/'freeze' labels mirroring ``params``."""
    def label(component, tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "train" if predicate(component, _path_str(path)) else "freeze",
            tree,
        )
    return {k: label(k, v) for k, v in params.items()}


def make_optimizer(
    params: Params,
    predicate: Callable[[str, str], bool],
    config: OptimizerConfig = OptimizerConfig(),
) -> optax.GradientTransformation:
    if config.lr_schedule == "constant":
        # reference: diffusers get_scheduler("constant") — no warmup
        # (configs/train/stage1.yaml lr_scheduler).
        if config.warmup_steps > 0:
            lr = optax.schedules.warmup_constant_schedule(
                0.0, config.learning_rate, config.warmup_steps
            )
        else:
            lr = config.learning_rate
    else:
        raise ValueError(config.lr_schedule)
    adamw = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            lr, b1=config.beta1, b2=config.beta2, eps=config.eps,
            weight_decay=config.weight_decay, mu_dtype=config.mu_dtype,
        ),
    )
    labels = trainability_mask(params, predicate)
    tx = optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, labels
    )
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    return tx


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # differentiated components only
    frozen: Any          # vae/clip params (never differentiated)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: Params, frozen: Params, tx: optax.GradientTransformation):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            frozen=frozen,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def partition_params(params: Params, predicate: Callable[[str, str], bool]):
    """Split component params into (trainable, static) trees with ``None``
    holes (equinox-style partition). Differentiating only the trainable
    partition prunes the entire backward pass through stage-frozen
    components (e.g. the whole ReferenceNet in stage 2) that pure
    update-masking would still compute and then discard."""
    def split(comp, tree, keep):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: x if predicate(comp, _path_str(path)) == keep else None,
            tree,
        )
    train = {c: split(c, t, True) for c, t in params.items()}
    static = {c: split(c, t, False) for c, t in params.items()}
    return train, static


def combine_params(a: Params, b: Params) -> Params:
    """Inverse of partition_params: fill ``None`` holes of ``a`` from ``b``."""
    return jax.tree.map(
        lambda x, y: y if x is None else x, a, b,
        is_leaf=lambda v: v is None,
    )
