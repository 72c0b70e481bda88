"""Gradient accumulation (optax.MultiSteps) and activation checkpointing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanvid_tpu.models.unet import UNetConditionModel
from humanvid_tpu.pipelines.system import tiny_config
from humanvid_tpu.train import (
    OptimizerConfig,
    TrainState,
    make_optimizer,
    stage2_trainable,
    trainability_mask,
)


def test_remat_unet_same_outputs_and_grads():
    cfg = tiny_config(motion_max_len=4).denoising_unet
    cfg_remat = dataclasses.replace(cfg, gradient_checkpointing=True)
    rng = jax.random.PRNGKey(0)
    F, h8, w8 = 2, 8, 8
    x = jax.random.normal(rng, (F, h8, w8, 4))
    t = jnp.ones((1,))
    ctx = jax.random.normal(rng, (1, 1, cfg.cross_attention_dim))

    m0 = UNetConditionModel(config=cfg)
    m1 = UNetConditionModel(config=cfg_remat)
    params = m0.init(rng, x, t, ctx, frames=F)

    out0, _ = m0.apply(params, x, t, ctx, frames=F)
    out1, _ = m1.apply(params, x, t, ctx, frames=F)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)

    def loss(m):
        def f(p):
            o, _ = m.apply(p, x, t, ctx, frames=F)
            return (o ** 2).mean()
        return f

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multisteps_accumulation_updates_every_k():
    params = {"denoising_unet": {"params": {"down_0_motion_0": {"w": jnp.ones((4,))}}},
              "camera_encoder": {"params": {"w": jnp.ones((4,))}}}
    tx = make_optimizer(
        params, stage2_trainable,
        OptimizerConfig(learning_rate=1e-2, gradient_accumulation_steps=3),
    )
    state = TrainState.create(params, {}, tx)
    g = jax.tree.map(jnp.ones_like, params)
    s1 = state.apply_gradients(g)
    s2 = s1.apply_gradients(g)
    # no update until k-th microbatch
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s3 = s2.apply_gradients(g)
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s3.params))]
    assert any(moved)
