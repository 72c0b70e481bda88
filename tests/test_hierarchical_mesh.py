"""Multi-slice (DCN x ICI) hierarchical-mesh data parallelism.

`make_hierarchical_mesh` reshapes the device list into (slices,
chips-per-slice); batches shard over BOTH axes and the gradient psum
decomposes into an intra-slice (ICI) and inter-slice (DCN) segment by XLA.
Verified on the 8-device virtual CPU mesh: the 2x4 hierarchical run is
numerically identical to the flat 8-way run, and ZeRO-1 optimizer sharding
composes on the inner axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from humanvid_tpu.parallel.mesh import (
    make_hierarchical_mesh,
    make_mesh,
    zero1_opt_sharding,
)
from humanvid_tpu.pipelines.system import CamAnimate, tiny_config
from humanvid_tpu.train import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
    stage2_trainable,
)


@pytest.fixture(scope="module")
def setup():
    system = CamAnimate(tiny_config(motion_max_len=4))
    H = W = 32
    F = 2
    params = system.init_params(jax.random.PRNGKey(0), H, W, frames=F)
    frozen = {k: params[k] for k in ("vae_encoder", "vae_decoder", "clip")}
    trainable = {k: params[k] for k in
                 ("reference_unet", "denoising_unet", "pose_guider",
                  "camera_encoder")}
    rng = np.random.default_rng(0)
    sz = system.config.clip.image_size
    b = 8  # one sample per device
    batch = {
        "tgt": jnp.asarray(rng.normal(size=(b, F, H, W, 3)) * 0.1, jnp.float32),
        "ref": jnp.asarray(rng.normal(size=(b, H, W, 3)) * 0.1, jnp.float32),
        "clip": jnp.asarray(rng.normal(size=(b, sz, sz, 3)) * 0.1, jnp.float32),
        "pose": jnp.asarray(rng.random(size=(b, F, H, W, 3)), jnp.float32),
        "plucker": jnp.asarray(rng.normal(size=(b, F, H, W, 6)), jnp.float32),
    }
    return system, trainable, frozen, batch


def _run_step(system, trainable, frozen, batch, mesh, batch_spec,
              zero1=False):
    tx = make_optimizer(trainable, stage2_trainable)
    state = TrainState.create(trainable, frozen, tx)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, batch_spec)
    if zero1:
        opt_sh = zero1_opt_sharding(state.opt_state, mesh)
        state_sh = state.replace(
            step=repl,
            params=jax.tree.map(lambda _: repl, state.params),
            frozen=jax.tree.map(lambda _: repl, state.frozen),
            opt_state=opt_sh,
        )
    else:
        state_sh = jax.tree.map(lambda _: repl, state)
    sched = system.make_schedule()
    step = jax.jit(
        make_train_step(system, sched,
                        TrainConfig(uncond_ratio=0.0, noise_offset=0.0)),
        in_shardings=(state_sh, shard, repl),
        out_shardings=(state_sh, repl),
    )
    batch = {k: jax.device_put(v, shard) for k, v in batch.items()}
    new_state, aux = step(state, batch, jax.random.PRNGKey(7))
    return new_state, float(aux["loss"])


def test_hierarchical_matches_flat(setup):
    system, trainable, frozen, batch = setup
    flat_mesh = make_mesh(8)
    hier_mesh = make_hierarchical_mesh(2, 4)

    flat_state, flat_loss = _run_step(
        system, trainable, frozen, batch, flat_mesh, P("data"))
    hier_state, hier_loss = _run_step(
        system, trainable, frozen, batch, hier_mesh, P(("replica", "data")))

    assert np.isfinite(hier_loss)
    np.testing.assert_allclose(hier_loss, flat_loss, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        flat_state.params, hier_state.params)


def test_hierarchical_zero1(setup):
    system, trainable, frozen, batch = setup
    hier_mesh = make_hierarchical_mesh(2, 4)
    state, loss = _run_step(
        system, trainable, frozen, batch, hier_mesh, P(("replica", "data")),
        zero1=True)
    assert np.isfinite(loss)
    # at least one moment leaf actually sharded over the inner data axis
    shardings = jax.tree.leaves(
        jax.tree.map(lambda a: a.sharding.spec, state.opt_state))
    assert any("data" in str(s) for s in shardings)
