import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanvid_tpu.pipelines.system import CamAnimate, tiny_config
from humanvid_tpu.train import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
    stage1_trainable,
    stage2_trainable,
    trainability_mask,
)


@pytest.fixture(scope="module")
def setup():
    system = CamAnimate(tiny_config(motion_max_len=4))
    H = W = 32
    F = 2
    params = system.init_params(jax.random.PRNGKey(0), H, W, frames=F)
    frozen = {k: params[k] for k in ("vae_encoder", "vae_decoder", "clip")}
    trainable = {k: params[k] for k in
                 ("reference_unet", "denoising_unet", "pose_guider", "camera_encoder")}
    rng = np.random.default_rng(0)
    sz = system.config.clip.image_size
    b = 2
    batch = {
        "tgt": jnp.asarray(rng.normal(size=(b, F, H, W, 3)) * 0.1, jnp.float32),
        "ref": jnp.asarray(rng.normal(size=(b, H, W, 3)) * 0.1, jnp.float32),
        "clip": jnp.asarray(rng.normal(size=(b, sz, sz, 3)) * 0.1, jnp.float32),
        "pose": jnp.asarray(rng.random(size=(b, F, H, W, 3)), jnp.float32),
        "plucker": jnp.asarray(rng.normal(size=(b, F, H, W, 6)), jnp.float32),
    }
    return system, trainable, frozen, batch


def test_stage2_mask_only_motion_and_camera(setup):
    _, trainable, _, _ = setup
    labels = trainability_mask(trainable, stage2_trainable)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    train_paths = ["/".join(str(k) for k in p) for p, v in flat if v == "train"]
    assert all(("camera_encoder" in p) or ("_motion_" in p) for p in train_paths)
    assert any("_motion_" in p for p in train_paths)
    assert any("camera_encoder" in p for p in train_paths)
    # pose guider / reference unet fully frozen in stage 2
    assert not any(p.startswith("['pose_guider']") and v == "train" for p, v in
                   [("/".join(str(k) for k in pp), vv) for pp, vv in flat])


def test_stage1_mask_freezes_ref_up3_and_tail(setup):
    _, trainable, _, _ = setup
    labels = trainability_mask(trainable, stage1_trainable)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    for p, v in flat:
        path = "/".join(str(k) for k in p)
        if "reference_unet" in path and ("conv_out" in path or "conv_norm_out" in path):
            assert v == "freeze", path
        if "pose_guider" in path:
            assert v == "train", path


def test_train_step_updates_only_trainable(setup):
    system, trainable, frozen, batch = setup
    tx = make_optimizer(trainable, stage2_trainable)
    state = TrainState.create(trainable, frozen, tx)
    sched = system.make_schedule()
    step = make_train_step(system, sched, TrainConfig(uncond_ratio=0.0))

    new_state, aux = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert int(new_state.step) == 1

    # motion params moved, spatial unet params did not
    old_flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    new_flat = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    moved, unmoved = [], []
    for (p, ov), (_, nv) in zip(old_flat, new_flat):
        path = "/".join(str(k) for k in p)
        changed = not np.allclose(np.asarray(ov), np.asarray(nv))
        if "_motion_" in path or "camera_encoder" in path:
            moved.append(changed)
        elif "reference_unet" in path or "pose_guider" in path:
            unmoved.append(changed)
    # proj_out zero-init layers may have zero grads at init for some leaves, so
    # check that *most* motion leaves moved and NO frozen leaf moved
    assert any(moved)
    assert not any(unmoved)


def test_loss_decreases_over_steps(setup):
    system, trainable, frozen, batch = setup
    tx = make_optimizer(
        trainable, stage2_trainable,
    )
    state = TrainState.create(trainable, frozen, tx)
    sched = system.make_schedule()
    step = jax.jit(make_train_step(system, sched, TrainConfig(uncond_ratio=0.0, noise_offset=0.0)))
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(3):
        state, aux = step(state, batch, rng)
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(l) for l in losses)


def test_cast_untrainable_keeps_trainable_fp32():
    import jax.numpy as jnp
    import numpy as np

    from humanvid_tpu.train import cast_untrainable, stage2_trainable

    params = {
        "camera_encoder": {"params": {"w": np.ones((2,), np.float32)}},
        "reference_unet": {"params": {"w": np.ones((2,), np.float32)}},
        "denoising_unet": {"params": {
            "down_0_motion_0": {"w": np.ones((2,), np.float32)},
            "down_0_resnets_0": {"w": np.ones((2,), np.float32)},
        }},
        "pose_guider": {"params": {"w": np.ones((2,), np.float32)}},
    }
    out = cast_untrainable(params, stage2_trainable)
    assert out["camera_encoder"]["params"]["w"].dtype == jnp.float32
    assert out["reference_unet"]["params"]["w"].dtype == jnp.bfloat16
    assert out["denoising_unet"]["params"]["down_0_motion_0"]["w"].dtype == jnp.float32
    assert out["denoising_unet"]["params"]["down_0_resnets_0"]["w"].dtype == jnp.bfloat16
    assert out["pose_guider"]["params"]["w"].dtype == jnp.bfloat16


def test_adam_mu_dtype_bf16():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humanvid_tpu.train import OptimizerConfig, make_optimizer

    params = {"camera_encoder": {"params": {"w": np.ones((8,), np.float32)}}}
    tx = make_optimizer(params, lambda c, p: True,
                        OptimizerConfig(mu_dtype="bfloat16"))
    st = tx.init(params)
    mus = [x for x in jax.tree_util.tree_leaves(st)
           if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment found in optimizer state"


def test_vae_encode_chunking_matches_unchunked(setup):
    """TrainConfig.vae_encode_chunk scans the frozen VAE encode over frame
    chunks (the stage-2 memory fix — tools/stage2_memcheck.py); the loss must
    match the single-call encode. b*f = 4 here, chunk 2 -> 2 lax.map steps."""
    from humanvid_tpu.train.step import make_loss_fn

    system, trainable, frozen, batch = setup
    sched = system.make_schedule(beta_schedule="scaled_linear")
    rng = jax.random.PRNGKey(7)
    base = make_loss_fn(system, sched,
                        TrainConfig(uncond_ratio=0.0, vae_encode_chunk=0))
    chunked = make_loss_fn(system, sched,
                           TrainConfig(uncond_ratio=0.0, vae_encode_chunk=2))
    l0, _ = base(trainable, frozen, batch, rng)
    l1, _ = chunked(trainable, frozen, batch, rng)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-5, atol=1e-6)
    # non-dividing chunk degrades to the largest divisor (3 -> 2 here),
    # never to the memory-heavy full-batch encode
    odd = make_loss_fn(system, sched,
                       TrainConfig(uncond_ratio=0.0, vae_encode_chunk=3))
    l2, _ = odd(trainable, frozen, batch, rng)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=0, atol=0)
