import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanvid_tpu.models import (
    SD15_UNET,
    CameraEncoderConfig,
    CameraPoseEncoder,
    PoseGuider,
    UNetConditionModel,
    UNetConfig,
)

# 2-level topology, same block structure as SD1.5 but small & shallow so CPU
# tests stay fast. 4 ref features: down(1) + mid(1) + up(2).
TINY = UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    down_block_types=("CrossAttnDownBlock", "DownBlock"),
    up_block_types=("UpBlock", "CrossAttnUpBlock"),
    attention_heads=4,
    cross_attention_dim=48,
    norm_num_groups=8,
)
import dataclasses

TINY_VIDEO = dataclasses.replace(
    TINY, use_motion_module=True, motion_num_heads=4, motion_max_len=8
)


def test_num_ref_features():
    assert UNetConditionModel(config=SD15_UNET).num_ref_features == 16
    assert UNetConditionModel(config=TINY).num_ref_features == 4


def _ref_feats(b, h, w, ctx, key=0):
    writer = UNetConditionModel(config=TINY)
    wl = jax.random.normal(jax.random.PRNGKey(key), (b, h // 8, w // 8, 4))
    wparams = writer.init(
        jax.random.PRNGKey(key + 1), wl, jnp.zeros((b,)), ctx, collect_ref_features=True
    )
    _, feats = writer.apply(wparams, wl, jnp.zeros((b,)), ctx, collect_ref_features=True)
    return feats


def test_reference_net_collects_and_video_unet_consumes():
    b, h, w = 2, 64, 64
    ctx = jnp.ones((b, 1, 48)) * 0.2
    feats = _ref_feats(b, h, w, ctx)
    assert len(feats) == 4
    assert feats[0].shape == (b, (h // 8) * (w // 8), 32)   # down bank, full latent res
    assert feats[1].shape == (b, (h // 16) * (w // 16), 64)  # mid bank

    video_net = UNetConditionModel(config=TINY_VIDEO)
    frames = 2
    latents = jnp.ones((b * frames, h // 8, w // 8, 4)) * 0.1
    t = jnp.array([500.0, 500.0])
    params = video_net.init(
        jax.random.PRNGKey(1), latents, t, ctx, ref_features=feats, frames=frames
    )
    out, _ = video_net.apply(params, latents, t, ctx, ref_features=feats, frames=frames)
    assert out.shape == (b * frames, h // 8, w // 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_video_unet_ref_disable_changes_output():
    """CFG semantics: ref-disabled rows differ from ref-enabled rows."""
    b, h, w, frames = 2, 64, 64, 2
    net = UNetConditionModel(config=TINY_VIDEO)
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (b * frames, h // 8, w // 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 1, 48))
    t = jnp.array([10.0, 10.0])
    feats = _ref_feats(b, h, w, ctx, key=2)

    params = net.init(jax.random.PRNGKey(4), latents, t, ctx, ref_features=feats, frames=frames)
    out_disabled, _ = net.apply(
        params, latents, t, ctx, ref_features=feats,
        ref_disable=jnp.ones((b,), bool), frames=frames,
    )
    out_enabled, _ = net.apply(
        params, latents, t, ctx, ref_features=feats,
        ref_disable=jnp.zeros((b,), bool), frames=frames,
    )
    assert not np.allclose(np.asarray(out_disabled), np.asarray(out_enabled), atol=1e-5)
    assert np.isfinite(np.asarray(out_disabled)).all()


def test_pose_guider_shapes_and_zero_init():
    pg = PoseGuider()
    x = jnp.ones((2, 64, 64, 3))
    params = pg.init(jax.random.PRNGKey(0), x)
    out = pg.apply(params, x)
    assert out.shape == (2, 8, 8, 320)
    # conv_out is zero-init => output is exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_camera_encoder_shapes_and_zero_init():
    enc = CameraPoseEncoder(config=CameraEncoderConfig(position_encoding_max_len=16))
    frames = 4
    plucker = jnp.ones((1 * frames, 64, 64, 6))
    params = enc.init(jax.random.PRNGKey(0), plucker, frames)
    out = enc.apply(params, plucker, frames)
    assert out.shape == (frames, 8, 8, 320)
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero conv at init


def test_unet_jit_compiles():
    net = UNetConditionModel(config=TINY)
    x = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 1, 48))
    t = jnp.zeros((1,))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)

    @jax.jit
    def fwd(p, x, t, c):
        return net.apply(p, x, t, c)[0]

    out = fwd(params, x, t, ctx)
    assert out.shape == (1, 8, 8, 4)
