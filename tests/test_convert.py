"""Checkpoint converter tests: export our tree to torch layout, re-import, compare."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanvid_tpu.models import (
    CameraEncoderConfig,
    CameraPoseEncoder,
    PoseGuider,
    PoseGuiderConfig,
    UNetConditionModel,
    UNetConfig,
)
from humanvid_tpu.models.clip_vision import CLIPVisionEncoder
from humanvid_tpu.models.configs import CLIPVisionConfig, VAEConfig
from humanvid_tpu.models.vae import VAEDecoder, VAEEncoder
from humanvid_tpu.utils.convert import convert_state_dict, export_state_dict

TINY = UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    down_block_types=("CrossAttnDownBlock", "DownBlock"),
    up_block_types=("UpBlock", "CrossAttnUpBlock"),
    attention_heads=4,
    cross_attention_dim=32,
    norm_num_groups=8,
)


def _roundtrip(params, kind):
    sd = export_state_dict(params, kind)
    # all torch-side arrays must have torch-conv/linear layouts (sanity: no flax names)
    assert all("/" not in k for k in sd)
    new, missing, unused = convert_state_dict(params, sd, kind)
    assert not missing and not unused, (missing[:5], unused[:5])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(new)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
    return sd


def test_unet_roundtrip_2d():
    net = UNetConditionModel(config=TINY)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                      jnp.zeros((1,)), jnp.zeros((1, 1, 32)))
    sd = _roundtrip(params, "unet")
    assert any(k.startswith("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q") for k in sd)
    assert "conv_in.weight" in sd and "time_embedding.linear_1.weight" in sd
    assert any(k.startswith("mid_block.resnets.1") for k in sd)


def test_unet_roundtrip_video_motion():
    cfg = dataclasses.replace(TINY, use_motion_module=True, motion_num_heads=4, motion_max_len=4)
    net = UNetConditionModel(config=cfg)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 4)),
                      jnp.zeros((1,)), jnp.zeros((1, 1, 32)), frames=2)
    sd = _roundtrip(params, "unet")
    mm = [k for k in sd if ".motion_modules." in k]
    assert any("temporal_transformer.proj_out.weight" in k for k in mm)
    assert any("attention_blocks.1.to_v.weight" in k for k in mm)


def test_pose_guider_roundtrip():
    pg = PoseGuider(config=PoseGuiderConfig(32, 3, (4, 8, 12, 16)))
    params = pg.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = _roundtrip(params, "pose_guider")
    assert "conv_in.weight" in sd and "blocks.5.weight" in sd and "conv_out.bias" in sd


def test_camera_encoder_roundtrip():
    enc = CameraPoseEncoder(config=CameraEncoderConfig(
        channels=(32,), nums_rb=2, num_heads=4, position_encoding_max_len=4))
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 6)), 2)
    sd = _roundtrip(params, "camera_encoder")
    assert "encoder_conv_in.weight" in sd
    assert any(k.startswith("encoder_down_conv_blocks.0.1.block2") for k in sd)
    assert any(k.startswith("encoder_down_attention_blocks.0.0.ff.net.0.proj") for k in sd)
    assert "zero_conv_layers.0.weight" in sd


def test_vae_roundtrip():
    cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), norm_num_groups=4)
    enc = VAEEncoder(config=cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = _roundtrip(params, "vae_encoder")
    assert "encoder.conv_in.weight" in sd and "quant_conv.weight" in sd
    assert any(k.startswith("encoder.mid_block.attentions.0.to_q") for k in sd)

    dec = VAEDecoder(config=cfg)
    dparams = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    sd = _roundtrip(dparams, "vae_decoder")
    assert "post_quant_conv.weight" in sd
    assert any(k.startswith("decoder.up_blocks.0.upsamplers.0.conv") for k in sd)


def test_clip_roundtrip():
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=16,
                           num_layers=2, num_heads=2, intermediate_size=32,
                           projection_dim=8)
    clip = CLIPVisionEncoder(config=cfg)
    params = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
    sd = _roundtrip(params, "clip")
    assert "vision_model.embeddings.class_embedding" in sd
    assert "vision_model.encoder.layers.1.self_attn.q_proj.weight" in sd
    assert "visual_projection.weight" in sd
