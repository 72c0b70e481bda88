"""Activation-level golden parity vs the reference's OWN vendored torch code.

VERDICT r1 "what's missing" #1: no UNet / motion-module / pose-guider /
camera-encoder activation had ever been compared against the reference's.
diffusers is not installed here, but the reference vendors all of its model
wiring (`/root/reference/src/models/*`, `src/cameractrl/*`) and only imports
leaf primitives from diffusers — so ``tests/diffusers_stub.py`` provides those
leaves and the reference's own 5.7k LoC of block topology, bank plumbing
(mutual_self_attention.py:19-363), motion modules (motion_module.py:185-387)
and camera encoder (pose_adaptor.py:160-248) run unmodified under the
installed CPU torch.

Every test: build the torch model at a tiny operating point, perturb ALL
parameters (zero-init convs would otherwise hide errors), export the torch
state_dict through ``convert_state_dict`` into our pytree, run both on the
same inputs, compare activations in fp32.
"""

import dataclasses
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import diffusers_stub  # noqa: E402

diffusers_stub.install_stub()

from humanvid_tpu.models import (  # noqa: E402
    CameraEncoderConfig,
    CameraPoseEncoder,
    PoseGuider,
    PoseGuiderConfig,
    UNetConditionModel,
    UNetConfig,
)
from humanvid_tpu.utils.convert import convert_state_dict  # noqa: E402

TINY = UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    down_block_types=("CrossAttnDownBlock", "DownBlock"),
    up_block_types=("UpBlock", "CrossAttnUpBlock"),
    attention_heads=4,
    cross_attention_dim=32,
    norm_num_groups=8,
)
TINY_VIDEO = dataclasses.replace(
    TINY, use_motion_module=True, motion_num_heads=4, motion_max_len=8
)

_TORCH_2D_KW = dict(
    block_out_channels=(32, 64), layers_per_block=1,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    cross_attention_dim=32, attention_head_dim=4, norm_num_groups=8,
)
# mirrors configs/inference/inference_v2.yaml unet_additional_kwargs at the
# tiny point (4 heads, max_len 8)
_TORCH_3D_KW = dict(
    block_out_channels=(32, 64), layers_per_block=1,
    down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
    up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
    cross_attention_dim=32, attention_head_dim=4, norm_num_groups=8,
    use_inflated_groupnorm=True, unet_use_cross_frame_attention=False,
    unet_use_temporal_attention=False, use_motion_module=True,
    motion_module_resolutions=(1, 2, 4, 8), motion_module_mid_block=True,
    motion_module_decoder_only=False, motion_module_type="Vanilla",
    motion_module_kwargs=dict(
        num_attention_heads=4, num_transformer_block=1,
        attention_block_types=("Temporal_Self", "Temporal_Self"),
        temporal_position_encoding=True,
        temporal_position_encoding_max_len=8,
        temporal_attention_dim_div=1,
    ),
)


def _randomize(model, seed, scale=0.05):
    """Perturb every torch parameter so zero-init layers carry signal."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * scale)
    model.eval()
    return model


def _nchw(a):  # ((b f), h, w, c) jax-layout numpy -> torch (b?, c, ?h, w)
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())


def _to_bcfhw(a, frames):  # ((b f), h, w, c) -> (b, c, f, h, w)
    bf, h, w, c = a.shape
    a = a.reshape(bf // frames, frames, h, w, c)
    return torch.from_numpy(np.transpose(a, (0, 4, 1, 2, 3)).copy())


def _from_bcfhw(t):  # (b, c, f, h, w) -> ((b f), h, w, c)
    a = np.asarray(t.detach())
    b, c, f, h, w = a.shape
    return np.transpose(a, (0, 2, 3, 4, 1)).reshape(b * f, h, w, c)


def _convert(flax_params, torch_model, kind, allow_missing=(), allow_unused=()):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params, missing, unused = convert_state_dict(
        flax_params, sd, kind, strict=False)
    bad_missing = [m for m in missing
                   if not any(m.startswith(p) for p in allow_missing)]
    bad_unused = [u for u in unused
                  if not any(s in u for s in allow_unused)]
    assert not bad_missing, f"missing torch keys: {bad_missing[:8]}"
    assert not bad_unused, f"unconsumed torch keys: {bad_unused[:8]}"
    return params


def test_golden_pose_guider():
    """Our PoseGuider vs reference src/models/pose_guider.py:16-61."""
    from src.models.pose_guider import PoseGuider as TorchPoseGuider

    tm = _randomize(TorchPoseGuider(32, block_out_channels=(4, 8, 12, 16)), 0)
    ours = PoseGuider(config=PoseGuiderConfig(
        conditioning_embedding_channels=32, block_out_channels=(4, 8, 12, 16)))

    frames, H, W = 2, 32, 32
    x = np.random.default_rng(1).normal(size=(frames, H, W, 3)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _convert(params, tm, "pose_guider")

    with torch.no_grad():
        theirs = _from_bcfhw(tm(_to_bcfhw(x, frames)))
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    assert np.abs(theirs).max() > 0.01  # perturbed zero-conv carries signal
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


def test_golden_camera_encoder():
    """Our CameraPoseEncoder vs reference src/cameractrl/pose_adaptor.py:160-248
    (+ its TemporalTransformerBlock, src/cameractrl/motion_module.py:236-300)."""
    from src.cameractrl.pose_adaptor import CameraPoseEncoder as TorchEnc

    tm = _randomize(TorchEnc(
        downscale_factor=8, channels=[32], nums_rb=1, cin=384, ksize=1,
        sk=True, use_conv=False, compression_factor=1,
        temporal_attention_nhead=4, attention_block_types=("Temporal_Self",),
        temporal_position_encoding=True,
        temporal_position_encoding_max_len=8), 1)
    ours = CameraPoseEncoder(config=CameraEncoderConfig(
        channels=(32,), nums_rb=1, num_heads=4, position_encoding_max_len=8))

    frames, H, W = 4, 32, 32
    x = np.random.default_rng(2).normal(size=(frames, H, W, 6)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), frames)
    # 'pe' buffers: torch materializes the sinusoidal table; we compute it
    params = _convert(params, tm, "camera_encoder", allow_unused=(".pe",))

    with torch.no_grad():
        # the reference keeps (b f) flattened: features[0] is ((b f), c, h, w)
        theirs = np.transpose(np.asarray(tm(_to_bcfhw(x, frames))[0]), (0, 2, 3, 1))
    got = np.asarray(ours.apply(params, jnp.asarray(x), frames))
    assert np.abs(theirs).max() > 0.01
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


def _torch_reference_unet():
    from src.models.unet_2d_condition import UNet2DConditionModel

    return _randomize(UNet2DConditionModel(**_TORCH_2D_KW), 2)


def _sorted_banks(unet):
    """Reference pairing: DFS order, sorted by norm1 width desc
    (mutual_self_attention.py:284-286,331-336)."""
    from src.models.attention import BasicTransformerBlock, TemporalBasicTransformerBlock
    from src.models.mutual_self_attention import torch_dfs

    mods = [m for m in torch_dfs(unet)
            if isinstance(m, (BasicTransformerBlock, TemporalBasicTransformerBlock))]
    return [m.bank for m in
            sorted(mods, key=lambda m: -m.norm1.normalized_shape[0])]


def test_golden_reference_net_features():
    """ReferenceNet bank features vs reference unet_2d_condition.py +
    mutual_self_attention.py write mode.

    The reference deletes the ReferenceNet's conv_norm_out/conv_out
    (unet_2d_condition.py:643-652) because only the bank features are
    consumed; our module keeps them (converted weights are simply unused for
    this comparison).
    """
    from src.models.mutual_self_attention import ReferenceAttentionControl

    tm = _torch_reference_unet()
    ReferenceAttentionControl(
        tm, do_classifier_free_guidance=False, mode="write",
        fusion_blocks="full", batch_size=1)

    ours = UNetConditionModel(config=TINY)
    b, h8 = 1, 16
    lat = np.random.default_rng(3).normal(size=(b, h8, h8, 4)).astype(np.float32)
    ctx = np.random.default_rng(4).normal(size=(b, 1, 32)).astype(np.float32)
    t0 = np.zeros((b,), np.float32)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(lat), jnp.asarray(t0),
                       jnp.asarray(ctx), collect_ref_features=True)
    params = _convert(params, tm, "unet",
                      allow_missing=("conv_norm_out.", "conv_out."))

    with torch.no_grad():
        tm(_nchw(lat), torch.from_numpy(t0), encoder_hidden_states=torch.from_numpy(ctx))
    banks = _sorted_banks(tm)  # [mid(64), down(32), up_a(32), up_b(32)]
    assert all(len(bk) == 1 for bk in banks)

    _, feats = ours.apply(params, jnp.asarray(lat), jnp.asarray(t0),
                          jnp.asarray(ctx), collect_ref_features=True)
    # ours is structural order [down, mid, up_a, up_b]
    pairing = [(feats[0], banks[1]), (feats[1], banks[0]),
               (feats[2], banks[2]), (feats[3], banks[3])]
    for got, (bank,) in pairing:
        np.testing.assert_allclose(
            np.asarray(got), bank.numpy(), rtol=2e-4, atol=2e-4)


def _torch_denoising_unet():
    from src.models.unet_3d import UNet3DConditionModel

    return _randomize(UNet3DConditionModel(**_TORCH_3D_KW), 5)


@pytest.mark.parametrize("cfg_mode", [False, True])
def test_golden_video_unet_eps(cfg_mode):
    """Full denoising UNet3D (motion modules + bank read + pose/camera
    conditioning) vs reference unet_3d.py:397-577 + motion_module.py +
    mutual_self_attention.py read mode.

    cfg_mode=True exercises the uc_mask semantics: the FIRST half of the
    batch is uncond and re-attends to itself instead of the reference bank
    (mutual_self_attention.py:166-186); ours uses ref_disable flags.
    """
    from src.models.mutual_self_attention import ReferenceAttentionControl

    b = 2 if cfg_mode else 1
    frames, h8 = 2, 16

    ref2d = _torch_reference_unet()
    den3d = _torch_denoising_unet()
    writer = ReferenceAttentionControl(
        ref2d, do_classifier_free_guidance=cfg_mode, mode="write",
        fusion_blocks="full", batch_size=1)
    reader = ReferenceAttentionControl(
        den3d, do_classifier_free_guidance=cfg_mode, mode="read",
        fusion_blocks="full", batch_size=1)

    rng = np.random.default_rng(6)
    ref_lat = rng.normal(size=(b, h8, h8, 4)).astype(np.float32)
    lat = rng.normal(size=(b * frames, h8, h8, 4)).astype(np.float32)
    ctx = rng.normal(size=(b, 1, 32)).astype(np.float32)
    pose = rng.normal(size=(b * frames, h8, h8, 32)).astype(np.float32)
    t = np.full((b,), 500.0, np.float32)

    # --- theirs ---
    with torch.no_grad():
        ref2d(_nchw(ref_lat), torch.zeros(b), encoder_hidden_states=torch.from_numpy(ctx))
        reader.update(writer)
        theirs = den3d(
            _to_bcfhw(lat, frames), torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ctx),
            pose_cond_fea=_to_bcfhw(pose, frames),
        ).sample
    theirs = _from_bcfhw(theirs)

    # --- ours ---
    ours_ref = UNetConditionModel(config=TINY)
    ours_den = UNetConditionModel(config=TINY_VIDEO)
    rparams = ours_ref.init(jax.random.PRNGKey(0), jnp.asarray(ref_lat),
                            jnp.zeros((b,)), jnp.asarray(ctx),
                            collect_ref_features=True)
    rparams = _convert(rparams, ref2d, "unet",
                       allow_missing=("conv_norm_out.", "conv_out."))
    _, feats = ours_ref.apply(rparams, jnp.asarray(ref_lat), jnp.zeros((b,)),
                              jnp.asarray(ctx), collect_ref_features=True)

    dparams = ours_den.init(jax.random.PRNGKey(1), jnp.asarray(lat),
                            jnp.asarray(t), jnp.asarray(ctx),
                            cond_fea=jnp.asarray(pose), ref_features=feats,
                            frames=frames)
    dparams = _convert(dparams, den3d, "unet", allow_unused=(".pe",))
    ref_disable = (jnp.array([True, False]) if cfg_mode
                   else jnp.zeros((b,), bool))
    got, _ = ours_den.apply(
        dparams, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        cond_fea=jnp.asarray(pose), ref_features=feats,
        ref_disable=ref_disable, frames=frames)

    np.testing.assert_allclose(np.asarray(got), theirs, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not os.environ.get("HVT_FULL_GOLDEN"),
                    reason="full-SD1.5-scale golden run (slow; ~10 min on one "
                           "CPU core) — set HVT_FULL_GOLDEN=1")
def test_golden_video_unet_eps_full_scale():
    """Same eps comparison at the FULL SD1.5 operating point: all 16 reference
    banks (tie-heavy width ordering in the reference's sorted pairing), the
    attention_head_dim=8-is-head-count quirk at real widths, AnimateDiff
    motion modules at 8 heads / max_len 32 / mid block, CFG uc_mask.

    The result is recorded in PARITY.md; gated out of routine CI by runtime,
    not by flakiness.
    """
    from src.models.mutual_self_attention import ReferenceAttentionControl
    from src.models.unet_2d_condition import UNet2DConditionModel
    from src.models.unet_3d import UNet3DConditionModel

    full_3d_kw = dict(_TORCH_3D_KW)
    full_3d_kw.update(
        block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
        down_block_types=("CrossAttnDownBlock3D",) * 3 + ("DownBlock3D",),
        up_block_types=("UpBlock3D",) + ("CrossAttnUpBlock3D",) * 3,
        cross_attention_dim=768, attention_head_dim=8, norm_num_groups=32)
    full_3d_kw["motion_module_kwargs"] = dict(
        full_3d_kw["motion_module_kwargs"], num_attention_heads=8,
        temporal_position_encoding_max_len=32)

    ref2d = _randomize(UNet2DConditionModel(
        cross_attention_dim=768, attention_head_dim=8), 7, scale=0.02)
    den3d = _randomize(UNet3DConditionModel(**full_3d_kw), 8, scale=0.02)
    writer = ReferenceAttentionControl(
        ref2d, do_classifier_free_guidance=True, mode="write",
        fusion_blocks="full", batch_size=1)
    reader = ReferenceAttentionControl(
        den3d, do_classifier_free_guidance=True, mode="read",
        fusion_blocks="full", batch_size=1)

    b, frames, hh, ww = 2, 2, 24, 16
    rng = np.random.default_rng(9)
    ref_lat = rng.normal(size=(b, hh, ww, 4)).astype(np.float32)
    lat = rng.normal(size=(b * frames, hh, ww, 4)).astype(np.float32)
    ctx = rng.normal(size=(b, 1, 768)).astype(np.float32)
    pose = rng.normal(size=(b * frames, hh, ww, 320)).astype(np.float32)
    t = np.full((b,), 500.0, np.float32)

    with torch.no_grad():
        ref2d(_nchw(ref_lat), torch.zeros(b),
              encoder_hidden_states=torch.from_numpy(ctx))
        reader.update(writer)
        theirs = den3d(
            _to_bcfhw(lat, frames), torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ctx),
            pose_cond_fea=_to_bcfhw(pose, frames)).sample
    theirs = _from_bcfhw(theirs)

    sd15 = UNetConfig(cross_attention_dim=768)
    sd15_video = dataclasses.replace(sd15, use_motion_module=True)
    ours_ref = UNetConditionModel(config=sd15)
    ours_den = UNetConditionModel(config=sd15_video)

    rparams = ours_ref.init(jax.random.PRNGKey(0), jnp.asarray(ref_lat),
                            jnp.zeros((b,)), jnp.asarray(ctx),
                            collect_ref_features=True)
    rparams = _convert(rparams, ref2d, "unet",
                       allow_missing=("conv_norm_out.", "conv_out."))
    _, feats = ours_ref.apply(rparams, jnp.asarray(ref_lat), jnp.zeros((b,)),
                              jnp.asarray(ctx), collect_ref_features=True)
    assert len(feats) == 16

    dparams = ours_den.init(jax.random.PRNGKey(1), jnp.asarray(lat),
                            jnp.asarray(t), jnp.asarray(ctx),
                            cond_fea=jnp.asarray(pose), ref_features=feats,
                            frames=frames)
    dparams = _convert(dparams, den3d, "unet", allow_unused=(".pe",))
    got, _ = ours_den.apply(
        dparams, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        cond_fea=jnp.asarray(pose), ref_features=feats,
        ref_disable=jnp.array([True, False]), frames=frames)

    np.testing.assert_allclose(np.asarray(got), theirs, rtol=2e-3, atol=2e-3)
