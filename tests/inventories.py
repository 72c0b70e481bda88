"""Hand-built key/shape inventories of the real upstream checkpoints.

Written from the diffusers / AnimateDiff / CameraCtrl / Moore-AnimateAnyone
module structures the reference instantiates (SURVEY §2.1-2.2; reference
``train_stage_1.py:281-344``, ``scripts/pose2vid.py:119-185``), deliberately
NOT derived from ``humanvid_tpu.utils.convert`` so the zero-missing /
zero-unused assertions in ``test_golden_parity.py`` are an independent check:
a converter bug or a missing parameter in our flax models shows up as a
mismatch against these inventories, the way it would against the real files.

Checkpoints covered:
- SD1.5 UNet (``unet/diffusion_pytorch_model.bin`` of runwayml/sd-v1-5)
- AnimateDiff ``v3_sd15_mm.ckpt`` motion-module keys (merged into the UNet
  key space by ``from_pretrained_2d``, reference ``unet_3d.py:636-663``)
- sd-vae-ft-mse AutoencoderKL (both the post-0.18 ``to_q`` naming and the
  2022-era ``query/key/value/proj_attn`` naming)
- CameraCtrl pose encoder (shipped ``pose_encoder_kwargs``)
- Moore-AnimateAnyone ``pose_guider.pth``
(The CLIP image encoder inventory comes from the installed ``transformers``
directly in the test — fully independent.)
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]
Inventory = Dict[str, Shape]


def _norm(inv, p, c):
    inv[p + ".weight"] = (c,)
    inv[p + ".bias"] = (c,)


def _conv(inv, p, o, i, k=3):
    inv[p + ".weight"] = (o, i, k, k)
    inv[p + ".bias"] = (o,)


def _lin(inv, p, o, i, bias=True):
    inv[p + ".weight"] = (o, i)
    if bias:
        inv[p + ".bias"] = (o,)


def _sd_resnet(inv, p, i, o, time_dim=1280):
    _norm(inv, p + ".norm1", i)
    _conv(inv, p + ".conv1", o, i)
    if time_dim:
        _lin(inv, p + ".time_emb_proj", o, time_dim)
    _norm(inv, p + ".norm2", o)
    _conv(inv, p + ".conv2", o, o)
    if i != o:
        _conv(inv, p + ".conv_shortcut", o, i, 1)


def _sd_tblock(inv, p, c, cross=768):
    for n in ("norm1", "norm2", "norm3"):
        _norm(inv, f"{p}.{n}", c)
    for a, kv in (("attn1", c), ("attn2", cross)):
        _lin(inv, f"{p}.{a}.to_q", c, c, bias=False)
        _lin(inv, f"{p}.{a}.to_k", c, kv, bias=False)
        _lin(inv, f"{p}.{a}.to_v", c, kv, bias=False)
        _lin(inv, f"{p}.{a}.to_out.0", c, c)
    _lin(inv, f"{p}.ff.net.0.proj", 8 * c, c)
    _lin(inv, f"{p}.ff.net.2", c, 4 * c)


def _sd_attn2d(inv, p, c):
    _norm(inv, p + ".norm", c)
    _conv(inv, p + ".proj_in", c, c, 1)
    _sd_tblock(inv, p + ".transformer_blocks.0", c)
    _conv(inv, p + ".proj_out", c, c, 1)


def _motion_module(inv, p, c, max_len=32, with_pe=True):
    """AnimateDiff VanillaTemporalModule key space (v3_sd15_mm layout)."""
    tt = p + ".temporal_transformer"
    _norm(inv, tt + ".norm", c)
    _lin(inv, tt + ".proj_in", c, c)
    b = tt + ".transformer_blocks.0"
    for a in range(2):
        ab = f"{b}.attention_blocks.{a}"
        _lin(inv, ab + ".to_q", c, c, bias=False)
        _lin(inv, ab + ".to_k", c, c, bias=False)
        _lin(inv, ab + ".to_v", c, c, bias=False)
        _lin(inv, ab + ".to_out.0", c, c)
        if with_pe:
            inv[ab + ".pos_encoder.pe"] = (1, max_len, c)
        _norm(inv, f"{b}.norms.{a}", c)
    _lin(inv, b + ".ff.net.0.proj", 8 * c, c)
    _lin(inv, b + ".ff.net.2", c, 4 * c)
    _norm(inv, b + ".ff_norm", c)
    _lin(inv, tt + ".proj_out", c, c)


def sd15_unet_inventory(motion: bool = False, mm_max_len: int = 32) -> Inventory:
    """SD1.5 UNet2DConditionModel state dict; ``motion=True`` adds the
    AnimateDiff motion modules of the shipped inference_v2.yaml
    (all resolutions + mid block)."""
    inv: Inventory = {}
    ch = [320, 640, 1280, 1280]
    _conv(inv, "conv_in", 320, 4)
    _lin(inv, "time_embedding.linear_1", 1280, 320)
    _lin(inv, "time_embedding.linear_2", 1280, 1280)

    for i in range(4):
        o = ch[i]
        inp = ch[i - 1] if i > 0 else 320
        for j in range(2):
            _sd_resnet(inv, f"down_blocks.{i}.resnets.{j}", inp if j == 0 else o, o)
            if i < 3:
                _sd_attn2d(inv, f"down_blocks.{i}.attentions.{j}", o)
            if motion:
                _motion_module(inv, f"down_blocks.{i}.motion_modules.{j}", o,
                               mm_max_len)
        if i < 3:
            _conv(inv, f"down_blocks.{i}.downsamplers.0.conv", o, o)

    _sd_resnet(inv, "mid_block.resnets.0", 1280, 1280)
    _sd_attn2d(inv, "mid_block.attentions.0", 1280)
    _sd_resnet(inv, "mid_block.resnets.1", 1280, 1280)
    if motion:
        _motion_module(inv, "mid_block.motion_modules.0", 1280, mm_max_len)

    rev = ch[::-1]
    prev = rev[0]
    for i in range(4):
        o = rev[i]
        skip_in = rev[min(i + 1, 3)]
        for j in range(3):
            res_skip = skip_in if j == 2 else o
            rin = (prev if j == 0 else o) + res_skip
            _sd_resnet(inv, f"up_blocks.{i}.resnets.{j}", rin, o)
            if i > 0:
                _sd_attn2d(inv, f"up_blocks.{i}.attentions.{j}", o)
            if motion:
                _motion_module(inv, f"up_blocks.{i}.motion_modules.{j}", o,
                               mm_max_len)
        if i < 3:
            _conv(inv, f"up_blocks.{i}.upsamplers.0.conv", o, o)
        prev = o

    _norm(inv, "conv_norm_out", 320)
    _conv(inv, "conv_out", 4, 320)
    return inv


def animatediff_v3_inventory(max_len: int = 32, include_mid: bool = False) -> Inventory:
    """Motion-module-only keys (what v3_sd15_mm.ckpt contributes).

    AnimateDiff v3 ships WITHOUT a mid-block motion module (the reference
    merges it with ``strict=False``, ``unet_3d.py:636-663``, leaving the mid
    motion module at its zero-``proj_out`` init = residual no-op);
    ``include_mid=True`` models a v2-style checkpoint that has one."""
    full = sd15_unet_inventory(motion=True, mm_max_len=max_len)
    return {k: v for k, v in full.items()
            if ".motion_modules." in k
            and (include_mid or not k.startswith("mid_block."))}


def _vae_resnet(inv, p, i, o):
    _sd_resnet(inv, p, i, o, time_dim=0)


def _vae_attn(inv, p, old_style: bool):
    _norm(inv, p + ".group_norm", 512)
    names = (("query", "key", "value", "proj_attn") if old_style
             else ("to_q", "to_k", "to_v", "to_out.0"))
    for n in names:
        _lin(inv, f"{p}.{n}", 512, 512)


def sd_vae_inventory(old_attn_naming: bool = False) -> Inventory:
    """sd-vae-ft-mse AutoencoderKL. ``old_attn_naming`` reproduces the
    pre-diffusers-0.18 ``query/key/value/proj_attn`` keys of the 2022-era
    checkpoint file."""
    inv: Inventory = {}
    ch = [128, 256, 512, 512]
    _conv(inv, "encoder.conv_in", 128, 3)
    for i in range(4):
        o = ch[i]
        inp = ch[i - 1] if i > 0 else 128
        for j in range(2):
            _vae_resnet(inv, f"encoder.down_blocks.{i}.resnets.{j}",
                        inp if j == 0 else o, o)
        if i < 3:
            _conv(inv, f"encoder.down_blocks.{i}.downsamplers.0.conv", o, o)
    _vae_resnet(inv, "encoder.mid_block.resnets.0", 512, 512)
    _vae_attn(inv, "encoder.mid_block.attentions.0", old_attn_naming)
    _vae_resnet(inv, "encoder.mid_block.resnets.1", 512, 512)
    _norm(inv, "encoder.conv_norm_out", 512)
    _conv(inv, "encoder.conv_out", 8, 512)
    inv["quant_conv.weight"] = (8, 8, 1, 1)
    inv["quant_conv.bias"] = (8,)

    inv["post_quant_conv.weight"] = (4, 4, 1, 1)
    inv["post_quant_conv.bias"] = (4,)
    _conv(inv, "decoder.conv_in", 512, 4)
    _vae_resnet(inv, "decoder.mid_block.resnets.0", 512, 512)
    _vae_attn(inv, "decoder.mid_block.attentions.0", old_attn_naming)
    _vae_resnet(inv, "decoder.mid_block.resnets.1", 512, 512)
    rev = ch[::-1]  # [512, 512, 256, 128]
    prev = rev[0]
    for i in range(4):
        o = rev[i]
        for j in range(3):
            _vae_resnet(inv, f"decoder.up_blocks.{i}.resnets.{j}",
                        prev if j == 0 else o, o)
        if i < 3:
            _conv(inv, f"decoder.up_blocks.{i}.upsamplers.0.conv", o, o)
        prev = o
    _norm(inv, "decoder.conv_norm_out", 128)
    _conv(inv, "decoder.conv_out", 3, 128)
    return inv


def cameractrl_inventory(max_len: int = 24) -> Inventory:
    """CameraCtrl pose-encoder ckpt with the shipped pose_encoder_kwargs
    (channels=[320], nums_rb=2, cin=384, ksize=1, sk=true)."""
    inv: Inventory = {}
    c = 320
    _conv(inv, "encoder_conv_in", c, 384)
    for j in range(2):
        p = f"encoder_down_conv_blocks.0.{j}"
        if j == 0:
            # in==out and sk=True -> no in_conv/skep for j=0 too (in_dim is
            # channels[0] after encoder_conv_in)
            pass
        _conv(inv, p + ".block1", c, c, 3)
        _conv(inv, p + ".block2", c, c, 1)  # ksize=1
        a = f"encoder_down_attention_blocks.0.{j}"
        _lin(inv, a + ".attention_blocks.0.to_q", c, c, bias=False)
        _lin(inv, a + ".attention_blocks.0.to_k", c, c, bias=False)
        _lin(inv, a + ".attention_blocks.0.to_v", c, c, bias=False)
        _lin(inv, a + ".attention_blocks.0.to_out.0", c, c)
        inv[a + ".attention_blocks.0.pos_encoder.pe"] = (1, max_len, c)
        _norm(inv, a + ".norms.0", c)
        _lin(inv, a + ".ff.net.0.proj", 8 * c, c)
        _lin(inv, a + ".ff.net.2", c, 4 * c)
        _norm(inv, a + ".ff_norm", c)
    inv["zero_conv_layers.0.weight"] = (c, c, 1, 1)  # bias=False
    return inv


def moore_pose_guider_inventory() -> Inventory:
    """Moore-AnimateAnyone pose_guider.pth: PoseGuider(320, (16, 32, 96, 256))."""
    inv: Inventory = {}
    _conv(inv, "conv_in", 16, 3)
    chans = [16, 32, 96, 256]
    for i in range(3):
        _conv(inv, f"blocks.{2 * i}", chans[i], chans[i])
        _conv(inv, f"blocks.{2 * i + 1}", chans[i + 1], chans[i])
    _conv(inv, "conv_out", 320, 256)
    return inv
