"""Pretrained weight loading for the CamAnimate system.

Mirrors the reference's weight assembly (``scripts/pose2vid.py:119-185``,
``train_stage_1.py:281-344``): SD1.5 UNet (both UNets), sd-vae-ft-mse VAE,
CLIP image encoder, Moore pose guider, CameraCtrl camera encoder, stage
checkpoints / AnimateDiff motion module — each converted from its torch
state dict into our param trees.

Config keys (all optional — missing entries keep random init with a warning,
so smoke tests and benchmarks run without any downloads):
    base_model_path, vae_model_path, image_encoder_path, pose_guider_path,
    camera_pose_encoder_path, denoising_unet_path, reference_unet_path,
    motion_module_path
Paths may be .pth/.ckpt/.safetensors (torch layouts) or .msgpack (ours).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import jax
import numpy as np

from .convert import convert_state_dict, load_torch_state_dict

logger = logging.getLogger(__name__)


def _load_sd(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return load_file(path)
        except ImportError:
            import torch  # safetensors via torch fallback
            from safetensors.torch import load_file as tl

            return {k: v.numpy() for k, v in tl(path).items()}
    return load_torch_state_dict(path)


def _maybe_convert(params, path: str, kind: str, strict: bool = False):
    if not path or not os.path.exists(path):
        if path:
            logger.warning("weights not found: %s (keeping random init)", path)
        return params, False
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.from_bytes(params, f.read()), True
    sd = _load_sd(path)
    new, missing, unused = convert_state_dict(params, sd, kind, strict=strict)
    if missing:
        logger.warning("%s: %d missing keys (e.g. %s)", path, len(missing), missing[:3])
    if unused:
        logger.info("%s: %d unused torch keys", path, len(unused))
    return new, True


def load_msgpack_tree(path: str, target: Any = None) -> Any:
    """Load a flax-serialized pytree; structure-free restore when no target."""
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


def load_pretrained_params(system, cfg, abstract: bool = False) -> Dict[str, Any]:
    """Initialize params then overwrite from configured checkpoint paths.

    ``abstract=True`` skips the real init (zero-filled host trees): structure
    for conversion tools where un-checkpointed leaves don't matter.
    """
    params = system.init_params(jax.random.PRNGKey(0), 64, 64, frames=2,
                                abstract=abstract)
    get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: getattr(cfg, k, d)

    def sub(path_key, component, kind):
        path = get(path_key, "") or ""
        params[component], ok = _maybe_convert(params[component], path, kind)
        return ok

    # upstream SD1.5 UNet weights feed both UNets
    base = get("base_model_path", "") or ""
    for comp in ("reference_unet", "denoising_unet"):
        for cand in (
            os.path.join(base, "unet", "diffusion_pytorch_model.bin"),
            os.path.join(base, "unet", "diffusion_pytorch_model.safetensors"),
        ):
            if base and os.path.exists(cand):
                params[comp], _ = _maybe_convert(params[comp], cand, "unet")
                break

    vae = get("vae_model_path", "") or ""
    for cand in (
        os.path.join(vae, "diffusion_pytorch_model.bin"),
        os.path.join(vae, "diffusion_pytorch_model.safetensors"),
    ):
        if vae and os.path.exists(cand):
            params["vae_encoder"], _ = _maybe_convert(params["vae_encoder"], cand, "vae_encoder")
            params["vae_decoder"], _ = _maybe_convert(params["vae_decoder"], cand, "vae_decoder")
            break

    enc = get("image_encoder_path", "") or ""
    for cand in (os.path.join(enc, "pytorch_model.bin"), os.path.join(enc, "model.safetensors")):
        if enc and os.path.exists(cand):
            params["clip"], _ = _maybe_convert(params["clip"], cand, "clip")
            break

    sub("pose_guider_path", "pose_guider", "pose_guider")
    sub("camera_pose_encoder_path", "camera_encoder", "camera_encoder")
    sub("reference_unet_path", "reference_unet", "unet")
    sub("denoising_unet_path", "denoising_unet", "unet")
    sub("motion_module_path", "denoising_unet", "unet")  # strict=False fills motion only
    return jax.block_until_ready(params)
