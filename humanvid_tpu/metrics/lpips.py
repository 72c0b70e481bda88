"""LPIPS perceptual distance (VGG16 backbone + linear heads), in flax.

Behavioral parity: the reference bundles lpipsPyTorch with the vgg variant
(``metrics/lpipsPyTorch/__init__.py:6-21``, modules/ — used by
``scripts/eval_pose2img.py:267-272`` and ``metrics/metrics.py``): images are
shift/scale normalized, VGG16 relu{1_2,2_2,3_3,4_3,5_3} activations are
channel-unit-normalized, squared differences pass through 1x1 "lin" convs and
are spatially averaged and summed.

Weights convert from torchvision VGG16 ``features`` + lpips lin weights via
``load_torch_weights``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# imagenet-ish normalization used by LPIPS' ScalingLayer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (out_channels, layers) per stage; relu taps at stage ends
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_LPIPS_CHANNELS = [64, 128, 256, 512, 512]


class VGG16Features(nn.Module):
    """[-1,1]-ish normalized NHWC -> 5 relu feature maps."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        li = 0  # torchvision features index (conv+relu+pool flat list)
        for si, (ch, n_layers) in enumerate(_VGG_STAGES):
            for _ in range(n_layers):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{li}")(x)
                li += 2  # conv + relu
                x = nn.relu(x)
            taps.append(x)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), (2, 2))
                li += 1
        return taps


class LPIPS(nn.Module):
    """Pairwise perceptual distance. Inputs NHWC in [0, 1]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift, scale = jnp.asarray(_SHIFT), jnp.asarray(_SCALE)

        def norm_input(im):
            # The reference feeds ToTensor [0,1] images straight into
            # BaseNet.z_score with no [-1,1] rescale (metrics/metrics.py:93-100,
            # scripts/eval_pose2img.py:273; modules/networks.py:50-51) — even
            # though lpipsPyTorch's shift/scale constants were fit for the
            # [-1,1] domain. Parity requires matching their convention.
            return (im - shift) / scale

        vgg = VGG16Features(name="vgg")
        fx = vgg(norm_input(x))
        fy = vgg(norm_input(y))

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            # normalize_activation (modules/utils.py:6-8): x / (||x||_c + eps)
            a = a / (jnp.sqrt((a * a).sum(-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt((b * b).sum(-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            # lin layers are plain 1x1 convs, bias-free and applied raw
            # (modules/networks.py:24-31, modules/lpips.py:33-36); the
            # released lpips weights are non-negative by training, not
            # clamped at use
            w = self.param(f"lin_{i}", nn.initializers.ones, (d.shape[-1],))
            contrib = (d * w[None, None, None, :]).sum(-1)
            total = total + contrib.mean(axis=(1, 2))
        return total  # (n,)


def load_torch_weights(vgg_features_sd: Dict[str, Any],
                       lin_sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert torchvision ``vgg16.features`` + lpips ``lin{i}.model.1.weight``
    state dicts to this module's params."""
    params: Dict[str, Any] = {"vgg": {}}
    for key, val in vgg_features_sd.items():
        idx, pname = key.split(".")  # e.g. "0.weight"
        v = np.asarray(val)
        name = f"conv_{idx}"
        params["vgg"].setdefault(name, {})
        if pname == "weight":
            params["vgg"][name]["kernel"] = v.transpose(2, 3, 1, 0)
        else:
            params["vgg"][name]["bias"] = v
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in lin_sd:
                params[f"lin_{i}"] = np.asarray(lin_sd[cand]).reshape(-1)
                break
        else:
            raise KeyError(f"missing lpips lin weights for stage {i}")
    return {"params": params}


def lpips_distance(variables, a: np.ndarray, b: np.ndarray,
                   batch: int = 8) -> np.ndarray:
    """(n, H, W, 3) [0,1] pairs -> (n,) perceptual distances, jit-batched."""
    model = LPIPS()
    # variables as a jit ARGUMENT (one packed transfer), not a closure:
    # closure params become HLO literals, and a literal-heavy program can
    # break the axon remote-compile pipe (see metrics/weights.py clip note)
    from ..utils.transfer import packed_device_put

    variables = packed_device_put(variables)
    run = jax.jit(model.apply)
    run = partial(run, variables)
    outs = []
    for i in range(0, a.shape[0], batch):
        ca, cb = a[i:i + batch], b[i:i + batch]
        if ca.shape[0] < batch:
            padn = batch - ca.shape[0]
            pad = np.zeros((padn,) + ca.shape[1:], ca.dtype)
            outs.append(np.asarray(run(jnp.asarray(np.concatenate([ca, pad])),
                                       jnp.asarray(np.concatenate([cb, pad]))))[:batch - padn])
        else:
            outs.append(np.asarray(run(jnp.asarray(ca), jnp.asarray(cb))))
    return np.concatenate(outs, axis=0)
