"""I3D (Inflated Inception-V1) video feature extractor for FVD, in flax.

Behavioral parity: the reference auto-downloads a torchscript I3D with
styleganv's FVD weights and computes the Fréchet distance over its 400-d
logits on 24-frame, 224x224 clips (``metrics/utils/fvd.py:10-79``,
``metrics/eval_fvd.py:59-126``). This reimplements the standard I3D topology
(Carreira & Zisserman 2017, "Quo Vadis") NDHWC in flax; weights convert from
a torch I3D ``state_dict`` via ``load_torch_state_dict``.

Preprocessing parity (``metrics/utils/fvd.py:42-79``): bilinear resize to
224 with center crop, scale [0,1] -> [-1,1].
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Unit3D(nn.Module):
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # I3D uses TF-style SAME padding
        x = nn.Conv(self.out_channels, self.kernel, self.stride, padding="SAME",
                    use_bias=self.use_bias, name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                             name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


def _max_pool_same(x, window, stride):
    """TF-SAME max pool over (t, h, w) of an NDHWC tensor."""
    dims = (1,) + window + (1,)
    strides = (1,) + stride + (1,)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, "SAME")


class InceptionModule(nn.Module):
    channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3]

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], name="b0")(x)
        b1 = Unit3D(c[1], name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(c[3], name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), name="b2b")(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    """NDHWC video in [-1, 1] -> (n, num_classes) logits."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule([64, 96, 128, 16, 32, 32], name="Mixed_3b")(x)
        x = InceptionModule([128, 128, 192, 32, 96, 64], name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        x = InceptionModule([192, 96, 208, 16, 48, 64], name="Mixed_4b")(x)
        x = InceptionModule([160, 112, 224, 24, 64, 64], name="Mixed_4c")(x)
        x = InceptionModule([128, 128, 256, 24, 64, 64], name="Mixed_4d")(x)
        x = InceptionModule([112, 144, 288, 32, 64, 64], name="Mixed_4e")(x)
        x = InceptionModule([256, 160, 320, 32, 128, 128], name="Mixed_4f")(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule([256, 160, 320, 32, 128, 128], name="Mixed_5b")(x)
        x = InceptionModule([384, 192, 384, 48, 128, 128], name="Mixed_5c")(x)
        # spatial avg pool (keep time), then logits conv, then time-mean
        x = x.mean(axis=(2, 3), keepdims=True)  # (n, t, 1, 1, 1024)
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   use_bias=True, name="logits")(x)
        return x.mean(axis=(1, 2, 3))  # (n, num_classes)


def preprocess_video(video: np.ndarray, size: int = 224) -> np.ndarray:
    """(f, H, W, 3) [0,1] -> (f, 224, 224, 3) [-1,1]: resize-short-side +
    center crop (fvd.py:42-79).

    The reference resizes with ``F.interpolate(mode='bilinear',
    align_corners=False)`` — half-pixel bilinear with NO antialiasing — and
    ceil-rounds the long side; ``jax.image.resize`` defaults to antialias,
    so both must be pinned for FVD parity.
    """
    import math

    f, h, w, _ = video.shape
    scale = size / min(h, w)
    if h < w:
        nh, nw = size, math.ceil(w * scale)
    else:
        nh, nw = math.ceil(h * scale), size
    v = jax.image.resize(jnp.asarray(video), (f, nh, nw, 3), "bilinear",
                         antialias=False)
    top, left = (nh - size) // 2, (nw - size) // 2
    v = v[:, top:top + size, left:left + size, :]
    return np.asarray(v) * 2.0 - 1.0


def load_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch I3D state_dict -> flax variables.

    Expects keys like ``Mixed_3b.b1a.conv3d.weight`` (O, I, kt, kh, kw) and
    BN under ``...bn.{weight,bias,running_mean,running_var}``. Common naming
    variants (``branch_0.0`` style from public ports) should be renamed to
    this layout by the caller before conversion.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, val in state_dict.items():
        v = np.asarray(val)
        parts = key.split(".")
        *mod, kind, pname = parts
        path = mod + [kind]
        if kind == "conv3d" and pname == "weight":
            put(params, path + ["kernel"], v.transpose(2, 3, 4, 1, 0))
        elif kind == "conv3d" and pname == "bias":
            put(params, path + ["bias"], v)
        elif kind == "bn":
            if pname == "weight":
                put(params, path + ["scale"], v)
            elif pname == "bias":
                put(params, path + ["bias"], v)
            elif pname == "running_mean":
                put(stats, path + ["mean"], v)
            elif pname == "running_var":
                put(stats, path + ["var"], v)
    return {"params": params, "batch_stats": stats}


def fvd_logits(variables, videos: np.ndarray, batch: int = 2) -> np.ndarray:
    """(n, f, 224, 224, 3) in [-1,1] -> (n, 400) logits, jit-batched."""
    model = I3D()
    # variables as a jit ARGUMENT (one packed transfer), not a closure:
    # closure params become HLO literals, and a literal-heavy program can
    # break the axon remote-compile pipe (see metrics/weights.py clip note)
    from ..utils.transfer import packed_device_put

    variables = packed_device_put(variables)
    run = jax.jit(model.apply)
    run = partial(run, variables)
    outs = []
    for i in range(0, videos.shape[0], batch):
        chunk = videos[i:i + batch]
        if chunk.shape[0] < batch:
            padn = batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((padn,) + chunk.shape[1:],
                                                    chunk.dtype)])
            outs.append(np.asarray(run(jnp.asarray(chunk)))[:batch - padn])
        else:
            outs.append(np.asarray(run(jnp.asarray(chunk))))
    return np.concatenate(outs, axis=0)
