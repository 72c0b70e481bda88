"""InceptionV3 feature extractor for FID, in flax (NHWC, XLA-fused).

Behavioral parity: the reference bundles pytorch-fid's InceptionV3
(``metrics/utils/fid_inception.py``, FID-specific weights) and extracts
2048-d final-average-pool activations over 24 frames per clip
(``metrics/eval_fid.py:123-318``). This is a TPU-native reimplementation of
that network: same topology (torchvision InceptionV3 with the FID variants'
``count_include_pad=False`` average pools), same preprocessing (bilinear
resize to 299, scale [0,1] -> [-1,1]).

Weights: ``load_torch_state_dict`` converts a pytorch-fid / torchvision
``state_dict`` into this module's param pytree (zero-egress images gate on the
file's presence). Module/parameter names mirror the torch names 1:1 so the
conversion is mechanical.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, self.kernel, self.stride,
                    [(self.padding[0],) * 2, (self.padding[1],) * 2],
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3_nopad(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool with ``count_include_pad=False`` semantics
    (the pytorch-fid InceptionA/C/E tweak): border windows divide by the
    number of valid taps, not 9."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_ / cnt


def _max_pool(x, window=(3, 3), stride=(2, 2), padding="VALID"):
    pad = ([(0, 0), (1, 1), (1, 1), (0, 0)] if padding == "SAME1"
           else [(0, 0), (0, 0), (0, 0), (0, 0)])
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + window + (1,), (1,) + stride + (1,), pad
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_nopad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_nopad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str  # "avg" (Mixed_7b, FID variant) | "max" (Mixed_7c, FID variant)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool_3x3_nopad(x)
        else:
            bp = _max_pool(x, (3, 3), (1, 1), "SAME1")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[0,1] NHWC images -> 2048-d pool3 features (pytorch-fid semantics)."""

    resize_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear",
                                 antialias=False)  # F.interpolate parity (fid_inception.py:148)
        x = x * 2.0 - 1.0

        x = BasicConv2d(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # adaptive avg pool -> (n, 2048)


def load_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision/pytorch-fid InceptionV3 state_dict -> flax variables.

    Conv weights (O, I, kh, kw) -> (kh, kw, I, O); BN statistics go to
    ``batch_stats``. The final ``fc`` layer is unused and skipped.
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
        if parts[0] in ("fc", "AuxLogits"):
            continue
        *mod, kind, pname = parts  # e.g. Mixed_5b.branch1x1.conv.weight
        path = mod + [kind]
        if kind == "conv" and pname == "weight":
            put(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
        elif kind == "bn":
            if pname == "weight":
                put(params, path + ["scale"], v)
            elif pname == "bias":
                put(params, path + ["bias"], v)
            elif pname == "running_mean":
                put(stats, path + ["mean"], v)
            elif pname == "running_var":
                put(stats, path + ["var"], v)
        # num_batches_tracked: skip
    return {"params": params, "batch_stats": stats}


def fid_features(variables, images: np.ndarray, batch: int = 32) -> np.ndarray:
    """(n, H, W, 3) [0,1] -> (n, 2048) features, jit-batched."""
    model = InceptionV3Features()
    # variables as a jit ARGUMENT (one packed transfer), not a closure:
    # closure params become HLO literals, and a literal-heavy program can
    # break the axon remote-compile pipe (see metrics/weights.py clip note)
    from ..utils.transfer import packed_device_put

    variables = packed_device_put(variables)
    run = jax.jit(model.apply)
    run = partial(run, variables)
    outs = []
    n = images.shape[0]
    for i in range(0, n, batch):
        chunk = images[i:i + batch]
        if chunk.shape[0] < batch:  # pad to the compiled shape
            padn = batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((padn,) + chunk.shape[1:],
                                                    chunk.dtype)])
            outs.append(np.asarray(run(jnp.asarray(chunk)))[:batch - padn])
        else:
            outs.append(np.asarray(run(jnp.asarray(chunk))))
    return np.concatenate(outs, axis=0)
