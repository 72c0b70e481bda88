"""DWPose wholebody pose estimator (RTMPose/SimCC) in flax.

The reference's DWPose stage 2 is the ``dw-ll_ucoco_384`` ONNX ran per person
box by onnxruntime (``src/dwpose/wholebody.py``, ``onnxpose.py`` behavior:
top-down affine crop to 288x384, ImageNet mean/std normalization, SimCC 1-D
x/y classification decode at split ratio 2). TPU-native rebuild:

- backbone: CSPNeXt-l (stem of three 3x3 convs, four stages of stride-2 conv +
  CSP layer with depthwise-5x5 CSPNeXt blocks and channel attention, SPP in
  the last stage);
- head: RTMCC — 7x7 conv to K=133 channels, flatten, ScaleNorm + linear to a
  256-d token per keypoint, one GAU (gated attention unit with RoPE and
  squared-ReLU attention), two linear SimCC classifiers over x (576 bins) and
  y (768 bins).

Weights convert from the mmpose/torch state_dict layout via
``load_torch_state_dict`` (ONNX initializers keep these names through export).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NUM_KEYPOINTS = 133
INPUT_W, INPUT_H = 288, 384
SIMCC_RATIO = 2.0
MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


class ConvModule(nn.Module):
    out_channels: int
    ksize: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.ksize - 1) // 2
        x = nn.Conv(self.out_channels, (self.ksize, self.ksize),
                    (self.stride, self.stride), [(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         name="bn")(x)
        return nn.silu(x)


class DepthwiseSeparableConv(nn.Module):
    out_channels: int
    ksize: int = 5

    @nn.compact
    def __call__(self, x):
        x = ConvModule(x.shape[-1], self.ksize, groups=x.shape[-1],
                       name="depthwise_conv")(x)
        return ConvModule(self.out_channels, 1, name="pointwise_conv")(x)


class CSPNeXtBlock(nn.Module):
    out_channels: int
    add_identity: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * 0.5)
        y = ConvModule(hidden, 3, name="conv1")(x)
        y = DepthwiseSeparableConv(self.out_channels, 5, name="conv2")(y)
        return x + y if self.add_identity and x.shape[-1] == self.out_channels else y


class ChannelAttention(nn.Module):
    @nn.compact
    def __call__(self, x):
        w = x.mean(axis=(1, 2), keepdims=True)
        w = nn.Conv(x.shape[-1], (1, 1), use_bias=True, name="fc")(w)
        return x * jax.nn.hard_sigmoid(w)


class CSPNeXtLayer(nn.Module):
    out_channels: int
    n: int = 1
    add_identity: bool = True

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * 0.5)
        a = ConvModule(mid, 1, name="main_conv")(x)
        b = ConvModule(mid, 1, name="short_conv")(x)
        for i in range(self.n):
            a = CSPNeXtBlock(mid, self.add_identity, name=f"blocks.{i}")(a)
        y = jnp.concatenate([a, b], axis=-1)
        y = ChannelAttention(name="attention")(y)
        return ConvModule(self.out_channels, 1, name="final_conv")(y)


class SPPBottleneck(nn.Module):
    out_channels: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = ConvModule(hidden, 1, name="conv1")(x)
        p1 = nn.max_pool(x, (self.kernel, self.kernel), (1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (self.kernel, self.kernel), (1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (self.kernel, self.kernel), (1, 1), padding="SAME")
        return ConvModule(self.out_channels, 1, name="conv2")(
            jnp.concatenate([x, p1, p2, p3], axis=-1))


class CSPNeXt(nn.Module):
    """L config: widen 1.0, deepen 1.0; returns the stride-32 feature."""

    @nn.compact
    def __call__(self, x):
        x = ConvModule(32, 3, 2, name="stem.0")(x)
        x = ConvModule(32, 3, 1, name="stem.1")(x)
        x = ConvModule(64, 3, 1, name="stem.2")(x)
        x = ConvModule(128, 3, 2, name="stage1.0")(x)
        x = CSPNeXtLayer(128, 3, name="stage1.1")(x)
        x = ConvModule(256, 3, 2, name="stage2.0")(x)
        x = CSPNeXtLayer(256, 6, name="stage2.1")(x)
        x = ConvModule(512, 3, 2, name="stage3.0")(x)
        x = CSPNeXtLayer(512, 6, name="stage3.1")(x)
        x = ConvModule(1024, 3, 2, name="stage4.0")(x)
        x = SPPBottleneck(1024, name="stage4.1")(x)
        x = CSPNeXtLayer(1024, 3, add_identity=False, name="stage4.2")(x)
        return x


class ScaleNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        scale = x.shape[-1] ** -0.5
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * scale
        return x / jnp.maximum(norm, 1e-5) * g


def _rope(x: jnp.ndarray) -> jnp.ndarray:
    """Rotary position embedding over (B, N, D) tokens."""
    b, n, d = x.shape
    half = d // 2
    freq = jnp.arange(half, dtype=jnp.float32)
    inv = 10000.0 ** (-freq / half)
    pos = jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None, :]  # (n, half)
    sin, cos = jnp.sin(pos), jnp.cos(pos)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


class GAU(nn.Module):
    """Gated attention unit (RTMCCBlock): squared-ReLU attention + gating."""

    dim: int = 256
    expansion: int = 2
    s: int = 128

    @nn.compact
    def __call__(self, x):
        e = self.dim * self.expansion
        shortcut = x
        xn = ScaleNorm(name="ln")(x)
        # mmpose RTMCCBlock builds uv with bias=False (same as the output
        # projection); a bias param here would not exist in real checkpoints
        uv = nn.Dense(2 * e + self.s, use_bias=False, name="uv")(xn)
        uv = nn.silu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        gamma = self.param("gamma", nn.initializers.normal(0.02), (2, self.s))
        beta = self.param("beta", nn.initializers.zeros, (2, self.s))
        q = _rope(base * gamma[0] + beta[0])
        k = _rope(base * gamma[1] + beta[1])
        qk = jnp.einsum("bmd,bnd->bmn", q, k)
        attn = jax.nn.relu(qk / jnp.sqrt(jnp.float32(self.s))) ** 2
        out = u * jnp.einsum("bmn,bnd->bmd", attn, v)
        out = nn.Dense(self.dim, use_bias=False, name="o")(out)
        return out + shortcut


class DWPoseModel(nn.Module):
    """Normalized crop (B, 384, 288, 3) -> SimCC logits
    (B, 133, 576), (B, 133, 768)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = CSPNeXt(name="backbone")(x)  # (B, 12, 9, 1024)
        k = nn.Conv(NUM_KEYPOINTS, (7, 7), padding=3, name="final_layer")(feat)
        b = k.shape[0]
        # (B, 12, 9, K) -> (B, K, 108) token per keypoint
        tokens = k.transpose(0, 3, 1, 2).reshape(b, NUM_KEYPOINTS, -1)
        tokens = ScaleNorm(name="mlp_norm")(tokens)
        tokens = nn.Dense(256, use_bias=False, name="mlp_fc")(tokens)
        tokens = GAU(name="gau")(tokens)
        x_logits = nn.Dense(int(INPUT_W * SIMCC_RATIO), name="cls_x")(tokens)
        y_logits = nn.Dense(int(INPUT_H * SIMCC_RATIO), name="cls_y")(tokens)
        return x_logits, y_logits


# ---------------------------------------------------------------------------
# top-down crop + decode (host)
# ---------------------------------------------------------------------------

def bbox_to_center_scale(bbox: np.ndarray, padding: float = 1.25) -> Tuple:
    """xyxy -> (center, scale) with the model aspect ratio enforced."""
    x1, y1, x2, y2 = bbox[:4]
    center = np.array([(x1 + x2) / 2, (y1 + y2) / 2], np.float32)
    w, h = (x2 - x1) * padding, (y2 - y1) * padding
    aspect = INPUT_W / INPUT_H
    if w > aspect * h:
        h = w / aspect
    else:
        w = h * aspect
    return center, np.array([w, h], np.float32)


def crop_affine(img: np.ndarray, center: np.ndarray, scale: np.ndarray) -> Tuple:
    """Warp the person region to (INPUT_H, INPUT_W); returns crop + the
    inverse mapping params (center, scale)."""
    import cv2

    src_w = scale[0]
    src = np.array([
        center,
        center + np.array([0, -src_w * 0.5 * INPUT_H / INPUT_W], np.float32),
        center + np.array([src_w * 0.5, 0], np.float32),
    ], np.float32)
    dst = np.array([
        [INPUT_W / 2, INPUT_H / 2],
        [INPUT_W / 2, INPUT_H / 2 - INPUT_W * 0.5 * INPUT_H / INPUT_W],
        [INPUT_W / 2 + INPUT_W * 0.5, INPUT_H / 2],
    ], np.float32)
    mat = cv2.getAffineTransform(src, dst)
    crop = cv2.warpAffine(img, mat, (INPUT_W, INPUT_H), flags=cv2.INTER_LINEAR)
    return crop, (center, scale)


def normalize_crop(crop_bgr: np.ndarray) -> np.ndarray:
    rgb = crop_bgr[..., ::-1].astype(np.float32)
    return (rgb - MEAN) / STD


def simcc_decode(x_logits: np.ndarray, y_logits: np.ndarray) -> Tuple:
    """SimCC argmax decode -> keypoints (B, K, 2) in input-crop pixels and
    scores (B, K)."""
    xi = x_logits.argmax(axis=-1)
    yi = y_logits.argmax(axis=-1)
    sx = x_logits.max(axis=-1)
    sy = y_logits.max(axis=-1)
    scores = np.minimum(sx, sy)
    kpts = np.stack([xi / SIMCC_RATIO, yi / SIMCC_RATIO], axis=-1).astype(np.float32)
    kpts[scores <= 0] = -1
    return kpts, scores


def crop_to_image(kpts: np.ndarray, center: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Map crop-space keypoints back to original-image pixels."""
    return (kpts - np.array([INPUT_W / 2, INPUT_H / 2])) * \
        (scale / np.array([INPUT_W, INPUT_H])) + center


def load_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """mmpose DWPose state_dict -> flax variables.

    Expected key roots: ``backbone.stem.0.conv.weight``,
    ``backbone.stage{1-4}.{0,1,2}...``, ``head.final_layer.{weight,bias}``,
    ``head.mlp.0.g / head.mlp.1.weight``, ``head.gau.*``, ``head.cls_x.*``.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    def regroup(parts: List[str]) -> List[str]:
        out: List[str] = []
        i = 0
        while i < len(parts):
            p, nxt = parts[i], parts[i + 1] if i + 1 < len(parts) else None
            if nxt is not None and nxt.isdigit() and p in (
                "stem", "stage1", "stage2", "stage3", "stage4", "blocks",
            ):
                out.append(f"{p}.{nxt}")
                i += 2
            else:
                out.append(p)
                i += 1
        return out

    rename = {
        ("head", "mlp", "0", "g"): ["mlp_norm", "g"],
        ("head", "mlp", "1", "weight"): ["mlp_fc", "kernel"],
    }
    for key, val in sd.items():
        v = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "head":
            rk = rename.get(tuple(parts))
            if rk is not None:
                put(params, rk, v.T if rk[-1] == "kernel" else v)
                continue
            name, pname = parts[1], parts[-1]
            if name == "final_layer":
                if pname == "weight":
                    put(params, ["final_layer", "kernel"], v.transpose(2, 3, 1, 0))
                else:
                    put(params, ["final_layer", "bias"], v)
            elif name == "gau":
                sub = parts[2]
                if sub in ("gamma", "beta"):
                    put(params, ["gau", sub], v)
                elif sub == "ln":
                    put(params, ["gau", "ln", "g"], v.reshape(-1))
                elif sub in ("uv", "o"):
                    if pname == "weight":
                        put(params, ["gau", sub, "kernel"], v.T)
                    else:
                        put(params, ["gau", sub, "bias"], v)
            elif name in ("cls_x", "cls_y"):
                if pname == "weight":
                    put(params, [name, "kernel"], v.T)
                else:
                    put(params, [name, "bias"], v)
            continue
        # backbone convs/bns
        *mod, kind, pname = parts
        path = regroup(mod) + [kind]
        if kind == "conv" and pname == "weight":
            # depthwise convs: torch (O, 1, kh, kw) -> flax (kh, kw, 1, O)
            put(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
        elif kind == "fc":  # channel attention
            if pname == "weight":
                put(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
            else:
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
