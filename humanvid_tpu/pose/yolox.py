"""YOLOX-L person detector in flax (NHWC, XLA-fused).

The reference's DWPose stage 1 is a YOLOX-L ONNX ran by onnxruntime-gpu
(``src/dwpose/wholebody.py:14-27``; preprocessing/postprocessing behavior in
``src/dwpose/onnxdet.py``: 640x640 letterbox with 114 padding, grid decode
over strides 8/16/32, class-aware NMS). This is a TPU-native rebuild of that
network: CSPDarknet-53 backbone with Focus stem, PAFPN neck, decoupled heads.

Param tree mirrors the upstream YOLOX module paths (``backbone.backbone.stem
...``, ``head.cls_convs.0.0...``) so ``load_torch_state_dict`` /
``load_onnx_weights`` are mechanical renames.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

STRIDES = (8, 16, 32)
INPUT_SIZE = 640


class BaseConv(nn.Module):
    out_channels: int
    ksize: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.ksize - 1) // 2
        x = nn.Conv(self.out_channels, (self.ksize, self.ksize),
                    (self.stride, self.stride), [(pad, pad), (pad, pad)],
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.97, name="bn")(x)
        return nn.silu(x)


class Focus(nn.Module):
    """Space-to-depth 2x stem: (h, w, 3) -> (h/2, w/2, 12) -> conv."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return BaseConv(self.out_channels, 3, name="conv")(x)


class Bottleneck(nn.Module):
    out_channels: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        y = BaseConv(self.out_channels, 1, name="conv1")(x)
        y = BaseConv(self.out_channels, 3, name="conv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.out_channels else y


class CSPLayer(nn.Module):
    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * self.expansion)
        a = BaseConv(hidden, 1, name="conv1")(x)
        b = BaseConv(hidden, 1, name="conv2")(x)
        for i in range(self.n):
            a = Bottleneck(hidden, self.shortcut, name=f"m.{i}")(a)
        return BaseConv(self.out_channels, 1, name="conv3")(
            jnp.concatenate([a, b], axis=-1))


class SPPBottleneck(nn.Module):
    out_channels: int
    kernels: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, name="conv1")(x)
        pools = [x]
        for k in self.kernels:
            pools.append(nn.max_pool(x, (k, k), (1, 1), padding="SAME"))
        return BaseConv(self.out_channels, 1, name="conv2")(
            jnp.concatenate(pools, axis=-1))


class CSPDarknet(nn.Module):
    """depth/width 1.0 (the L config)."""

    dep: int = 3  # base depth; L: 3 -> blocks (3, 9, 9, 3)
    wid: int = 64  # base width; L: 64 -> channels (64..1024)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        w, d = self.wid, self.dep
        x = Focus(w, name="stem")(x)
        x = BaseConv(w * 2, 3, 2, name="dark2.0")(x)
        x = CSPLayer(w * 2, d, name="dark2.1")(x)
        x = BaseConv(w * 4, 3, 2, name="dark3.0")(x)
        x = c3 = CSPLayer(w * 4, d * 3, name="dark3.1")(x)
        x = BaseConv(w * 8, 3, 2, name="dark4.0")(x)
        x = c4 = CSPLayer(w * 8, d * 3, name="dark4.1")(x)
        x = BaseConv(w * 16, 3, 2, name="dark5.0")(x)
        x = SPPBottleneck(w * 16, name="dark5.1")(x)
        c5 = CSPLayer(w * 16, d, shortcut=False, name="dark5.2")(x)
        return c3, c4, c5


def _upsample2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")


class YOLOPAFPN(nn.Module):
    dep: int = 3
    wid: int = 64

    @nn.compact
    def __call__(self, x):
        w, d = self.wid, self.dep
        c3, c4, c5 = CSPDarknet(d, w, name="backbone")(x)

        lat = BaseConv(w * 8, 1, name="lateral_conv0")(c5)
        p4 = CSPLayer(w * 8, d, shortcut=False, name="C3_p4")(
            jnp.concatenate([_upsample2(lat), c4], axis=-1))
        red = BaseConv(w * 4, 1, name="reduce_conv1")(p4)
        p3 = CSPLayer(w * 4, d, shortcut=False, name="C3_p3")(
            jnp.concatenate([_upsample2(red), c3], axis=-1))

        n3 = BaseConv(w * 4, 3, 2, name="bu_conv2")(p3)
        n3 = CSPLayer(w * 8, d, shortcut=False, name="C3_n3")(
            jnp.concatenate([n3, red], axis=-1))
        n4 = BaseConv(w * 8, 3, 2, name="bu_conv1")(n3)
        n4 = CSPLayer(w * 16, d, shortcut=False, name="C3_n4")(
            jnp.concatenate([n4, lat], axis=-1))
        return p3, n3, n4


class YOLOXHead(nn.Module):
    num_classes: int = 80
    wid: int = 64

    @nn.compact
    def __call__(self, feats) -> List[jnp.ndarray]:
        outs = []
        for i, f in enumerate(feats):
            x = BaseConv(self.wid * 4, 1, name=f"stems.{i}")(f)
            c = BaseConv(self.wid * 4, 3, name=f"cls_convs.{i}.0")(x)
            c = BaseConv(self.wid * 4, 3, name=f"cls_convs.{i}.1")(c)
            r = BaseConv(self.wid * 4, 3, name=f"reg_convs.{i}.0")(x)
            r = BaseConv(self.wid * 4, 3, name=f"reg_convs.{i}.1")(r)
            cls = nn.Conv(self.num_classes, (1, 1), name=f"cls_preds.{i}")(c)
            reg = nn.Conv(4, (1, 1), name=f"reg_preds.{i}")(r)
            obj = nn.Conv(1, (1, 1), name=f"obj_preds.{i}")(r)
            outs.append(jnp.concatenate([reg, obj, cls], axis=-1))
        return outs


class YOLOX(nn.Module):
    """640x640 letterboxed image -> (N, A, 5 + classes) decoded predictions
    in input-pixel units (cx, cy, w, h, obj, cls...)."""

    num_classes: int = 80
    dep: int = 3
    wid: int = 64

    @nn.compact
    def __call__(self, x):
        feats = YOLOPAFPN(self.dep, self.wid, name="backbone")(x)
        levels = YOLOXHead(self.num_classes, self.wid, name="head")(feats)
        decoded = []
        for out, stride in zip(levels, STRIDES):
            n, h, w, c = out.shape
            gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
            grid = jnp.stack([gx, gy], axis=-1).reshape(1, h * w, 2)
            flat = out.reshape(n, h * w, c)
            xy = (flat[..., :2] + grid) * stride
            wh = jnp.exp(flat[..., 2:4]) * stride
            rest = jax.nn.sigmoid(flat[..., 4:])
            decoded.append(jnp.concatenate([xy, wh, rest], axis=-1))
        return jnp.concatenate(decoded, axis=1)


# ---------------------------------------------------------------------------
# host-side pre/post processing
# ---------------------------------------------------------------------------

def letterbox(img: np.ndarray, size: int = INPUT_SIZE) -> Tuple[np.ndarray, float]:
    """BGR uint8 (H, W, 3) -> padded float32 (size, size, 3), scale ratio."""
    import cv2

    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    canvas = np.full((size, size, 3), 114.0, np.float32)
    canvas[:nh, :nw] = cv2.resize(img, (nw, nh),
                                  interpolation=cv2.INTER_LINEAR).astype(np.float32)
    return canvas, r


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float = 0.45) -> List[int]:
    """Greedy IoU NMS over xyxy boxes (host).

    Uses the legacy "+1" pixel-area convention of the reference's detector
    (DWPose/dwpose_utils/onnxdet.py:6-31) so borderline suppressions — and
    therefore which person's pose gets rasterized — match exactly.
    """
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= iou_thr]
    return keep


def postprocess_person(
    pred: np.ndarray, ratio: float,
    score_thr: float = 0.3, iou_thr: float = 0.45,
) -> np.ndarray:
    """Decoded (A, 85) predictions -> (k, 5) person boxes xyxy+score in
    original-image pixels."""
    scores = pred[:, 4] * pred[:, 5]  # obj * person-class
    mask = scores > score_thr
    if not mask.any():
        return np.zeros((0, 5), np.float32)
    sel, sc = pred[mask], scores[mask]
    cxy, wh = sel[:, :2], sel[:, 2:4]
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1) / ratio
    keep = nms(boxes, sc, iou_thr)
    return np.concatenate([boxes[keep], sc[keep, None]], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------

def load_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """YOLOX torch/ONNX state_dict -> flax variables.

    Keys look like ``backbone.backbone.dark2.0.conv.weight`` /
    ``head.cls_preds.0.weight`` — the module path matches our flax names with
    sequential indices folded into the name (``dark2.0``)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    # our flax names that embed a dot (they are single path components)
    def regroup(parts: List[str]) -> List[str]:
        out: List[str] = []
        i = 0
        while i < len(parts):
            p = parts[i]
            nxt = parts[i + 1] if i + 1 < len(parts) else None
            if nxt is not None and nxt.isdigit() and p in (
                "dark2", "dark3", "dark4", "dark5", "m", "stems",
                "cls_convs", "reg_convs", "cls_preds", "reg_preds", "obj_preds",
            ):
                if p in ("cls_convs", "reg_convs") and i + 2 < len(parts) and parts[i + 2].isdigit():
                    out.append(f"{p}.{nxt}.{parts[i + 2]}")
                    i += 3
                else:
                    out.append(f"{p}.{nxt}")
                    i += 2
            else:
                out.append(p)
                i += 1
        return out

    for key, val in sd.items():
        v = np.asarray(val)
        parts = key.split(".")
        pname = parts[-1]
        path = regroup(parts[:-1])
        if pname == "weight" and v.ndim == 4:  # conv
            put(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
        elif pname == "bias" and (not path or path[-1] != "bn"):
            put(params, path + ["bias"], v)
        elif path and path[-1] == "bn":
            if pname == "weight":
                put(params, path + ["scale"], v)
            elif pname == "bias":
                put(params, path + ["bias"], v)
            elif pname == "running_mean":
                put(stats, path + ["mean"], v)
            elif pname == "running_var":
                put(stats, path + ["var"], v)
    return {"params": params, "batch_stats": stats}


@functools.lru_cache(maxsize=4)
def _jitted_apply(model: "YOLOX"):
    # cached per model config: a fresh jit(partial(...)) per call would
    # re-trace and recompile the full YOLOX graph every frame
    return jax.jit(model.apply)


def detect_persons(variables, image_bgr: np.ndarray, model: YOLOX = None,
                   score_thr: float = 0.5) -> np.ndarray:
    """One image -> (k, 5) person boxes xyxy+score, largest first (reference
    semantics: score > 0.5 after NMS, area-descending —
    DWPose/dwpose_utils/onnxdet.py:103-144)."""
    model = model or YOLOX()
    inp, ratio = letterbox(image_bgr)
    pred = np.asarray(_jitted_apply(model)(variables, inp[None]))[0]
    boxes = postprocess_person(pred, ratio, score_thr)
    if len(boxes):
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        boxes = boxes[np.argsort(areas)[::-1]]
    return boxes
