"""DWPose subsystem: YOLOX, RTMPose, remapping, drawing, ONNX reader."""

import struct

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


# --- ONNX reader (hand-encoded protobuf round trip) -------------------------

def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint(num << 3 | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def test_onnx_reader_roundtrip(tmp_path):
    from humanvid_tpu.pose.onnx_reader import read_onnx_initializers

    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    tensor = (
        _field(1, 0, _varint(3)) + _field(1, 0, _varint(4))   # dims
        + _field(2, 0, _varint(1))                             # float32
        + _len_field(8, b"conv.weight")                        # name
        + _len_field(9, w.tobytes())                           # raw_data
    )
    bias = (
        _field(1, 0, _varint(2))
        + _field(2, 0, _varint(7))                             # int64
        + _len_field(8, b"bias")
        + _len_field(9, np.array([7, -1], np.int64).tobytes())
    )
    graph = _len_field(5, tensor) + _len_field(5, bias)
    model = _len_field(7, graph)
    path = tmp_path / "m.onnx"
    path.write_bytes(model)

    tensors = read_onnx_initializers(str(path))
    np.testing.assert_array_equal(tensors["conv.weight"], w)
    np.testing.assert_array_equal(tensors["bias"], [7, -1])


def test_onnx_reader_real_torch_export(tmp_path):
    """Read a file produced by torch's REAL ONNX protobuf encoder (the C++
    serializer behind torch.onnx.export), not a hand-encoded message — guards
    the raw-protobuf reader against official field layout/ordering. The
    reference consumes such files through onnxruntime
    (/root/reference/src/dwpose/wholebody.py:14-27)."""
    import torch
    from torch import nn

    from humanvid_tpu.pose.onnx_reader import read_onnx_initializers

    # the final export step imports the `onnx` package only to inline
    # onnxscript custom functions (none here); skip it offline
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto
    try:
        torch.manual_seed(0)
        m = nn.Sequential(
            nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8), nn.SiLU(),
            nn.Conv2d(8, 4, 1),
        )
        m.eval()
        with torch.no_grad():
            m[1].running_mean.normal_()
            m[1].running_var.uniform_(0.5, 2.0)
        path = str(tmp_path / "real.onnx")
        torch.onnx.export(m, (torch.randn(1, 3, 16, 16),), path, dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig

    tensors = read_onnx_initializers(path)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}

    # unfused conv comes through bit-exact
    np.testing.assert_array_equal(tensors["3.weight"], sd["3.weight"])
    np.testing.assert_array_equal(tensors["3.bias"], sd["3.bias"])

    # the exporter folds BN into the first conv; verify the folded weights
    # numerically against manual folding of the original parameters
    fused_w = next(v for k, v in tensors.items()
                   if v.ndim == 4 and v.shape == (8, 3, 3, 3))
    fused_b = next(v for k, v in tensors.items() if v.shape == (8,))
    inv_std = 1.0 / np.sqrt(sd["1.running_var"] + 1e-5)
    want_w = sd["0.weight"] * (sd["1.weight"] * inv_std)[:, None, None, None]
    want_b = (sd["0.bias"] - sd["1.running_mean"]) * sd["1.weight"] * inv_std \
        + sd["1.bias"]
    np.testing.assert_allclose(fused_w, want_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fused_b, want_b, rtol=1e-5, atol=1e-6)


# --- YOLOX -------------------------------------------------------------------

def test_yolox_decode_shapes(rng):
    from humanvid_tpu.pose.yolox import YOLOX

    model = YOLOX(dep=1, wid=8)  # tiny topology, same structure
    x = jax.random.uniform(rng, (1, 128, 128, 3)) * 255
    variables = model.init(rng, x)
    pred = model.apply(variables, x)
    # anchors = sum over strides (s/8)^2 + (s/16)^2 + (s/32)^2
    assert pred.shape == (1, 16 * 16 + 8 * 8 + 4 * 4, 85)
    assert np.isfinite(np.asarray(pred)).all()
    # decoded obj/cls are probabilities
    assert (np.asarray(pred[..., 4:]) >= 0).all() and (np.asarray(pred[..., 4:]) <= 1).all()


def test_yolox_nms_and_postprocess():
    from humanvid_tpu.pose.yolox import nms, postprocess_person

    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    keep = nms(boxes, np.array([0.9, 0.8, 0.7], np.float32), iou_thr=0.5)
    assert keep == [0, 2]

    pred = np.zeros((4, 85), np.float32)
    pred[0] = [5, 5, 10, 10, 0.9] + [0.9] + [0.0] * 79      # strong person
    pred[1] = [5.5, 5, 10, 10, 0.85] + [0.85] + [0.0] * 79  # duplicate
    pred[2] = [55, 55, 10, 10, 0.9] + [0.05] + [0.0] * 79   # low person score
    out = postprocess_person(pred, ratio=0.5, score_thr=0.3)
    assert out.shape == (1, 5)
    np.testing.assert_allclose(out[0, :4], [0, 0, 20, 20], atol=1e-4)


def test_yolox_letterbox():
    from humanvid_tpu.pose.yolox import letterbox

    img = np.full((100, 200, 3), 255, np.uint8)
    canvas, r = letterbox(img, 640)
    assert canvas.shape == (640, 640, 3)
    assert r == 640 / 200
    assert canvas[:320, :640].mean() > 200    # image area
    assert abs(canvas[400:, :].mean() - 114) < 1  # padding


# --- RTMPose -----------------------------------------------------------------

def test_rtmpose_simcc_shapes(rng):
    from humanvid_tpu.pose import rtmpose

    model = rtmpose.DWPoseModel()
    x = jax.random.normal(rng, (1, rtmpose.INPUT_H, rtmpose.INPUT_W, 3))
    variables = model.init(rng, x)
    xl, yl = model.apply(variables, x)
    assert xl.shape == (1, 133, 576)
    assert yl.shape == (1, 133, 768)

    kpts, scores = rtmpose.simcc_decode(np.asarray(xl), np.asarray(yl))
    assert kpts.shape == (1, 133, 2) and scores.shape == (1, 133)
    assert (kpts[scores > 0][:, 0] <= rtmpose.INPUT_W).all()


def test_rtmpose_crop_roundtrip():
    from humanvid_tpu.pose import rtmpose

    img = np.zeros((400, 600, 3), np.uint8)
    box = np.array([100, 50, 300, 350], np.float32)
    center, scale = rtmpose.bbox_to_center_scale(box)
    np.testing.assert_allclose(center, [200, 200])
    # aspect ratio enforced to model input
    assert abs(scale[0] / scale[1] - rtmpose.INPUT_W / rtmpose.INPUT_H) < 1e-5

    _, (c, s) = rtmpose.crop_affine(img, center, scale)
    # crop center maps back to bbox center
    mid = np.array([[rtmpose.INPUT_W / 2, rtmpose.INPUT_H / 2]], np.float32)
    back = rtmpose.crop_to_image(mid, c, s)
    np.testing.assert_allclose(back[0], center, atol=1e-3)


# --- wholebody remap + drawing ------------------------------------------------

def test_wholebody_to_openpose_and_draw():
    from humanvid_tpu.pose import to_draw_format, wholebody_to_openpose

    rng = np.random.default_rng(0)
    kpts = rng.uniform(10, 100, (2, 133, 2)).astype(np.float32)
    scores = np.ones((2, 133), np.float32)
    scores[0, 5] = 0.0  # left shoulder invisible -> neck low conf

    pose = wholebody_to_openpose(kpts, scores)
    assert pose["bodies"].shape == (2, 18, 2)
    assert pose["hands"].shape == (4, 21, 2)  # 2 people x 2 hands
    assert pose["faces"].shape == (2, 68, 2)
    assert pose["feet"].shape == (2, 6, 2)
    np.testing.assert_allclose(
        pose["bodies"][1, 1], (kpts[1, 5] + kpts[1, 6]) / 2)

    drawable = to_draw_format(pose, 128, 128)
    assert drawable["bodies"]["subset"][0, 1] == -1  # masked neck
    from humanvid_tpu.data.pose_draw import draw_pose
    canvas = draw_pose(drawable, 128, 128)
    assert canvas.shape == (128, 128, 3) and canvas.max() > 0


def test_smplx_mapping():
    from humanvid_tpu.pose.smplx import SMPLX_TO_COCO_WHOLEBODY, render_frame, smplx_to_coco_wholebody

    # wrists (smplx 20/21) legitimately appear in both body17 and hand21
    assert len(set(SMPLX_TO_COCO_WHOLEBODY.tolist())) == 131
    rng = np.random.default_rng(0)
    smplx = rng.uniform(5, 120, (144, 2)).astype(np.float32)
    k, s = smplx_to_coco_wholebody(smplx)
    assert k.shape == (1, 133, 2) and s.shape == (1, 133)
    np.testing.assert_allclose(k[0, 0], smplx[55])  # nose
    canvas = render_frame(k, s, 128, 128)
    assert canvas.max() > 0
