"""Golden parity for frame metrics vs the reference's own torch code.

The reference's SSIM/PSNR (``metrics/utils/loss_utils.py``,
``metrics/utils/image_utils.py``) are pure torch and import cleanly; the eval
protocol (``scripts/eval_pose2img.py:267-272``) is only comparable if our
metric math matches theirs exactly, so this is exec-the-reference golden
coverage like the camera/context/snr tests.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from humanvid_tpu.metrics.frame import l1, psnr, ssim  # noqa: E402


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mods():
    loss_utils = _load("ref_loss_utils",
                       "/root/reference/metrics/utils/loss_utils.py")
    image_utils = _load("ref_image_utils",
                        "/root/reference/metrics/utils/image_utils.py")
    return loss_utils, image_utils


def _pair(seed, h=37, w=29):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, size=(2, 3, h, w)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, size=a.shape), 0, 1).astype(np.float32)
    return a, b


def test_golden_ssim(ref_mods):
    loss_utils, _ = ref_mods
    a, b = _pair(0)
    theirs = float(loss_utils.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    # ours takes NHWC
    ours = float(ssim(jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
                      jnp.asarray(np.transpose(b, (0, 2, 3, 1)))).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_golden_psnr_l1(ref_mods):
    _, image_utils = ref_mods
    a, b = _pair(1)
    theirs = image_utils.psnr(
        torch.from_numpy(a), torch.from_numpy(b)).numpy().ravel()
    ours = np.asarray(psnr(jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
                           jnp.asarray(np.transpose(b, (0, 2, 3, 1)))))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    # L1 protocol: plain mean absolute error (eval_pose2img.py:270)
    ours_l1 = np.asarray(l1(jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
                            jnp.asarray(np.transpose(b, (0, 2, 3, 1))))).mean()
    np.testing.assert_allclose(ours_l1, np.abs(a - b).mean(), rtol=1e-6)


def test_golden_frechet_distance():
    """frechet_from_features vs the reference's frechet_distance
    (metrics/utils/fvd.py compute_stats + scipy sqrtm) on random features."""
    fvd = _load("ref_fvd2", "/root/reference/metrics/utils/fvd.py")

    from humanvid_tpu.metrics.frechet import frechet_from_features

    rng = np.random.default_rng(13)
    a = rng.normal(size=(40, 16)).astype(np.float64)
    b = (rng.normal(size=(50, 16)) * 1.3 + 0.2).astype(np.float64)
    theirs = fvd.frechet_distance(a, b)
    ours = frechet_from_features([a], [b])
    np.testing.assert_allclose(ours, theirs, rtol=1e-8)


def test_golden_fvd_preprocess():
    """metrics.i3d preprocessing vs the reference's preprocess_single
    (metrics/utils/fvd.py:42-69): non-antialiased half-pixel bilinear to
    short-side 224 with ceil-rounded long side, center crop, [-1,1]."""
    fvd = _load("ref_fvd", "/root/reference/metrics/utils/fvd.py")

    from humanvid_tpu.metrics.i3d import preprocess_video

    rng = np.random.default_rng(7)
    for h, w in [(240, 426), (426, 240), (224, 224)]:
        vid = rng.uniform(0, 1, size=(4, h, w, 3)).astype(np.float32)
        theirs = fvd.preprocess_single(
            torch.from_numpy(np.transpose(vid, (3, 0, 1, 2)).copy()))
        theirs = np.transpose(theirs.numpy(), (1, 2, 3, 0))
        ours = preprocess_video(vid)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_golden_clip_preprocess():
    """clip_preprocess_np vs the installed transformers CLIPImageProcessor
    (the reference's exact preprocessing path,
    dance_image_h_v_camera.py:201,329) — bit-exact across aspect ratios."""
    transformers = pytest.importorskip("transformers")
    from PIL import Image

    from humanvid_tpu.data.datasets import clip_preprocess_np

    proc = transformers.CLIPImageProcessor()
    for seed, shape in [(0, (300, 500, 3)), (1, (500, 300, 3)),
                        (2, (224, 224, 3)), (3, (711, 123, 3))]:
        img = np.random.default_rng(seed).integers(
            0, 255, size=shape, dtype=np.uint8)
        theirs = proc(images=Image.fromarray(img),
                      return_tensors="np").pixel_values[0]
        ours = np.transpose(clip_preprocess_np(img), (2, 0, 1))
        np.testing.assert_array_equal(ours, theirs)
