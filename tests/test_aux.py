"""Auxiliary subsystems: latent interpolation, meta tools, visualization,
profiling timers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_slerp_endpoints_and_midpoint():
    from humanvid_tpu.pipelines.interpolation import slerp

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), np.asarray(b), atol=1e-5)
    # parallel vectors -> linear fallback
    np.testing.assert_allclose(
        np.asarray(slerp(a, a * 1.0 + 0.0, 0.5)), np.asarray(a), atol=1e-5)


def test_interpolate_latents_layout():
    from humanvid_tpu.pipelines.interpolation import interpolate_latents

    f, rate = 4, 3
    lat = jnp.arange(f, dtype=jnp.float32)[:, None, None, None] * jnp.ones((1, 2, 2, 1))
    out = interpolate_latents(lat, rate, mode="linear")
    assert out.shape[0] == f + (f - 1) * (rate - 1)
    vals = np.asarray(out)[:, 0, 0, 0]
    # linear interpolation of a ramp is a finer ramp
    np.testing.assert_allclose(vals, np.linspace(0, f - 1, len(vals)), atol=1e-5)


def test_interpolate_rate1_identity():
    from humanvid_tpu.pipelines.interpolation import interpolate_latents

    lat = jnp.ones((3, 2, 2, 4))
    assert interpolate_latents(lat, 1) is lat


def _write_clip(path, f=12, h=48, w=64):
    from humanvid_tpu.data.video_io import save_video

    rng = np.random.default_rng(0)
    save_video(rng.random((f, h, w, 3)).astype(np.float32), str(path), fps=6.0)


def test_meta_tools_roundtrip(tmp_path):
    from humanvid_tpu.data.meta_tools import (
        extract_meta, merge_meta, save_meta, segment_meta, split_by_orientation,
    )

    videos = tmp_path / "src" / "videos"
    dwpose = tmp_path / "src" / "dwpose"
    camera = tmp_path / "src" / "camera"
    for d in (videos, dwpose, camera):
        d.mkdir(parents=True)
    _write_clip(videos / "a.mp4")
    _write_clip(dwpose / "a.mp4")
    (camera / "a.txt").write_text(
        "\n".join("0 0 0 0 0 0 0 1 1.0 1.788 1.0" for _ in range(12)) + "\n")
    # clip with no kps sibling -> skipped
    _write_clip(videos / "b.mp4")

    entries = extract_meta(str(videos))
    assert len(entries) == 1 and entries[0]["end_frame"] == 12

    segs = segment_meta(entries, segment_seconds=1.0, min_frames=5)
    assert all(e["end_frame"] - e["start_frame"] >= 5 for e in segs)

    split = split_by_orientation(entries)
    assert len(split["horizontal"]) == 1 and not split["vertical"]

    p1 = tmp_path / "m1.json"
    save_meta(entries, str(p1))
    merged = merge_meta([str(p1), str(p1)], str(tmp_path / "m.json"))
    assert len(merged) == 2


def test_visualization_pca_and_composite(tmp_path):
    from humanvid_tpu.data.visualization import pca_visualize, sample_composite, to_image

    rng = np.random.default_rng(0)
    plk = rng.normal(size=(2, 16, 16, 6)).astype(np.float32)
    rgb = pca_visualize(plk)
    assert rgb.shape == (2, 16, 16, 3) and rgb.dtype == np.uint8

    img = to_image(rng.normal(size=(3, 8, 8)).astype(np.float32))
    assert img.shape == (8, 8, 3)

    sample = {
        "ref": rng.normal(size=(16, 16, 3)).astype(np.float32),
        "tgt": rng.normal(size=(16, 16, 3)).astype(np.float32),
        "pose": rng.random((16, 16, 3)).astype(np.float32),
        "plucker": plk[0],
    }
    row = sample_composite(sample, str(tmp_path / "s.png"))
    assert row.ndim == 3 and os.path.exists(tmp_path / "s.png")


def test_step_timers_accumulate(caplog):
    import logging

    from humanvid_tpu.utils.profiling import StepTimers

    t = StepTimers(total_steps=100, log_every=2)
    with t.segment("data"):
        pass
    with t.segment("step"):
        pass
    with caplog.at_level(logging.INFO, logger="humanvid_tpu.utils.profiling"):
        t.step(1, loss=0.5)   # not logged (1 % 2)
        t.step(2, loss=0.25)  # logged
    assert t.averages().keys() == {"data", "step"}
    assert any("step 2/100" in r.getMessage() for r in caplog.records)


def test_packed_device_put_roundtrip():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humanvid_tpu.utils.transfer import packed_device_put

    rng = np.random.default_rng(0)
    tree = {
        "a": rng.normal(size=(3, 5)).astype(np.float32),
        "b": {"w": rng.normal(size=(7,)).astype(np.float32),
              "bf": jnp.asarray(rng.normal(size=(4, 2)), jnp.bfloat16),
              "i": np.arange(6, dtype=np.int32).reshape(2, 3)},
    }
    out = packed_device_put(tree)
    assert isinstance(out["a"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(out["b"]["w"]), tree["b"]["w"])
    np.testing.assert_array_equal(
        np.asarray(out["b"]["bf"], np.float32),
        np.asarray(tree["b"]["bf"], np.float32))
    np.testing.assert_array_equal(np.asarray(out["b"]["i"]), tree["b"]["i"])


class _SlowDataset:
    def __init__(self, delay=0.05):
        self.delay = delay

    def __getitem__(self, i):
        import time as _t
        _t.sleep(self.delay)
        if i == 999:
            raise ValueError("poison sample")
        import numpy as _np
        return {"x": _np.full((2,), i, _np.float32)}


def test_loader_pipelines_samples_in_order():
    """The r4 sample-pipelined producer must preserve batch order and
    saturate the pool across batch boundaries (batch_size 1)."""
    import time as _t

    import numpy as _np

    from humanvid_tpu.data.loader import Loader

    batches = [[i] for i in range(16)]
    t0 = _t.time()
    out = [b["x"][0, 0] for b in Loader(_SlowDataset(0.05), batches,
                                        num_workers=8, prefetch=2)]
    wall = _t.time() - t0
    assert out == [float(i) for i in range(16)]
    # serial would be >= 16 * 0.05 = 0.8 s; pipelined across 8 workers
    # should land well under half of that
    assert wall < 0.6, wall


def test_loader_propagates_worker_exception():
    import pytest as _pytest

    from humanvid_tpu.data.loader import Loader

    batches = [[1], [999], [2]]
    with _pytest.raises(ValueError, match="poison"):
        list(Loader(_SlowDataset(0.0), batches, num_workers=2, prefetch=1))


def test_loader_early_break_releases_producer():
    from humanvid_tpu.data.loader import Loader

    batches = [[i] for i in range(100)]
    it = iter(Loader(_SlowDataset(0.01), batches, num_workers=4, prefetch=2))
    next(it)
    del it  # generator close -> stop event; must not hang interpreter exit
