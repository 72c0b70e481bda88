"""Inference/eval CLI smoke tests: tiny model, synthetic data, CPU.

Drives the four driver scripts end-to-end through their argparse surface
(`model: tiny` in the config swaps in the small topology; weight paths are
omitted so params stay randomly initialized — the reference CLI behavior and
output artifacts are what is under test, not sample quality).
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    import cv2

    from humanvid_tpu.data.video_io import save_video

    root = tmp_path_factory.mktemp("cli_data")
    (root / "ref_images").mkdir()
    (root / "pose_videos").mkdir()
    (root / "videos").mkdir()
    (root / "dwpose").mkdir()

    rng = np.random.default_rng(0)
    F, H, W = 8, 48, 32  # vertical

    ref = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(root / "ref_images" / "ref.png"), ref)
    pose_img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(root / "ref_images" / "pose.png"), pose_img)

    save_video(rng.random((F, H, W, 3)).astype(np.float32),
               str(root / "pose_videos" / "dance.mp4"), fps=8.0)
    # gt video + dwpose pair for the eval drivers (same length)
    save_video(rng.random((F, H, W, 3)).astype(np.float32),
               str(root / "videos" / "clip.mp4"), fps=8.0)
    save_video(rng.random((F, H, W, 3)).astype(np.float32),
               str(root / "dwpose" / "clip.mp4"), fps=8.0)

    meta = [{"video_path": str(root / "videos" / "clip.mp4"),
             "kps_path": str(root / "dwpose" / "clip.mp4"),
             "start_frame": 0, "end_frame": F}]
    meta_path = root / "test_meta.json"
    meta_path.write_text(json.dumps(meta))
    return root, str(meta_path)


def _config(tmp_path, root, test_cases):
    cfg = {"model": "tiny", "test_cases": test_cases}
    path = tmp_path / "prompts.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_pose2img_cli(cli_data, tmp_path, monkeypatch):
    from scripts import pose2img

    root, _ = cli_data
    cfg = _config(tmp_path, root,
                  {str(root / "ref_images" / "ref.png"):
                   [str(root / "ref_images" / "pose.png")]})
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "pose2img.py", "--config", cfg, "-W", "32", "-H", "48",
        "--steps", "2", "--output_dir", str(out), "--dtype", "float32",
    ])
    pose2img.main()
    assert (out / "ref_pose.png").exists()


def test_pose2vid_cli(cli_data, tmp_path, monkeypatch):
    from scripts import pose2vid

    root, _ = cli_data
    cfg = _config(tmp_path, root,
                  {str(root / "ref_images" / "ref.png"):
                   [str(root / "pose_videos" / "dance.mp4")]})
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "pose2vid.py", "--config", cfg, "-W", "32", "-H", "48", "-L", "4",
        "--steps", "2", "--output_dir", str(out), "--dtype", "float32",
    ])
    pose2vid.main()
    assert (out / "ref_dance.mp4").exists()


def test_eval_pose2img_cli(cli_data, tmp_path, monkeypatch):
    from scripts import eval_pose2img

    root, meta = cli_data
    cfg = _config(tmp_path, root, {})
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "eval_pose2img.py", "--config", cfg, "--test_meta", meta,
        "-W", "32", "-H", "48", "--steps", "2", "--eval_distance", "2",
        "--output_dir", str(out), "--dtype", "float32",
    ])
    eval_pose2img.main()
    results = json.load(open(out / "metrics.json"))
    assert results["summary"]["num_videos"] == 1, results
    assert np.isfinite(results["summary"]["ssim"]), results


def test_eval_pose2vid_cli(cli_data, tmp_path, monkeypatch):
    from scripts import eval_pose2vid

    root, meta = cli_data
    cfg = _config(tmp_path, root, {})
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "eval_pose2vid.py", "--config", cfg, "--test_meta", meta,
        "-W", "32", "-H", "48", "-L", "4", "--stride", "1",
        "--steps", "2", "--output_dir", str(out), "--dtype", "float32",
    ])
    eval_pose2vid.main()
    assert (out / "gen" / "clip.mp4").exists()
    assert (out / "gt" / "clip.mp4").exists()

    # resume path: metrics over the existing output dir without regenerating
    # (tools/eval_gate.py retries the metrics phase this way after a
    # transient device failure)
    monkeypatch.setattr(sys, "argv", [
        "eval_pose2vid.py", "--config", cfg, "--test_meta", meta,
        "--output_dir", str(out), "--run_metrics", "--metrics_only",
    ])
    eval_pose2vid.main()
    results = json.load(open(out / "metrics.json"))
    assert results["num_videos"] == 1, results
    assert np.isfinite(results["ssim"]), results

    # per-group subset runs merge into one metrics.json (eval_gate splits
    # the metric stack into independently retried subprocesses this way)
    (out / "metrics.json").unlink()
    for group in ("frame", "clip"):
        monkeypatch.setattr(sys, "argv", [
            "eval_pose2vid.py", "--config", cfg, "--test_meta", meta,
            "--output_dir", str(out), "--run_metrics", "--metrics_only",
            "--metrics_subset", group,
        ])
        eval_pose2vid.main()
    merged = json.load(open(out / "metrics.json"))
    assert np.isfinite(merged["ssim"]), merged  # from the "frame" run
    assert merged["num_videos"] == 1, merged
