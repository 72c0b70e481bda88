"""Stage-2 quantitative evaluation: generate test clips for offline FID/FVD.

Behavioral parity: reference ``scripts/eval_pose2vid.py`` — per test clip,
generate a 24-frame stride-3 video (``:242-250``) with the reference frame
taken from the middle of the clip (``:261``), save generated and GT videos
side by side; then run ``humanvid_tpu.metrics.runner`` (or the reference's
metrics/ drivers) over the two directories.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from humanvid_tpu.ops.attention import set_default_attention_backend

set_default_attention_backend("auto")  # pallas flash attn for long spatial seqs

import jax
import jax.numpy as jnp
import numpy as np

from humanvid_tpu.data.camera import (
    get_relative_pose,
    intrinsics_vector,
    load_cameras,
    ray_condition,
    static_camera,
)
from humanvid_tpu.data.datasets import _camera_file, clip_crop_raw
from humanvid_tpu.data.video_io import read_frames, resize_frames, save_video
from humanvid_tpu.pipelines import CamAnimate, CamAnimateConfig, Pose2VideoPipeline
from humanvid_tpu.utils.config import load_config
from humanvid_tpu.utils.weights import load_pretrained_params


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--test_meta", required=True)
    p.add_argument("-W", type=int, default=512)
    p.add_argument("-H", type=int, default=896)
    p.add_argument("-L", type=int, default=24)
    p.add_argument("--stride", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cfg", type=float, default=3.5)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--output_dir", default="./output/eval_pose2vid")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--run_metrics", action="store_true",
                   help="run frame metrics over gen/gt dirs after generation")
    p.add_argument("--metrics_only", action="store_true",
                   help="skip generation and run metrics over an existing "
                        "output_dir (resume after a transient failure)")
    p.add_argument("--metrics_subset", default=None,
                   help="comma list of metric groups (frame,lpips,fid,fvd,"
                        "clip) to compute this run; results merge into "
                        "metrics.json so groups can run as separate retried "
                        "processes")
    p.add_argument("--metric_weights", default=None,
                   help="directory of metric-net torch checkpoints "
                        "(metrics/weights.py layout); enables FID/FVD/LPIPS/"
                        "CLIP-sim on top of the weight-free frame metrics")
    return p.parse_args()


def main():
    import cv2

    args = parse_args()
    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    gen_dir = os.path.join(args.output_dir, "gen")
    gt_dir = os.path.join(args.output_dir, "gt")

    groups = (args.metrics_subset.split(",") if args.metrics_subset else None)

    if args.metrics_only:
        from humanvid_tpu.metrics.runner import evaluate_dirs
        from humanvid_tpu.metrics.weights import load_metric_nets
        result = evaluate_dirs(
            gen_dir, gt_dir, out_json=os.path.join(args.output_dir, "metrics.json"),
            merge=groups is not None, groups=groups,
            **load_metric_nets(args.metric_weights),
        )
        print("metrics:", result)
        return

    if cfg.get("model") == "tiny":  # CPU smoke tests of the CLI surface
        from humanvid_tpu.pipelines.system import tiny_config
        system = CamAnimate(tiny_config(motion_max_len=24), dtype=dtype)
    else:
        system = CamAnimate(CamAnimateConfig(), dtype=dtype)
    clip_sz = system.config.clip.image_size
    params = load_pretrained_params(system, cfg)
    pipe = Pose2VideoPipeline(system, params)

    with open(args.test_meta) as f:
        meta = json.load(f)

    os.makedirs(gen_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    for entry in meta:
        video_path, kps_path = entry["video_path"], entry["kps_path"]
        start = entry.get("start_frame", 0)
        end = entry["end_frame"]
        # reduce the stride for short segments instead of clamping indices
        # into a frozen duplicated tail (which would skew FVD/SSIM silently)
        stride = min(args.stride, max(1, (end - start - 1) // max(args.L - 1, 1)))
        tgt_idx = [min(start + i * stride, end - 1) for i in range(args.L)]
        ref_idx = tgt_idx[len(tgt_idx) // 2]  # middle frame (":261")

        gt_frames = read_frames(video_path, indices=tgt_idx)
        ref_raw = read_frames(video_path, indices=[ref_idx])[0]
        pose_frames = read_frames(kps_path, indices=tgt_idx)

        h, w = gt_frames.shape[1:3]
        if w > h:
            W, H = max(args.W, args.H), min(args.W, args.H)
        else:
            W, H = min(args.W, args.H), max(args.W, args.H)

        gt = resize_frames(gt_frames, W, H).astype(np.float32) / 255.0
        ref = resize_frames(ref_raw[None], W, H)[0].astype(np.float32) / 255.0
        pose = resize_frames(pose_frames, W, H).astype(np.float32) / 255.0
        clip_raw = clip_crop_raw(ref_raw, clip_sz)

        cam_file = _camera_file(video_path)
        if os.path.exists(cam_file):
            cams = load_cameras(cam_file, (W, H))
        else:
            cams = static_camera((W, H), max(tgt_idx) + 1)
        sel = [cams[ref_idx]] + [cams[i] for i in tgt_idx]
        K = intrinsics_vector(sel[1:], (W, H))
        c2w = get_relative_pose(sel)[1:]
        plucker = ray_condition(K, c2w, H, W)

        rng, sub = jax.random.split(rng)
        out = pipe(ref, pose, plucker, clip_raw,
                   num_inference_steps=args.steps, guidance_scale=args.cfg,
                   rng=sub)
        name = os.path.splitext(os.path.basename(video_path))[0]
        save_video(out.videos[0], os.path.join(gen_dir, f"{name}.mp4"), fps=8.0)
        save_video(gt, os.path.join(gt_dir, f"{name}.mp4"), fps=8.0)
        print(f"generated {name}.mp4 ({args.L} frames)")

    if args.run_metrics:
        from humanvid_tpu.metrics.runner import evaluate_dirs
        from humanvid_tpu.metrics.weights import load_metric_nets
        result = evaluate_dirs(
            gen_dir, gt_dir, out_json=os.path.join(args.output_dir, "metrics.json"),
            merge=groups is not None, groups=groups,
            **load_metric_nets(args.metric_weights),
        )
        print("metrics:", result)


if __name__ == "__main__":
    main()
