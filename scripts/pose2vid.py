"""Long-video camera-aware inference CLI.

Behavioral parity: reference ``scripts/pose2vid.py`` — same argparse surface
(-W -H -L --seed --cfg --steps --repeat --fps --config), same ``test_cases``
config schema ({ref_image_path: [pose_video_path, ...]}), orientation-adaptive
W/H (``:223-230``), strided frame selection (``:233-243``), camera file via
path substitution with static-camera fallback (``:53-83``), ref/pose/output
grid saving.
"""

import argparse
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

from humanvid_tpu.data.camera import camera_file_to_plucker
from humanvid_tpu.data.datasets import clip_crop_raw
from humanvid_tpu.data.video_io import get_fps, read_frames, resize_frames, save_videos_grid
from humanvid_tpu.pipelines import CamAnimate, CamAnimateConfig, Pose2VideoPipeline
from humanvid_tpu.utils.config import load_config
from humanvid_tpu.utils.weights import load_pretrained_params


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("-W", type=int, default=512)
    p.add_argument("-H", type=int, default=896)
    p.add_argument("-L", type=int, default=24)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cfg", type=float, default=3.5)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--fps", type=int, default=None)
    p.add_argument("--output_dir", default="./output/pose2vid")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--cfg_mode", default="batched", choices=["batched", "sequential"],
                   help="sequential: two W-row UNet passes (lower peak memory)")
    p.add_argument("--window_mode", default="batched", choices=["batched", "sequential"],
                   help="sequential: one context window per UNet pass — the "
                        "single-chip mode for clips longer than one window")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if cfg.get("model") == "tiny":  # CPU smoke tests of the CLI surface
        from humanvid_tpu.pipelines.system import tiny_config
        system = CamAnimate(tiny_config(motion_max_len=24), dtype=dtype)
    else:
        system = CamAnimate(CamAnimateConfig(), dtype=dtype)
    clip_sz = system.config.clip.image_size
    params = load_pretrained_params(system, cfg)
    pipe = Pose2VideoPipeline(system, params)

    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    for ref_path, pose_paths in cfg.test_cases.items():
        for pose_path in pose_paths:
            pose_frames = read_frames(pose_path)
            ph, pw = pose_frames.shape[1:3]
            # orientation-adaptive size (reference :223-230)
            if pw > ph:
                W, H = max(args.W, args.H), min(args.W, args.H)
            else:
                W, H = min(args.W, args.H), max(args.W, args.H)

            total = len(pose_frames)
            stride = max(total // args.L, 1)
            tgt_idx = list(range(0, min(args.L * stride, total), stride))[: args.L]
            pose = resize_frames(pose_frames[tgt_idx], W, H).astype(np.float32) / 255.0

            import cv2
            ref_img_raw = cv2.cvtColor(cv2.imread(ref_path), cv2.COLOR_BGR2RGB)
            ref = resize_frames(ref_img_raw[None], W, H)[0].astype(np.float32) / 255.0
            # pipeline CLIP input is raw [0,1] at 224 (it normalizes internally)
            clip_raw = clip_crop_raw(ref_img_raw, clip_sz)

            plucker = camera_file_to_plucker(
                pose_path, total, tgt_idx[0], tgt_idx, (W, H), is_same_video=False
            )

            for r in range(args.repeat):
                rng, sub = jax.random.split(rng)
                out = pipe(
                    ref, pose, plucker, clip_raw,
                    num_inference_steps=args.steps,
                    guidance_scale=args.cfg,
                    cfg_mode=args.cfg_mode,
                    window_mode=args.window_mode,
                    rng=sub,
                )
                name = (
                    os.path.splitext(os.path.basename(ref_path))[0]
                    + "_"
                    + os.path.splitext(os.path.basename(pose_path))[0]
                    + (f"_r{r}" if args.repeat > 1 else "")
                )
                fps = args.fps or get_fps(pose_path) / stride
                ref_vid = np.repeat(ref[None], len(tgt_idx), axis=0)
                save_videos_grid(
                    [ref_vid, pose, out.videos[0]],
                    os.path.join(args.output_dir, f"{name}.mp4"),
                    fps=fps,
                )
                print(f"saved {name}.mp4 ({len(tgt_idx)} frames @ {fps:.1f} fps)")


if __name__ == "__main__":
    main()
