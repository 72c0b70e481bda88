"""Single-image pose2img inference CLI.

Behavioral parity: reference ``scripts/pose2img.py`` — walks ``test_cases``
{ref_image_path: [pose_image_path, ...]}, builds the Plücker embedding from
the camera file next to each pose (static-camera fallback), runs the stage-1
sampler, saves ref | pose | output composites.
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

from humanvid_tpu.data.datasets import clip_crop_raw
from humanvid_tpu.data.camera import camera_file_to_plucker
from humanvid_tpu.data.video_io import resize_frames
from humanvid_tpu.pipelines import CamAnimate, CamAnimateConfig, Pose2ImagePipeline
from humanvid_tpu.utils.config import load_config
from humanvid_tpu.utils.weights import load_pretrained_params


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("-W", type=int, default=512)
    p.add_argument("-H", type=int, default=896)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cfg", type=float, default=3.5)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--output_dir", default="./output/pose2img")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    return p.parse_args()


def main():
    import cv2

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
    pipe = Pose2ImagePipeline(system, params)

    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    for ref_path, pose_paths in cfg.test_cases.items():
        ref_raw = cv2.cvtColor(cv2.imread(ref_path), cv2.COLOR_BGR2RGB)
        for pose_path in pose_paths:
            pose_raw = cv2.cvtColor(cv2.imread(pose_path), cv2.COLOR_BGR2RGB)
            ph, pw = pose_raw.shape[:2]
            if pw > ph:
                W, H = max(args.W, args.H), min(args.W, args.H)
            else:
                W, H = min(args.W, args.H), max(args.W, args.H)

            ref = resize_frames(ref_raw[None], W, H)[0].astype(np.float32) / 255.0
            pose = resize_frames(pose_raw[None], W, H)[0].astype(np.float32) / 255.0
            clip_raw = clip_crop_raw(ref_raw, clip_sz)
            plucker = camera_file_to_plucker(
                pose_path, 1, 0, [0], (W, H), is_same_video=False
            )[0]

            rng, sub = jax.random.split(rng)
            out = pipe(
                ref, pose, plucker, clip_raw,
                num_inference_steps=args.steps, guidance_scale=args.cfg, rng=sub,
            )
            composite = np.concatenate([ref, pose, out.images[0]], axis=1)
            name = (
                os.path.splitext(os.path.basename(ref_path))[0]
                + "_" + os.path.splitext(os.path.basename(pose_path))[0]
            )
            cv2.imwrite(
                os.path.join(args.output_dir, f"{name}.png"),
                cv2.cvtColor((composite * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
            print(f"saved {name}.png")


if __name__ == "__main__":
    main()
