"""Stage-1 quantitative evaluation: pose2img over test videos + frame metrics.

Behavioral parity: reference ``scripts/eval_pose2img.py`` — for each test
video, pick a reference frame and target frames at least ``--eval_distance``
apart (``:231-239``), generate with the stage-1 sampler, compute
SSIM/PSNR/LPIPS/L1 inline against the GT frames (``:267-272``), dump a JSON
summary (``:291-299``).

Test set schema: a meta JSON list of ``{video_path, kps_path, start_frame,
end_frame}`` entries (the same format as training meta; build with tools/).
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
from humanvid_tpu.data.video_io import read_frames, resize_frames
from humanvid_tpu.metrics import l1, psnr, ssim
from humanvid_tpu.pipelines import CamAnimate, CamAnimateConfig, Pose2ImagePipeline
from humanvid_tpu.utils.config import load_config
from humanvid_tpu.utils.weights import load_pretrained_params


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--test_meta", required=True, help="meta JSON of test clips")
    p.add_argument("-W", type=int, default=512)
    p.add_argument("-H", type=int, default=896)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cfg", type=float, default=3.5)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--eval_distance", type=int, default=30)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--output_dir", default="./output/eval_pose2img")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--lpips_weights", default=None,
                   help="converted LPIPS weights (msgpack/npz); omit to skip LPIPS")
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
    pipe = Pose2ImagePipeline(system, params)

    lpips_vars = None
    if args.lpips_weights:
        from humanvid_tpu.utils.weights import load_msgpack_tree
        lpips_vars = load_msgpack_tree(args.lpips_weights)

    with open(args.test_meta) as f:
        meta = json.load(f)

    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    per_video = []

    for entry in meta:
        video_path, kps_path = entry["video_path"], entry["kps_path"]
        start = entry.get("start_frame", 0)
        end = entry.get("end_frame", None)
        # ref = first frame of the segment; tgt = ref + eval_distance (":231-239")
        ref_idx = start
        tgt_idx = min(ref_idx + args.eval_distance, (end or start + args.eval_distance + 1) - 1)

        vid = read_frames(video_path, indices=[ref_idx, tgt_idx])
        pose_img = read_frames(kps_path, indices=[tgt_idx])[0]
        h, w = vid.shape[1:3]
        if w > h:
            W, H = max(args.W, args.H), min(args.W, args.H)
        else:
            W, H = min(args.W, args.H), max(args.W, args.H)

        ref = resize_frames(vid[:1], W, H)[0].astype(np.float32) / 255.0
        gt = resize_frames(vid[1:], W, H)[0].astype(np.float32) / 255.0
        pose = resize_frames(pose_img[None], W, H)[0].astype(np.float32) / 255.0
        import cv2
        clip_raw = clip_crop_raw(vid[0], clip_sz)

        cam_file = _camera_file(video_path)
        if os.path.exists(cam_file):
            cams = load_cameras(cam_file, (W, H))
        else:
            cams = static_camera((W, H), tgt_idx + 1)
        sel = [cams[ref_idx], cams[tgt_idx]]
        K = intrinsics_vector(sel[1:], (W, H))
        c2w = get_relative_pose(sel)[1:]
        plucker = ray_condition(K, c2w, H, W)[0]

        for _ in range(args.repeat):
            rng, sub = jax.random.split(rng)
            out = pipe(ref, pose, plucker, clip_raw,
                       num_inference_steps=args.steps, guidance_scale=args.cfg,
                       rng=sub)
            gen = out.images[0]
            g, t = jnp.asarray(gen)[None], jnp.asarray(gt)[None]
            rec = {
                "video": os.path.basename(video_path),
                "ssim": float(ssim(g, t)[0]),
                "psnr": float(psnr(g, t)[0]),
                "l1": float(l1(g, t)[0]),
            }
            if lpips_vars is not None:
                from humanvid_tpu.metrics.lpips import lpips_distance
                rec["lpips"] = float(lpips_distance(lpips_vars, gen[None], gt[None])[0])
            per_video.append(rec)
            name = os.path.splitext(os.path.basename(video_path))[0]
            comp = np.concatenate([ref, pose, gen, gt], axis=1)
            cv2.imwrite(os.path.join(args.output_dir, f"{name}.png"),
                        cv2.cvtColor((comp * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
            print(rec)

    summary = {
        k: float(np.mean([r[k] for r in per_video]))
        for k in per_video[0] if k != "video"
    }
    summary["num_videos"] = len(per_video)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump({"summary": summary, "per_video": per_video}, f, indent=2)
    print("summary:", summary)


if __name__ == "__main__":
    main()
