"""Offline DWPose extraction: videos tree -> parallel dwpose skeleton tree.

Behavioral parity: reference ``DWPose/prepare_videos.py:10-59`` — decode every
frame, run the wholebody detector, rasterize the skeleton canvas, write an mp4
into a mirrored ``dwpose/`` tree. UE-synthetic clips with SMPL-X .npz
keypoints instead go through ``--smplx`` (``extract_pose_from_smplx_ue.py``).

    python tools/prepare_videos.py --videos_dir data/x/videos \\
        --yolox weights/yolox_l.onnx --dwpose weights/dw-ll_ucoco_384.onnx
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def process_video(detector, video_path: str, out_path: str) -> int:
    from humanvid_tpu.data.video_io import get_fps, read_frames, save_video

    frames = read_frames(video_path)
    canvases = np.stack([detector(f)[0] for f in frames])
    save_video(canvases, out_path, fps=get_fps(video_path))
    return len(frames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videos_dir", required=True)
    p.add_argument("--out_dir", default=None,
                   help="default: sibling dwpose/ tree")
    p.add_argument("--yolox", default=None, help="YOLOX-L weights (.onnx/.pth)")
    p.add_argument("--dwpose", default=None, help="DWPose weights (.onnx/.pth)")
    p.add_argument("--smplx", action="store_true",
                   help="treat inputs as SMPL-X .npz keypoint files (UE path)")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--num_people", type=int, default=-1)
    args = p.parse_args()

    out_root = args.out_dir or args.videos_dir.rstrip("/").replace(
        "videos", "dwpose")

    if args.smplx:
        from humanvid_tpu.pose.smplx import visualize_video
        for root, _, files in os.walk(args.videos_dir):
            for f in sorted(files):
                if not f.endswith(".npz"):
                    continue
                rel = os.path.relpath(os.path.join(root, f), args.videos_dir)
                out = os.path.join(out_root, rel.replace(".npz", ".mp4"))
                os.makedirs(os.path.dirname(out), exist_ok=True)
                n = visualize_video(os.path.join(root, f), out,
                                    args.width, args.height)
                print(f"{rel}: {n} frames")
        return

    from humanvid_tpu.pose import load_detector
    detector = load_detector(args.yolox, args.dwpose, args.num_people)
    for root, _, files in os.walk(args.videos_dir):
        for f in sorted(files):
            if not f.endswith((".mp4", ".avi", ".mkv")):
                continue
            rel = os.path.relpath(os.path.join(root, f), args.videos_dir)
            out = os.path.join(out_root, rel)
            if os.path.exists(out):
                continue
            os.makedirs(os.path.dirname(out), exist_ok=True)
            n = process_video(detector, os.path.join(root, f), out)
            print(f"{rel}: {n} frames")


if __name__ == "__main__":
    main()
