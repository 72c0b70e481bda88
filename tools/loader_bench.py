"""Measure sustained input-pipeline throughput at the real training op-points.

The reference tracked data-loading time per step because it was a real
bottleneck on its cluster (``/root/reference/train_stage_1.py:690-720``,
``train_stage_2.py:328-330`` — the ``td`` metric).  This tool answers the
same question for our thread-pool loader (``data/loader.py``): can it feed a
stage-2 step (measured 4.87 s/step on one v5e, PERF.md r3) at the real
op-point — 24-frame 512x896 clip decode + pose decode + resize/crop aug +
Plücker construction per sample?

It synthesizes an x264 video tree at the target resolution through our own
native encoder (``native/videodec.cpp``), builds the reference-schema meta
JSON, then iterates the real ``HumanDanceCameraVideoDataset`` through the
real ``Loader`` and reports sustained samples/s (decode-bound, no device in
the loop).

Usage:  python tools/loader_bench.py [stage2|stage1] [--workers N]
"""

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tree(root: str, n_clips: int, frames: int, h: int, w: int) -> str:
    from humanvid_tpu.data.video_io import save_video

    videos = os.path.join(root, "videos")
    dwpose = os.path.join(root, "dwpose")
    camera = os.path.join(root, "camera")
    for d in (videos, dwpose, camera):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    meta = []
    for i in range(n_clips):
        name = f"pexels_clip{i}"  # "pexels" selects the c2w camera convention
        # smooth low-frequency content: realistic x264 bitstreams decode
        # slower than flat noise-free frames but faster than pure noise;
        # upsampled noise approximates natural-video coding cost
        small = rng.random((frames, h // 8, w // 8, 3)).astype(np.float32)
        vid = np.repeat(np.repeat(small, 8, axis=1), 8, axis=2)
        save_video(vid, os.path.join(videos, f"{name}.mp4"), fps=24.0)
        pose = np.zeros((frames, h, w, 3), np.float32)
        pose[:, h // 4:h // 2, w // 4:w // 2] = 0.8  # sparse skeleton-like
        save_video(pose, os.path.join(dwpose, f"{name}.mp4"), fps=24.0)
        lines = [f"{t} {0.01 * t} 0 0 0 0 0 1 1.0 1.788 1.0"
                 for t in range(frames)]
        with open(os.path.join(camera, f"{name}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        meta.append({"video_path": os.path.join(videos, f"{name}.mp4"),
                     "kps_path": os.path.join(dwpose, f"{name}.mp4"),
                     "start_frame": 0, "end_frame": frames})
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("stage", nargs="?", default="stage2",
                   choices=["stage1", "stage2"])
    p.add_argument("--workers", type=int, default=8)  # stage2.yaml num_workers
    p.add_argument("--batches", type=int, default=10)
    p.add_argument("--clips", type=int, default=4)
    p.add_argument("--frames", type=int, default=80)
    args = p.parse_args()

    from humanvid_tpu.data.datasets import (
        DatasetConfig, HumanDanceCameraImageDataset,
        HumanDanceCameraVideoDataset)
    from humanvid_tpu.data.loader import Loader
    from humanvid_tpu.data.samplers import OrientationBatchSampler

    root = tempfile.mkdtemp(prefix="hvt_loader_bench_")
    try:
        t0 = time.time()
        # vertical orientation: 512x896 target (the flagship training bucket)
        meta_path = build_tree(root, args.clips, args.frames, 896, 512)
        print(f"# synthetic tree built in {time.time() - t0:.1f}s "
              f"({args.clips} clips x {args.frames}f 896x512)",
              file=sys.stderr, flush=True)

        cfg = DatasetConfig()
        if args.stage == "stage2":
            ds = HumanDanceCameraVideoDataset([], [meta_path], cfg)
            bs = 1          # stage-2 per-chip batch (stage2.yaml train_bs)
            budget_s = 4.87  # measured stage-2 step seconds (PERF.md r3)
        else:
            ds = HumanDanceCameraImageDataset([], [meta_path], cfg)
            bs = 8          # stage-1 batch (stage1.yaml train_bs)
            budget_s = None  # filled by the stage-1 memcheck exec run
        sampler = OrientationBatchSampler(ds.num_horizontal,
                                          len(ds) - ds.num_horizontal,
                                          bs, seed=0, drop_last=False)
        import itertools
        batches = []
        while len(batches) < args.batches + 2:
            sampler.set_epoch(len(batches))
            batches.extend(itertools.islice(iter(sampler), args.batches))
        batches = batches[:args.batches + 2]
        loader = Loader(ds, batches, num_workers=args.workers, prefetch=2)

        times, n_done = [], 0
        t_prev = time.time()
        for i, batch in enumerate(loader):
            now = time.time()
            if i >= 2:  # skip warmup (thread-pool spinup, page cache)
                times.append(now - t_prev)
                n_done += bs
            t_prev = now
            assert batch["tgt"].dtype == np.float32
        per_batch = statistics.median(times)
        sps = bs / per_batch
        rec = {
            "metric": f"{args.stage}_loader_samples_per_sec",
            "value": round(sps, 3),
            "unit": "samples/sec",
            "per_batch_s": round(per_batch, 3),
            "spread_s": [round(min(times), 3), round(max(times), 3)],
            "workers": args.workers,
            "batch_size": bs,
        }
        if budget_s is not None:
            # >1: the loader outruns the accelerator (healthy); <1: input-bound
            rec["x_of_step_budget"] = round(sps * budget_s / bs, 2)
        print(json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
