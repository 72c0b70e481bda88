"""Benchmarks for the remaining BASELINE.json configs (#1, #2, #4).

bench.py covers config #3 (the flagship camera-aware 24f 512x768 clip); this
tool measures the other operating points on the real chip and prints one JSON
line per config, recorded in PERF.md:

  c1   pose2img 256x256, DDIM 20, CFG 3.5 (stage-1 eval op-point)
  c2   pose2vid static-camera 16 frames at 512x512 (Animate-Anyone
       reproduction mode: window >= clip, single-window denoise)
  c4h  long-video sliding window: 48 frames 768x512, window 24 / overlap 4
  c4v  same, vertical 512x768

Usage:  python tools/bench_configs.py c1 c2 c4h c4v

Protocol matches bench.py: abstract init + one packed transfer, compile
warmup, then median of HVT_BENCH_RUNS (default 3) fetch-forced timed runs.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from humanvid_tpu.ops.attention import set_default_attention_backend

set_default_attention_backend("auto")

RUNS = int(os.environ.get("HVT_BENCH_RUNS", "3"))


def _median_time(run):
    run()  # compile + warmup
    dts = []
    for _ in range(RUNS):
        t0 = time.time()
        run()
        dts.append(time.time() - t0)
    dt = statistics.median(dts)
    return dt, dts


def _emit(metric, value, unit, dts, **extra):
    print(json.dumps({
        "metric": metric, "value": round(value, 4), "unit": unit,
        "spread_s": [round(min(dts), 2), round(max(dts), 2)], **extra,
    }), flush=True)


def _make_system():
    from humanvid_tpu.pipelines.system import CamAnimate, CamAnimateConfig
    from humanvid_tpu.utils.transfer import packed_device_put

    system = CamAnimate(CamAnimateConfig(), dtype=jnp.bfloat16)
    params = system.init_params(jax.random.PRNGKey(0), 256, 192, frames=2,
                                abstract=True)
    params = jax.block_until_ready(packed_device_put(params))
    return system, params


def _static_plucker(H, W, F):
    from humanvid_tpu.data.camera import (
        get_relative_pose, intrinsics_vector, ray_condition, static_camera)

    cams = static_camera((W, H), F + 1)
    K = intrinsics_vector(cams[1:], (W, H))
    c2w = get_relative_pose(cams)[1:]
    return np.asarray(ray_condition(K, c2w, H, W))


def bench_c1(system, params):
    from humanvid_tpu.pipelines import Pose2ImagePipeline

    H = W = 256
    pipe = Pose2ImagePipeline(system, params)
    rng = np.random.default_rng(0)
    ref = rng.random((H, W, 3)).astype(np.float32)
    pose = rng.random((H, W, 3)).astype(np.float32)
    plk = _static_plucker(H, W, 1)[0]
    clip_img = rng.random((224, 224, 3)).astype(np.float32)

    def run():
        out = pipe(ref, pose, plk, clip_img, num_inference_steps=20,
                   guidance_scale=3.5)
        assert np.isfinite(np.asarray(out.images)).all()

    dt, dts = _median_time(run)
    _emit("pose2img_images_per_sec_256x256_ddim20_cfg", 1.0 / dt,
          "images/sec/chip", dts)


def _bench_vid(system, params, metric, H, W, F, overlap=4):
    from humanvid_tpu.pipelines import Pose2VideoPipeline

    pipe = Pose2VideoPipeline(system, params)
    rng = np.random.default_rng(0)
    ref = rng.random((H, W, 3)).astype(np.float32)
    pose = rng.random((F, H, W, 3)).astype(np.float32)
    clip_img = rng.random((224, 224, 3)).astype(np.float32)
    plk = _static_plucker(H, W, F)

    # >1 window: serialize windows (the batched fan-out would put W x 24
    # frames through the UNet at once and exceed one chip's HBM)
    window_mode = "sequential" if F > 24 else "batched"

    def run():
        out = pipe(ref, pose, plk, clip_img,
                   num_inference_steps=30, guidance_scale=3.5,
                   context_frames=24, context_overlap=overlap, decode_chunk=8,
                   cfg_mode="sequential", window_mode=window_mode,
                   steps_per_launch=int(os.environ.get("HVT_BENCH_SPL", "6")),
                   device_output=True)
        checksum = float(jnp.sum(out.latents.astype(jnp.float32)))
        assert checksum == checksum, "NaN latents"

    dt, dts = _median_time(run)
    _emit(metric, F / dt, "frames/sec/chip", dts)


def bench_c2(system, params):
    _bench_vid(system, params,
               "pose2vid_frames_per_sec_static_512x512x16f_ddim30_cfg",
               512, 512, 16)


def bench_c4h(system, params):
    _bench_vid(system, params,
               "pose2vid_long_frames_per_sec_768x512x48f_ddim30_cfg",
               768, 512, 48)


def bench_c4v(system, params):
    _bench_vid(system, params,
               "pose2vid_long_frames_per_sec_512x768x48f_ddim30_cfg",
               512, 768, 48)


CONFIGS = {"c1": bench_c1, "c2": bench_c2, "c4h": bench_c4h, "c4v": bench_c4v}


if __name__ == "__main__":
    names = sys.argv[1:] or ["c1", "c2", "c4h", "c4v"]
    system, params = _make_system()
    for n in names:
        try:
            CONFIGS[n](system, params)
        except Exception as e:  # noqa: BLE001 — configs are independent
            print(f"# config {n} failed: {str(e).splitlines()[0][:300]}",
                  file=sys.stderr, flush=True)
