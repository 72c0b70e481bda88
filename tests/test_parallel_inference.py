"""Multi-chip inference: window-batch sharding over a CPU device mesh."""

import jax
import numpy as np
import pytest

from humanvid_tpu.parallel.mesh import make_mesh
from humanvid_tpu.pipelines import CamAnimate, Pose2VideoPipeline, tiny_config
from humanvid_tpu.data.camera import (
    get_relative_pose,
    intrinsics_vector,
    ray_condition,
    static_camera,
)


@pytest.fixture(scope="module")
def setup():
    system = CamAnimate(tiny_config(motion_max_len=8))
    H = W = 64
    params = system.init_params(jax.random.PRNGKey(0), H, W, frames=2)
    F = 12  # context 8, overlap 4 -> 3 windows/step -> CFG x 3 = 6 rows
    rng = np.random.default_rng(0)
    ref = rng.random((H, W, 3)).astype(np.float32)
    pose = rng.random((F, H, W, 3)).astype(np.float32)
    clip = rng.random((28, 28, 3)).astype(np.float32)
    cams = static_camera((W, H), F + 1)
    K = intrinsics_vector(cams[1:], (W, H))
    c2w = get_relative_pose(cams)[1:]
    plucker = ray_condition(K, c2w, H, W)
    return system, params, ref, pose, plucker, clip


def _run(pipe, setup, **kw):
    _, _, ref, pose, plucker, clip = setup
    kw.setdefault("guidance_scale", 3.5)
    return pipe(ref, pose, plucker, clip, num_inference_steps=2,
                context_frames=8, context_overlap=4,
                rng=jax.random.PRNGKey(7), **kw)


def test_sharded_matches_single_device(setup):
    system, params = setup[0], setup[1]
    baseline = _run(Pose2VideoPipeline(system, params), setup)

    mesh = make_mesh(2)  # 6 window-batch rows % 2 == 0
    sharded = _run(Pose2VideoPipeline(system, params, mesh=mesh), setup)

    assert sharded.videos.shape == baseline.videos.shape
    np.testing.assert_allclose(sharded.latents, baseline.latents, atol=2e-4)
    np.testing.assert_allclose(sharded.videos, baseline.videos, atol=2e-3)


def test_sharded_uses_multiple_devices(setup):
    assert len(jax.devices()) >= 2, "conftest must force an 8-device CPU mesh"


def test_sequential_cfg_matches_batched(setup):
    """cfg_mode='sequential' (two W-row passes via lax.map) must reproduce the
    batched 2W-row CFG pass."""
    system, params = setup[0], setup[1]
    pipe = Pose2VideoPipeline(system, params)
    batched = _run(pipe, setup)
    sequential = _run(pipe, setup, cfg_mode="sequential")
    np.testing.assert_allclose(sequential.latents, batched.latents, atol=2e-4)
    np.testing.assert_allclose(sequential.videos, batched.videos, atol=2e-3)


def test_steps_per_launch_matches_fused(setup):
    """Chunked-launch denoising (steps_per_launch) must reproduce the fused
    single-program path (same DDIM trajectory, same decode)."""
    system, params = setup[0], setup[1]
    pipe = Pose2VideoPipeline(system, params)
    fused = _run(pipe, setup)
    chunked = _run(pipe, setup, steps_per_launch=1)
    np.testing.assert_allclose(chunked.latents, fused.latents, atol=2e-4)
    np.testing.assert_allclose(chunked.videos, fused.videos, atol=2e-3)


def test_sequential_windows_matches_batched(setup):
    """window_mode='sequential' (one window per UNet pass via lax.map — the
    single-chip long-video mode) must reproduce the batched window fan-out."""
    system, params = setup[0], setup[1]
    pipe = Pose2VideoPipeline(system, params)
    batched = _run(pipe, setup)
    seq = _run(pipe, setup, window_mode="sequential")
    np.testing.assert_allclose(seq.latents, batched.latents, atol=2e-4)
    np.testing.assert_allclose(seq.videos, batched.videos, atol=2e-3)


def test_sequential_windows_no_cfg(setup):
    """The no-CFG probe of the sequential-window path."""
    system, params = setup[0], setup[1]
    pipe = Pose2VideoPipeline(system, params)
    batched = _run(pipe, setup, guidance_scale=1.0)
    seq = _run(pipe, setup, guidance_scale=1.0, window_mode="sequential")
    np.testing.assert_allclose(seq.latents, batched.latents, atol=2e-4)


def test_sharded_non_divisible_pads(setup):
    """A (CFG x windows) row count that does NOT divide the mesh must still
    run (padded with masked dummy windows) and match the single-device path.

    6 rows over 4 devices -> pads to 8 rows (window 0 duplicated twice per
    CFG bank, eps masked out of the overlap scatter-add)."""
    system, params = setup[0], setup[1]
    baseline = _run(Pose2VideoPipeline(system, params), setup)

    mesh = make_mesh(4)  # 6 window-batch rows % 4 != 0
    sharded = _run(Pose2VideoPipeline(system, params, mesh=mesh), setup)

    assert sharded.videos.shape == baseline.videos.shape
    np.testing.assert_allclose(sharded.latents, baseline.latents, atol=2e-4)
    np.testing.assert_allclose(sharded.videos, baseline.videos, atol=2e-3)


def test_sharded_single_window_many_devices(setup):
    """The flagship shape class: 1 window x 2 CFG rows on an 8-device mesh —
    previously impossible (2 % 8 != 0); now pads to 8 rows."""
    system, params = setup[0], setup[1]
    _, _, ref, pose, plucker, clip = setup
    pose8, plk8 = pose[:8], plucker[:8]  # 8 frames, context 8 -> 1 window
    kw = dict(num_inference_steps=2, context_frames=8, context_overlap=4,
              guidance_scale=3.5, rng=jax.random.PRNGKey(7))
    baseline = Pose2VideoPipeline(system, params)(
        ref, pose8, plk8, clip, **kw)
    mesh = make_mesh(8)
    sharded = Pose2VideoPipeline(system, params, mesh=mesh)(
        ref, pose8, plk8, clip, **kw)
    np.testing.assert_allclose(sharded.latents, baseline.latents, atol=2e-4)
