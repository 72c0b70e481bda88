import jax.numpy as jnp
import numpy as np
import pytest

from humanvid_tpu.metrics import (
    frame_consistency,
    frechet_distance,
    activation_statistics,
    l1,
    psnr,
    ssim,
)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    s = np.asarray(ssim(x, x))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    y = jnp.clip(x + 0.2 * jnp.asarray(rng.normal(size=x.shape), jnp.float32), 0, 1)
    assert float(ssim(x, y)[0]) < 0.9


def test_psnr_known_value():
    x = jnp.zeros((1, 8, 8, 3))
    y = jnp.full((1, 8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(x, y)[0]), 20.0, atol=1e-3)
    np.testing.assert_allclose(float(l1(x, y)[0]), 0.1, atol=1e-6)


def test_frechet_distance_zero_for_same_stats():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    mu, sigma = activation_statistics(f)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_mean_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2000, 8))
    b = a + 1.0  # shift every dim by 1 -> ||diff||^2 = 8
    d = frechet_distance(*activation_statistics(a), *activation_statistics(b))
    assert d == pytest.approx(8.0, rel=0.05)


def test_frame_consistency_bounds():
    f = jnp.asarray(np.random.default_rng(0).normal(size=(6, 32)), jnp.float32)
    c = frame_consistency(f)
    assert -1.0 <= c <= 1.0
    same = jnp.ones((4, 32))
    assert frame_consistency(same) == pytest.approx(1.0, abs=1e-5)
