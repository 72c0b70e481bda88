import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanvid_tpu.diffusion import (
    add_noise,
    compute_snr,
    ddim_set_timesteps,
    ddim_step,
    get_velocity,
    make_noise_schedule,
    min_snr_weights,
)
from humanvid_tpu.diffusion.ddim import ddim_pred_x0_eps


def test_zero_snr_rescale_terminal_alpha_is_zero():
    s = make_noise_schedule(rescale_betas_zero_snr=True)
    assert float(s.alphas_cumprod[-1]) == pytest.approx(0.0, abs=1e-10)
    # first alpha preserved vs unrescaled schedule
    s0 = make_noise_schedule(rescale_betas_zero_snr=False)
    assert float(s.alphas_cumprod[0]) == pytest.approx(float(s0.alphas_cumprod[0]), rel=1e-6)


def test_trailing_timesteps():
    s = make_noise_schedule()
    d = ddim_set_timesteps(s, 20, timestep_spacing="trailing")
    ts = np.asarray(d.timesteps)
    assert ts[0] == 999 and ts[-1] == 49
    assert np.all(np.diff(ts) == -50)
    assert np.asarray(d.prev_timesteps)[-1] == -1


def test_add_noise_get_velocity_consistency():
    s = make_noise_schedule()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([100, 700])
    xt = add_noise(s, x0, noise, t)
    v = get_velocity(s, x0, noise, t)
    # invert: x0 = sqrt(a) xt - sqrt(1-a) v
    a = s.alphas_cumprod[t][:, None, None, None]
    x0_rec = jnp.sqrt(a) * xt - jnp.sqrt(1 - a) * v
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_ddim_oracle_recovers_x0():
    """Sampling with an oracle v-prediction model must land exactly on x0."""
    s = make_noise_schedule(prediction_type="v_prediction")
    d = ddim_set_timesteps(s, 25)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 8, 8, 4)) * 0.5
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)

    # start from pure noise (terminal SNR is zero => x_T == noise)
    x = add_noise(s, x0, noise, jnp.array([999]))
    np.testing.assert_allclose(np.asarray(x), np.asarray(noise), atol=1e-5)

    for i in range(25):
        t, pt = d.timesteps[i], d.prev_timesteps[i]
        v = get_velocity(s, x0, noise, t[None])
        x = ddim_step(s, v, t, pt, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddim_pred_x0_eps_epsilon_mode():
    s = make_noise_schedule(prediction_type="epsilon", rescale_betas_zero_snr=False)
    x0 = jnp.ones((1, 2, 2, 4)) * 0.3
    noise = jnp.full((1, 2, 2, 4), -0.7)
    t = jnp.array(500)
    xt = add_noise(s, x0, noise, t[None])
    x0_hat, eps_hat = ddim_pred_x0_eps(s, noise, xt, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise), atol=1e-5)


def test_min_snr_weights_finite_and_capped():
    s = make_noise_schedule(prediction_type="v_prediction")
    t = jnp.arange(1000)
    w = np.asarray(min_snr_weights(s, t, gamma=5.0))
    assert np.isfinite(w).all()
    assert (w <= 1.0 + 1e-6).all() and (w > 0).all()
    # terminal zero-SNR step: snr+1 = 1 => weight 1
    assert w[-1] == pytest.approx(1.0)

    snr = np.asarray(compute_snr(s, t))
    assert snr[-1] == pytest.approx(0.0, abs=1e-8)
