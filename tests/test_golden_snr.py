"""Golden parity for the min-SNR loss weighting vs the reference's own code.

Execs ``compute_snr`` (reference ``train_stage_1.py:112-139``) under torch on
OUR schedule tables and re-assembles the reference's mse_loss_weights formula
(``train_stage_1.py:633-654``, including the v-prediction ``snr + 1`` quirk),
then compares against ``humanvid_tpu.diffusion.min_snr_weights``. Covers both
prediction types and both train beta schedules the reference uses.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from humanvid_tpu.diffusion import make_noise_schedule, min_snr_weights  # noqa: E402

_REF = "/root/reference/train_stage_1.py"


def _ref_compute_snr():
    src = open(_REF).read().splitlines()
    start = next(i for i, l in enumerate(src) if l.startswith("def compute_snr"))
    end = next(i for i in range(start + 1, len(src))
               if src[i].startswith("def ") or src[i].startswith("class "))
    ns = {"torch": torch}
    exec("\n".join(src[start:end]), ns)  # noqa: S102 — reference code, read-only
    return ns["compute_snr"]


class _FakeSched:
    def __init__(self, alphas_cumprod):
        self.alphas_cumprod = torch.from_numpy(np.asarray(alphas_cumprod))


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("beta_schedule", ["scaled_linear", "linear"])
def test_golden_min_snr_weights(prediction_type, beta_schedule):
    compute_snr = _ref_compute_snr()
    gamma = 5.0
    # training schedule: no zero-SNR rescale (the reference applies the
    # rescale only to the *validation* scheduler; the train scheduler is
    # plain scaled_linear — train_stage_1.py:269-278)
    sched = make_noise_schedule(
        beta_schedule=beta_schedule, rescale_betas_zero_snr=False,
        prediction_type=prediction_type)

    t_np = np.array([0, 1, 17, 500, 998, 999], np.int64)
    snr = compute_snr(_FakeSched(sched.alphas_cumprod), torch.from_numpy(t_np))
    # reference train_stage_1.py:639-648
    if prediction_type == "v_prediction":
        snr = snr + 1
    timesteps = torch.from_numpy(t_np)
    theirs = (torch.stack(
        [snr, gamma * torch.ones_like(timesteps)], dim=1
    ).min(dim=1)[0] / snr).numpy()

    ours = np.asarray(min_snr_weights(sched, jnp.asarray(t_np), gamma))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
    assert (ours <= 1.0 + 1e-6).all() and (ours > 0).all()
