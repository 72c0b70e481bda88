"""Pallas temporal-attention kernel: interpret-mode parity (fwd + bwd) and
the fused motion-module path vs the XLA token-layout path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from humanvid_tpu.models.layers import TemporalTransformer
from humanvid_tpu.ops import attention as attn_mod
from humanvid_tpu.ops.temporal_attention import (
    temporal_attention,
    xla_temporal_attention,
)


@pytest.mark.parametrize(
    "b,f,l,c,heads",
    [(2, 6, 96, 64, 4), (1, 24, 80, 128, 8), (1, 8, 100, 64, 4)],
)
def test_forward_matches_xla(b, f, l, c, heads):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, f, l, c)), jnp.float32) for _ in range(3)
    )
    ref = xla_temporal_attention(q, k, v, heads)
    with pltpu.force_tpu_interpret_mode():
        out = temporal_attention(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_backward_matches_xla():
    b, f, l, c, heads = 1, 6, 48, 64, 4
    rng = np.random.default_rng(1)
    q, k, v, g = (
        jnp.asarray(rng.normal(size=(b, f, l, c)), jnp.float32) for _ in range(4)
    )
    dref = jax.grad(
        lambda *a: jnp.sum(xla_temporal_attention(*a, heads) * g), argnums=(0, 1, 2)
    )(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        dker = jax.grad(
            lambda *a: jnp.sum(temporal_attention(*a, heads) * g), argnums=(0, 1, 2)
        )(q, k, v)
    for a, bb in zip(dref, dker):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=5e-5)


def test_fused_motion_module_matches_token_layout(monkeypatch):
    """The full TemporalTransformer gives the same output whether it runs the
    ((b l), f, c) XLA path or the fused spatial-layout Pallas path."""
    frames, h, w, c = 6, 8, 8, 64
    module = TemporalTransformer(dim=c, heads=4, max_len=8)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2 * frames, h, w, c)), jnp.float32
    )
    params = module.init(jax.random.PRNGKey(0), x, frames)

    ref = module.apply(params, x, frames)
    monkeypatch.setenv("HVT_TEMPORAL_FUSED", "1")
    with pltpu.force_tpu_interpret_mode():
        fused = module.apply(params, x, frames)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5)


def test_fused_gate_off_on_cpu():
    assert not attn_mod.use_fused_temporal(1)
    prev = attn_mod.get_default_attention_backend()
    try:
        attn_mod.set_default_attention_backend("auto")
        # CPU backend (pinned by conftest): never fuse without the override
        assert not attn_mod.use_fused_temporal(24)
    finally:
        attn_mod.set_default_attention_backend(prev)


def test_fused_camera_encoder_matches_token_layout(monkeypatch):
    """CameraPoseEncoder parity between the ((b h w), f, c) XLA layout and the
    fused spatial-layout Pallas path (incl. chunked FF)."""
    import dataclasses

    from humanvid_tpu.models.camera_encoder import CameraPoseEncoder
    from humanvid_tpu.models.configs import CameraEncoderConfig

    frames, H, W = 4, 16, 16
    cfg = CameraEncoderConfig(channels=(32,), nums_rb=1, num_heads=4,
                              position_encoding_max_len=8)
    enc = CameraPoseEncoder(cfg)
    plucker = jnp.asarray(
        np.random.default_rng(3).normal(size=(frames, H, W, 6)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), plucker, frames)

    # the zero-init output conv would make every path trivially equal; perturb
    # all params so the comparison sees real content
    params = jax.tree.map(lambda a: a + 0.01, params)
    ref = enc.apply(params, plucker, frames)
    assert np.abs(np.asarray(ref)).max() > 0

    monkeypatch.setenv("HVT_TEMPORAL_FUSED", "1")
    enc_chunked = CameraPoseEncoder(dataclasses.replace(cfg, ff_chunk_tokens=64))
    with pltpu.force_tpu_interpret_mode():
        fused = enc.apply(params, plucker, frames)
        fused_chunked = enc_chunked.apply(params, plucker, frames)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(fused_chunked), np.asarray(ref), atol=3e-5)
