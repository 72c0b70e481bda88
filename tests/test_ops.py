import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanvid_tpu.ops.attention import MultiHeadAttention, dot_product_attention
from humanvid_tpu.ops.conv import pixel_shuffle, pixel_unshuffle
from humanvid_tpu.ops.embeddings import (
    sinusoidal_positional_encoding,
    sinusoidal_timestep_embedding,
)


def test_timestep_embedding_matches_numpy():
    t = jnp.array([0.0, 1.0, 500.0, 999.0])
    emb = sinusoidal_timestep_embedding(t, 320)
    assert emb.shape == (4, 320)
    # t=0: sin part = 0, cos part = 1 (flip_sin_to_cos => [cos|sin])
    np.testing.assert_allclose(emb[0, :160], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 160:], 0.0, atol=1e-6)
    # known value: first frequency is 1.0 => cos(t), sin(t)
    np.testing.assert_allclose(float(emb[1, 0]), np.cos(1.0), rtol=1e-5)
    np.testing.assert_allclose(float(emb[1, 160]), np.sin(1.0), rtol=1e-5)


def test_positional_encoding_interleaved():
    pe = sinusoidal_positional_encoding(24, 320)
    assert pe.shape == (24, 320)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)
    np.testing.assert_allclose(float(pe[1, 0]), np.sin(1.0), rtol=1e-6)
    np.testing.assert_allclose(float(pe[1, 1]), np.cos(1.0), rtol=1e-6)


def test_pixel_unshuffle_roundtrip_and_order():
    x = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
    y = pixel_unshuffle(x, 2)
    assert y.shape == (1, 2, 2, 8)
    np.testing.assert_array_equal(pixel_shuffle(y, 2), x)
    # torch PixelUnshuffle channel order: c*r*r + dy*r + dx
    # output[0,0,0, c*4 + dy*2 + dx] == x[0, dy, dx, c]
    for c in range(2):
        for dy in range(2):
            for dx in range(2):
                assert float(y[0, 0, 0, c * 4 + dy * 2 + dx]) == float(x[0, dy, dx, c])


def _naive_attention(q, k, v, bias=None):
    scale = q.shape[-1] ** -0.5
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        logits = logits + bias
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", probs, v)


def test_dot_product_attention_matches_naive():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    k = rng.normal(size=(2, 4, 24, 8)).astype(np.float32)
    v = rng.normal(size=(2, 4, 24, 8)).astype(np.float32)
    out = dot_product_attention(jnp.array(q), jnp.array(k), jnp.array(v))
    np.testing.assert_allclose(np.asarray(out), _naive_attention(q, k, v), atol=1e-5)


def test_mha_extra_kv_disable_equals_subset_attention():
    """Masked extra-KV == attention restricted to self tokens (the CFG-uncond path)."""
    mha = MultiHeadAttention(query_dim=32, heads=4, head_dim=8)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 10, 32))
    ref = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 32))
    params = mha.init(jax.random.PRNGKey(2), x, extra_kv=ref)

    disable_all = jnp.ones((4,), bool)
    out_masked = mha.apply(params, x, extra_kv=ref, extra_kv_disable=disable_all)
    out_self = mha.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_self), atol=1e-5)

    # rows with disable=False must differ from self-only attention
    disable_none = jnp.zeros((4,), bool)
    out_full = mha.apply(params, x, extra_kv=ref, extra_kv_disable=disable_none)
    assert not np.allclose(np.asarray(out_full), np.asarray(out_self), atol=1e-4)

    # mixed mask: row 0 disabled matches self-only; row 1 enabled matches full
    mixed = jnp.array([True, False, True, False])
    out_mixed = mha.apply(params, x, extra_kv=ref, extra_kv_disable=mixed)
    np.testing.assert_allclose(np.asarray(out_mixed[0]), np.asarray(out_self[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_mixed[1]), np.asarray(out_full[1]), atol=1e-5)


def test_mha_cross_attention_shapes():
    mha = MultiHeadAttention(query_dim=64, heads=8, head_dim=8, context_dim=768)
    x = jnp.zeros((2, 12, 64))
    ctx = jnp.zeros((2, 1, 768))
    params = mha.init(jax.random.PRNGKey(0), x, context=ctx)
    out = mha.apply(params, x, context=ctx)
    assert out.shape == (2, 12, 64)


def test_geglu_ff_chunked_matches_unchunked():
    """chunk_tokens is a pure memory lever: same params, same values, same
    grads as the single-contraction path (incl. a non-divisible length)."""
    from humanvid_tpu.models.layers import GEGLUFeedForward

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 40, 16), jnp.float32)
    full = GEGLUFeedForward(dim=16)
    variables = full.init(rng, x)

    for chunk in (16, 40, 13):  # 13 exercises the pad-and-slice path
        chunked = GEGLUFeedForward(dim=16, chunk_tokens=chunk)
        # identical param structure: the chunked module accepts the
        # unchunked variables as-is
        y_full = full.apply(variables, x)
        y_chunk = chunked.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(y_chunk), np.asarray(y_full), rtol=2e-5, atol=2e-5)

        def loss(v, mdl):
            return jnp.sum(mdl.apply(v, x) ** 2)

        g_full = jax.grad(loss)(variables, full)
        g_chunk = jax.grad(loss)(variables, chunked)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
            g_full, g_chunk)


def test_nearest_up2_conv3x3_matches_unfused():
    """The fused subpixel upsample-conv must equal nearest-x2 repeat + 3x3
    SAME conv exactly (incl. boundaries), fwd and grad."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from humanvid_tpu.ops.conv import nearest_up2_conv3x3

    rng = np.random.default_rng(5)
    for (h, w, cin, cout) in [(5, 7, 8, 8), (4, 4, 3, 6), (1, 3, 2, 2)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

        def unfused(x, k, b):
            n, hh, ww, c = x.shape
            up = jnp.broadcast_to(
                x[:, :, None, :, None, :], (n, hh, 2, ww, 2, c)
            ).reshape(n, 2 * hh, 2 * ww, c)
            y = jax.lax.conv_general_dilated(
                up, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b

        ref = unfused(x, k, b)
        out = nearest_up2_conv3x3(x, k, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        g_ref = jax.grad(lambda *a: jnp.sum(unfused(*a) ** 2), (0, 1, 2))(x, k, b)
        g_out = jax.grad(lambda *a: jnp.sum(nearest_up2_conv3x3(*a) ** 2),
                         (0, 1, 2))(x, k, b)
        for a, c_ in zip(g_out, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c_),
                                       rtol=1e-4, atol=1e-4)


def test_group_norm_act_matches_flax():
    """ops.group_norm reference path vs nn.GroupNorm (+silu), values+grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from humanvid_tpu.ops.group_norm import _reference, group_norm_act

    rng = np.random.default_rng(7)
    for shape, groups in [((2, 6, 4, 32), 8), ((3, 10, 16), 4)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))

        gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
        want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
        got = group_norm_act(x, scale, bias, groups, 1e-5, act=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

        want_s = nn.silu(want)
        got_s = group_norm_act(x, scale, bias, groups, 1e-5, act="silu")
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=2e-5, atol=2e-5)

        g_ref = jax.grad(lambda *a: jnp.sum(
            nn.silu(gn.apply({"params": {"scale": a[1], "bias": a[2]}},
                             a[0])) ** 2), (0, 1, 2))(x, scale, bias)
        g_got = jax.grad(lambda *a: jnp.sum(
            _reference(a[0], a[1], a[2], groups, 1e-5, "silu") ** 2),
            (0, 1, 2))(x, scale, bias)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_group_norm_two_stage_matches_flax():
    """The lane-friendly two-stage stats order vs nn.GroupNorm: values and
    grads, fp32 and bf16, non-square spatial, groups of 16 channels (the
    production fragment size the flax order reduces badly on TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from humanvid_tpu.ops.group_norm import _two_stage

    rng = np.random.default_rng(9)
    for shape, groups in [((2, 6, 4, 32), 8), ((3, 10, 16), 4),
                          ((2, 5, 7, 320), 32)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 2 + 1
        scale = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
        gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
        want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
        got = _two_stage(x, scale, bias, groups, 1e-5, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)
        got_b = _two_stage(x.astype(jnp.bfloat16), scale, bias, groups,
                           1e-5, None)
        np.testing.assert_allclose(np.asarray(got_b, np.float32),
                                   np.asarray(want), rtol=0.02, atol=0.02)
        g_ref = jax.grad(lambda *a: jnp.sum(
            nn.silu(gn.apply({"params": {"scale": a[1], "bias": a[2]}},
                             a[0])) ** 2), (0, 1, 2))(x, scale, bias)
        g_got = jax.grad(lambda *a: jnp.sum(
            _two_stage(a[0], a[1], a[2], groups, 1e-5, "silu") ** 2),
            (0, 1, 2))(x, scale, bias)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_group_norm_fused_kernel_interpret():
    """The Pallas stats kernel + fused normalize path vs the reference,
    values AND custom_vjp grads, incl. a non-divisible row count."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu
    from humanvid_tpu.ops.group_norm import _fused, _reference

    rng = np.random.default_rng(8)
    for shape, groups in [((2, 8, 8, 64), 8), ((1, 7, 5, 32), 4)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
        want = _reference(x, scale, bias, groups, 1e-5, "silu")
        with pltpu.force_tpu_interpret_mode():
            got = _fused(x, scale, bias, groups, 1e-5, "silu", True)
            g_got = jax.grad(lambda *a: jnp.sum(
                _fused(a[0], a[1], a[2], groups, 1e-5, "silu", True) ** 2),
                (0, 1, 2))(x, scale, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        g_ref = jax.grad(lambda *a: jnp.sum(
            _reference(a[0], a[1], a[2], groups, 1e-5, "silu") ** 2),
            (0, 1, 2))(x, scale, bias)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
