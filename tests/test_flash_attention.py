"""Pallas flash attention: interpret-mode forward parity and the chunked
backward (runs on CPU via the TPU interpreter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from humanvid_tpu.ops.flash_attention import _xla_reference, flash_attention


def _make(b=2, h=2, lq=192, lk=384, d=24, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, lq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, lk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, lk, d), dtype)
    # per-key bias: second half of keys disabled for row 0 (the CFG pattern)
    key_is_extra = jnp.arange(lk) >= lq
    row_disabled = jnp.arange(b) == 0
    bias = jnp.where(row_disabled[:, None] & key_is_extra[None, :], -1e9, 0.0)
    return q, k, v, bias[:, None, None, :].astype(jnp.float32)


def test_flash_forward_matches_reference_interpret():
    q, k, v, bias = _make()
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, bias, block_q=128, block_kv=128)
    b, h = q.shape[:2]
    ref = _xla_reference(
        q.reshape(-1, *q.shape[2:]), k.reshape(-1, *k.shape[2:]),
        v.reshape(-1, *v.shape[2:]),
        jnp.repeat(bias[:, 0, 0, :], h, axis=0),
    ).reshape(q.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_forward_both_layouts_interpret(monkeypatch):
    """The r5 transposed-PV forward (default) and the straight r3 kernel
    must agree with the reference AND with each other, incl. a padded tail
    and the CFG bias pattern — the two layouts share the backward, so the
    out/lse contract must be interchangeable."""
    from humanvid_tpu.ops import flash_attention as fa

    q, k, v, bias = _make(lq=100, lk=300)
    outs = {}
    for layout in ("t", "q"):
        monkeypatch.setattr(fa, "_FWD_LAYOUT", layout)
        with pltpu.force_tpu_interpret_mode():
            outs[layout] = np.asarray(
                flash_attention(q, k, v, bias, block_q=128, block_kv=128))
    h = q.shape[1]
    ref = _xla_reference(
        q.reshape(-1, *q.shape[2:]), k.reshape(-1, *k.shape[2:]),
        v.reshape(-1, *v.shape[2:]),
        jnp.repeat(bias[:, 0, 0, :], h, axis=0),
    ).reshape(q.shape)
    np.testing.assert_allclose(outs["t"], np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(outs["q"], np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(outs["t"], outs["q"], atol=2e-6)


def test_flash_backward_both_layouts_interpret(monkeypatch):
    """The d-major-output backward kernels (default) and the straight r3
    kernels must produce identical dq/dk/dv, incl. padded tails + bias."""
    from humanvid_tpu.ops import flash_attention as fa

    q, k, v, bias = _make(lq=100, lk=300, d=16)

    def grads(q_, k_, v_):
        def loss(qq, kk, vv):
            out = flash_attention(qq, kk, vv, bias, block_q=128,
                                  block_kv=128)
            return (out.astype(jnp.float32) ** 2).sum()
        return jax.grad(loss, (0, 1, 2))(q_, k_, v_)

    outs = {}
    for layout in ("t", "q"):
        monkeypatch.setattr(fa, "_BWD_LAYOUT", layout)
        with pltpu.force_tpu_interpret_mode():
            outs[layout] = [np.asarray(x) for x in grads(q, k, v)]
    for a, b in zip(outs["t"], outs["q"]):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_flash_forward_unpadded_tail_interpret():
    # lq/lk not multiples of the block sizes exercises the padding path
    q, k, v, bias = _make(lq=100, lk=150)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, bias, block_q=128, block_kv=128)
    b, h = q.shape[:2]
    ref = _xla_reference(
        q.reshape(-1, *q.shape[2:]), k.reshape(-1, *k.shape[2:]),
        v.reshape(-1, *v.shape[2:]),
        jnp.repeat(bias[:, 0, 0, :], h, axis=0),
    ).reshape(q.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_kernel_backward_matches_einsum_grads():
    """The Pallas dq/dkv backward kernels must equal full einsum-attention
    gradients, including lq/lk not multiples of the block size."""
    q, k, v, bias = _make(b=2, h=2, lq=100, lk=150, d=16)

    def loss_flash(q_, k_, v_):
        out = flash_attention(q_, k_, v_, bias, block_q=128, block_kv=128)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(q_, k_, v_):
        h = q_.shape[1]
        out = _xla_reference(
            q_.reshape(-1, *q_.shape[2:]), k_.reshape(-1, *k_.shape[2:]),
            v_.reshape(-1, *v_.shape[2:]),
            jnp.repeat(bias[:, 0, 0, :], h, axis=0),
        )
        return (out.astype(jnp.float32) ** 2).sum()

    # the bwd kernels run at grad time, so the whole grad call sits inside
    # interpret mode (unlike the fwd-only tests)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_flash_backward_matches_einsum_grads(monkeypatch):
    """The q-chunked recompute backward (fallback) must equal full
    einsum-attention gradients (chunk size forced smaller than lq)."""
    from humanvid_tpu.ops import flash_attention as fa_mod

    # HVT_FLASH_BWD is frozen into _BWD_MODE at import (trace-time binding);
    # patch the module constant to select the fallback path.
    monkeypatch.setattr(fa_mod, "_BWD_MODE", "chunked")
    q, k, v, bias = _make(b=1, h=2, lq=96, lk=160, d=16)

    def loss_flash(q_, k_, v_):
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q_, k_, v_, bias, block_q=128, block_kv=128)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(q_, k_, v_):
        h = q_.shape[1]
        out = _xla_reference(
            q_.reshape(-1, *q_.shape[2:]), k_.reshape(-1, *k_.shape[2:]),
            v_.reshape(-1, *v_.shape[2:]),
            jnp.repeat(bias[:, 0, 0, :], h, axis=0),
        )
        return (out.astype(jnp.float32) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_flash_packed_interface_matches_reference():
    """The packed (B, L, C) interface — what MultiHeadAttention calls in
    production — against the split-head oracle, fwd + kernel bwd."""
    from humanvid_tpu.ops.flash_attention import flash_attention_packed

    b, heads, lq, lk, d = 2, 4, 192, 320, 16
    c = heads * d
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, lq, c), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, c), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, c), jnp.float32)
    key_bias = jnp.where(
        (jnp.arange(b) == 0)[:, None] & (jnp.arange(lk) >= lq)[None, :],
        -1e9, 0.0).astype(jnp.float32)

    def split(t):
        return (t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)
                .reshape(b * heads, t.shape[1], d))

    def loss_packed(q_, k_, v_):
        out = flash_attention_packed(q_, k_, v_, heads, key_bias,
                                     block_q=128, block_kv=128)
        return (out.astype(jnp.float32) ** 2).sum(), out

    def loss_ref(q_, k_, v_):
        out = _xla_reference(split(q_), split(k_), split(v_),
                             jnp.repeat(key_bias, heads, axis=0))
        merged = (out.reshape(b, heads, -1, d).transpose(0, 2, 1, 3)
                  .reshape(b, -1, c))
        return (merged.astype(jnp.float32) ** 2).sum(), merged

    with pltpu.force_tpu_interpret_mode():
        (l_p, out_p), g_p = jax.value_and_grad(
            loss_packed, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    (l_r, out_r), g_r = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-5)
    for a, b_ in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_flash_packed_no_bias_variant():
    """key_bias=None compiles the biasless kernels (no per-head (bq, bkv)
    VPU broadcast-add — the production path for pure self-attention and the
    sequential-CFG cond pass). Must match the zero-bias oracle, fwd + bwd,
    including the padded-Lk case where the padding mask is synthesized."""
    from humanvid_tpu.ops.flash_attention import flash_attention_packed

    b, heads, d = 2, 4, 16
    c = heads * d

    def split(t):
        return (t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)
                .reshape(b * heads, t.shape[1], d))

    # exact blocks / both padded / padded-Lq with exact Lk
    for lq, lk in [(256, 384), (200, 260), (200, 256)]:
        ks = jax.random.split(jax.random.PRNGKey(lq), 3)
        q = jax.random.normal(ks[0], (b, lq, c), jnp.float32)
        k = jax.random.normal(ks[1], (b, lk, c), jnp.float32)
        v = jax.random.normal(ks[2], (b, lk, c), jnp.float32)

        def loss_packed(q_, k_, v_):
            out = flash_attention_packed(q_, k_, v_, heads, None,
                                         block_q=128, block_kv=128)
            return (out.astype(jnp.float32) ** 2).sum(), out

        def loss_ref(q_, k_, v_):
            out = _xla_reference(split(q_), split(k_), split(v_),
                                 jnp.zeros((b * heads, lk), jnp.float32))
            merged = (out.reshape(b, heads, -1, d).transpose(0, 2, 1, 3)
                      .reshape(b, -1, c))
            return (merged.astype(jnp.float32) ** 2).sum(), merged

        with pltpu.force_tpu_interpret_mode():
            (_, out_p), g_p = jax.value_and_grad(
                loss_packed, argnums=(0, 1, 2), has_aux=True)(q, k, v)
        (_, out_r), g_r = jax.value_and_grad(
            loss_ref, argnums=(0, 1, 2), has_aux=True)(q, k, v)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                                   atol=2e-5)
        for a, b_ in zip(g_p, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4)


def test_flash_bf16_denominator_grad_error_bounded():
    """ADVICE r3: the r3 kernel computes the softmax denominator/LSE from p
    cast to v.dtype (bf16 in production) via the ones-column MXU rowsum. This
    bounds the resulting fwd/grad error at a training-like shape against the
    exact fp32 einsum reference."""
    q, k, v, bias = _make(b=1, h=2, lq=256, lk=256, d=24, dtype=jnp.float32)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

    def loss_flash(q_, k_, v_):
        out = flash_attention(q_, k_, v_, bias, block_q=128, block_kv=128)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_exact(q_, k_, v_):
        qf, kf, vf = (t.astype(jnp.float32) for t in (q_, k_, v_))
        b, h, lq, d = qf.shape
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / np.sqrt(d)
        logits = logits + bias[:, :, 0, :][:, :, None, :]
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        return (out ** 2).sum()

    with pltpu.force_tpu_interpret_mode():  # fwd AND bwd kernels
        g_flash = jax.grad(loss_flash, (0, 1, 2))(qb, kb, vb)
    g_exact = jax.grad(loss_exact, (0, 1, 2))(q, k, v)
    for gf, ge in zip(g_flash, g_exact):
        gf = np.asarray(gf, np.float32)
        ge = np.asarray(ge, np.float32)
        denom = max(1e-6, float(np.abs(ge).max()))
        rel = float(np.abs(gf - ge).max()) / denom
        # bf16 inputs + bf16-quantized LSE: grads stay within ~2% of the
        # exact fp32 gradient at this shape (the bound this test records)
        assert rel < 2e-2, rel


def test_flash_wide_head_matches_reference_interpret():
    """The VAE mid-block shape class: a single 512-wide head (r4 routes it to
    the flash kernel — 15x the chunked-XLA path on chip)."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    b, h, l, d = 2, 1, 256, 512
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, None, block_q=128, block_kv=128)
    zero_bias = jnp.zeros((b * h, l), jnp.float32)
    ref = _xla_reference(q.reshape(-1, l, d), k.reshape(-1, l, d),
                         v.reshape(-1, l, d), zero_bias).reshape(q.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
