"""Chunked-XLA long-sequence attention backend parity."""

import jax
import jax.numpy as jnp
import numpy as np

from humanvid_tpu.ops.attention import _chunked_xla_attention, _xla_attention


def test_chunked_matches_full():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (2, 3, 300, 16))
    k = jax.random.normal(ks[1], (2, 3, 150, 16))
    v = jax.random.normal(ks[2], (2, 3, 150, 16))
    bias = jnp.where(jnp.arange(150)[None, None, None, :] > 100, -1e9, 0.0)
    full = _xla_attention(q, k, v, bias)
    chunked = _chunked_xla_attention(q, k, v, bias, chunk=128)  # 300 -> pad 384
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)


def test_chunked_short_input_passthrough():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, 2, 64, 8))
    k = jax.random.normal(ks[1], (1, 2, 64, 8))
    v = jax.random.normal(ks[2], (1, 2, 64, 8))
    np.testing.assert_allclose(
        np.asarray(_chunked_xla_attention(q, k, v, None, chunk=1024)),
        np.asarray(_xla_attention(q, k, v, None)), atol=1e-6)
