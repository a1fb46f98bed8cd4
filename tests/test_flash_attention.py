"""Pallas flash attention vs the XLA reference path (interpret mode, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emu_tpu.ops.attention import _xla_attention
from emu_tpu.ops.flash_attention import flash_attention


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("d", [88, 128])
def test_flash_matches_xla_unmasked(d):
    b, s, h = 2, 257, 4
    q, k, v = (_rand(i, (b, s, h, d)) for i in range(3))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, False)
    out = flash_attention(q, k, v, scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_flash_causal_with_padding():
    b, s, h, d = 2, 130, 2, 64
    q, k, v = (_rand(i + 10, (b, s, h, d)) for i in range(3))
    kv_valid = np.ones((b, s), np.int32)
    kv_valid[0, :7] = 0                     # left padding
    ref = _xla_attention(q, k, v, None, None, jnp.asarray(kv_valid),
                         d ** -0.5, True)
    out = flash_attention(q, k, v, kv_valid=jnp.asarray(kv_valid),
                          scale=d ** -0.5, causal=True, interpret=True)
    valid = kv_valid.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-3, atol=2e-3)


def test_flash_cross_lengths():
    """Sq != Skv with causal offset (decode-against-cache alignment)."""
    b, h, d = 1, 2, 32
    sq, skv = 129, 260
    q = _rand(20, (b, sq, h, d))
    k = _rand(21, (b, skv, h, d))
    v = _rand(22, (b, skv, h, d))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, True)
    out = flash_attention(q, k, v, scale=d ** -0.5, causal=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)
