"""Fused (add+)RMSNorm custom-VJP kernel vs the XLA reference
(interpret mode on CPU), including the dual-output fan-out the decoder
layer uses (y feeds the next residual add AND the norm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from emu_tpu.ops.fused_norm import add_rmsnorm, rms_norm_fused
from emu_tpu.ops.layers import rms_norm

EPS = 1e-6


def _data(dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 150, 256), dtype)  # M=300: pad path
    r = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype)
    w = (jax.random.normal(jax.random.PRNGKey(2), (256,), dtype)
         + jnp.asarray(1.0, dtype))
    return w, x, r


def test_add_rmsnorm_forward_matches_reference():
    w, x, r = _data()
    y, h = add_rmsnorm(w, x, r, EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x + r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h),
                               np.asarray(rms_norm(w, x + r, EPS)),
                               rtol=2e-5, atol=2e-5)


def test_rms_norm_fused_forward_matches_reference():
    w, x, _ = _data()
    np.testing.assert_allclose(
        np.asarray(rms_norm_fused(w, x, EPS, interpret=True)),
        np.asarray(rms_norm(w, x, EPS)), rtol=2e-5, atol=2e-5)


def test_add_rmsnorm_grads_match_reference():
    w, x, r = _data()

    def loss_fused(w, x, r):
        y, h = add_rmsnorm(w, x, r, EPS, interpret=True)
        return jnp.sum(jnp.sin(h) + 0.3 * jnp.cos(y))

    def loss_ref(w, x, r):
        y = x + r
        return jnp.sum(jnp.sin(rms_norm(w, y, EPS)) + 0.3 * jnp.cos(y))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(w, x, r)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(w, x, r)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def test_rms_norm_fused_grads_match_reference():
    w, x, _ = _data()
    g_f = jax.grad(lambda w, x: jnp.sum(jnp.sin(
        rms_norm_fused(w, x, EPS, interpret=True))), argnums=(0, 1))(w, x)
    g_r = jax.grad(lambda w, x: jnp.sum(jnp.sin(
        rms_norm(w, x, EPS))), argnums=(0, 1))(w, x)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_add_rmsnorm_bf16_fp32_island(dtype):
    """bf16 activations: the reduction runs fp32 (island rule) — outputs
    match the XLA reference bit-for-bit after the bf16 round."""
    w, x, r = _data(dtype)
    y, h = add_rmsnorm(w, x, r, EPS, interpret=True)
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(x + r, np.float32))
    ref = rms_norm(w, x + r, EPS)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)
