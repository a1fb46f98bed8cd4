"""Ring attention (sequence-parallel over the mesh) vs the full oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emu_tpu.ops.attention import _xla_attention
from emu_tpu.parallel import make_mesh
from emu_tpu.parallel.ring_attention import ring_attention_sharded


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _mesh():
    return make_mesh((1, 8))          # all 8 virtual devices on "model"


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(causal):
    b, s, h, d = 2, 64, 2, 16          # 8 devices x 8 tokens each
    q, k, v = (_rand(i, (b, s, h, d)) for i in range(3))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, causal)
    out = ring_attention_sharded(q, k, v, _mesh(), causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_ring_with_padding_mask():
    """kv_valid rotates with its shard: mask out a whole device's shard
    plus a partial one."""
    b, s, h, d = 1, 64, 2, 16
    q, k, v = (_rand(10 + i, (b, s, h, d)) for i in range(3))
    kv_valid = np.ones((b, s), np.int32)
    kv_valid[0, :12] = 0               # shard 0 fully + shard 1 partially
    ref = _xla_attention(q, k, v, None, None, jnp.asarray(kv_valid),
                         d ** -0.5, True)
    out = ring_attention_sharded(q, k, v, _mesh(), causal=True,
                                 kv_valid=jnp.asarray(kv_valid))
    valid = kv_valid.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-5, atol=2e-5)


def test_ring_jits_and_shards():
    """Under jit with sharded inputs the output keeps the sequence spec."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = _mesh()
    b, s, h, d = 1, 64, 2, 16
    q, k, v = (_rand(20 + i, (b, s, h, d)) for i in range(3))
    spec = NamedSharding(mesh, P(None, "model", None, None))
    q, k, v = (jax.device_put(x, spec) for x in (q, k, v))
    fn = jax.jit(lambda q, k, v: ring_attention_sharded(
        q, k, v, mesh, causal=True))
    out = fn(q, k, v)
    assert out.sharding.spec == P(None, "model", None, None)
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_ring_attention_grads_match_full():
    """Sequence-parallel TRAINING: jax.grad through the ring (ppermute
    transposes to the reverse rotation) matches full-attention grads —
    long-context training works over the sequence axis."""
    import jax
    import jax.numpy as jnp
    from emu_tpu.ops.attention import _xla_attention
    from emu_tpu.parallel import make_mesh
    from emu_tpu.parallel.ring_attention import ring_attention_sharded

    mesh = make_mesh((8,), axis_names=("sp",), devices=jax.devices())
    B, S, H, D = 2, 64, 4, 32
    ks = iter(jax.random.split(jax.random.PRNGKey(5), 3))
    q = jax.random.normal(next(ks), (B, S, H, D))
    k = jax.random.normal(next(ks), (B, S, H, D))
    v = jax.random.normal(next(ks), (B, S, H, D))

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, mesh, axis="sp", causal=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_full(q, k, v):
        o = _xla_attention(q, k, v, None, None, None, D ** -0.5, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_r = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_f = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_r, g_f))
    assert worst < 1e-4, worst
