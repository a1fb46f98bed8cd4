"""Ring attention: sequence-parallel attention over a mesh axis.

For contexts past one chip's HBM/VMEM the sequence dimension itself is
sharded over the mesh: every device holds a [B, S/n, H, D] slice of
q/k/v. K/V slices rotate around the ring (`lax.ppermute` — neighbor
exchange rides the ICI torus), and each device folds one visiting block
per step into a flash-style running-softmax accumulator, so the full
[S, S] score matrix never exists anywhere and per-device memory stays
O(S/n · S/n) per step. The math is the same running max/sum used by the
single-chip streaming kernel (ops/flash_attention.py); here the "blocks"
are other devices' shards.

The reference has no long-context story at all (SURVEY §5) — its NCCL
stack shards batch, not sequence. This is the TPU-native capability
extension: with n chips the attainable context multiplies by n at
constant per-chip memory, and each step's block compute overlaps the
next ppermute under XLA's async collectives.

Use inside `jax.shard_map` with q/k/v sharded as P(None, axis, None,
None) — see tests/test_ring_attention.py for the 8-virtual-device
harness, and `ring_attention_sharded` for the mesh-level wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -1e30


def _block_scores(q, k, scale, row0, col0, causal, valid_blk, s_total):
    """fp32 masked logits of a local q slice against one visiting kv block.

    row0/col0 are the global positions of q[0] / k[0] (causal alignment
    across shards)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s * jnp.float32(scale)
    sq, skv = q.shape[1], k.shape[1]
    if causal:
        row = row0 + jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        col = col0 + jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        s = jnp.where((col <= row)[None, None], s, _NEG)
    if valid_blk is not None:
        s = jnp.where(valid_blk[:, None, None, :].astype(bool), s, _NEG)
    return s


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   axis_name: str, scale: Optional[float] = None,
                   causal: bool = False,
                   kv_valid: Optional[jax.Array] = None) -> jax.Array:
    """Per-shard body (call under shard_map). q/k/v [B, S/n, H, D].

    Sequence must be sharded contiguously over `axis_name` (shard i holds
    global positions [i·S/n, (i+1)·S/n)). kv_valid [B, S/n] rotates with
    its kv shard. Softmax statistics accumulate in fp32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    row0 = idx * s_local

    perm = [(i, (i + 1) % n) for i in range(n)]  # shard from idx-1 next step

    if kv_valid is None:
        kv_valid = jax.lax.pcast(jnp.ones((b, s_local), jnp.int32),
                                 axis_name, to='varying')
    kv_valid = kv_valid.astype(jnp.int32)

    # Freshly-created carries are device-invariant to the vma type system;
    # mark them varying over the ring axis so the loop carry typechecks.
    acc0, m0, l0 = (
        jax.lax.pcast(x, axis_name, to='varying') for x in (
            jnp.zeros((b, s_local, h, d), jnp.float32),
            jnp.full((b, h, s_local, 1), _NEG, jnp.float32),
            jnp.zeros((b, h, s_local, 1), jnp.float32)))

    def step(t, carry):
        k_blk, v_blk, valid_blk, acc, m, l = carry
        # perm sends shard i -> i+1, so after t rotations this device
        # holds the shard originally owned by (idx - t) mod n.
        col0 = ((idx - t) % n) * s_local
        s = _block_scores(q, k_blk, scale, row0, col0, causal, valid_blk,
                          n * s_local)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                          # [B, H, Sq, Skv]
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v_blk.dtype), v_blk,
                        preferred_element_type=jnp.float32)
        acc = acc * corr.transpose(0, 2, 1, 3) + pv
        # Rotate kv to the next device. The final rotation returns every
        # shard to its owner — a branch-free no-op by construction.
        k_blk, v_blk, valid_blk = (
            jax.lax.ppermute(x, axis_name, perm)
            for x in (k_blk, v_blk, valid_blk))
        return k_blk, v_blk, valid_blk, acc, m_new, l

    carry = (k, v, kv_valid, acc0, m0, l0)
    carry = jax.lax.fori_loop(0, n, step, carry)
    _, _, _, acc, _, l = carry
    out = acc / (l.transpose(0, 2, 1, 3) + 1e-30)
    return out.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh: Mesh, *, axis: str = "model",
                           scale: Optional[float] = None,
                           causal: bool = False, kv_valid=None):
    """Mesh-level entry: q/k/v [B, S, H, D] get sequence-sharded over
    `axis` and attended with the ring algorithm."""
    seq_spec = P(None, axis, None, None)
    in_specs = [seq_spec, seq_spec, seq_spec]
    args = [q, k, v]
    if kv_valid is not None:
        in_specs.append(P(None, axis))
        args.append(kv_valid)

    def body(q, k, v, *rest):
        kv = rest[0] if rest else None
        return ring_attention(q, k, v, axis_name=axis, scale=scale,
                              causal=causal, kv_valid=kv)

    fn = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=seq_spec)
    return fn(*args)
