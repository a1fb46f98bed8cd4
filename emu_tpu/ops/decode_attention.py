"""Pallas single-query (decode) attention over a KV cache.

Why: at decode the XLA attention chain (qk einsum → mask → softmax →
av einsum → reshape) is ~6 separate op launches per layer on a [B, 1,
H, D] query — launch-bound, not compute-bound. This kernel does the
whole masked-softmax attention in ONE call, reading the cache once.

Layout trick: the cache stays in the framework's native [B, S, H, D]
(no relayout); the kernel grid is (B,) and each step loads the full
[S, H, D] K/V planes for one batch row — blocks whose last two dims
equal the array dims satisfy Mosaic's tiling rule, and per-head work
vectorizes as lane-segment math on the flattened [S, H*D] view:
scores = segment-sum over D of K ⊙ q, softmax over the sublane (S)
axis for all heads at once, context = sublane-sum of P ⊙ V.

Ref behavior: equals attention.dot_product_attention (XLA path) for
Sq == 1 with a kv_valid mask, which is what llama.decode_step needs
(ref HF LlamaAttention with past_key_values, single new position).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, m_ref, e_ref, et_ref, o_ref, *, scale, cs):
    s, h, dd = k_ref.shape[1], k_ref.shape[2], k_ref.shape[3]
    qf = q_ref[0, 0].astype(jnp.float32).reshape(1, h * dd)
    # Per-head segment reductions/broadcasts run as MXU matmuls against
    # the constant segment matrix E = kron(I_H, 1_D) — Mosaic has no
    # lane-segment reduce/broadcast primitive (a jnp.broadcast_to over a
    # new minor axis lowers to an unsupported gather). The S axis chunks
    # so fp32 [cs, H*D] working values stay ~1 MB each.
    chunks = []
    for c in range(0, s, cs):
        kf = k_ref[0, c:c + cs].astype(jnp.float32).reshape(cs, h * dd)
        sc = jax.lax.dot_general(kf * qf, et_ref[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        chunks.append(jnp.where(m_ref[0, c:c + cs] > 0.0, sc, _NEG_INF))
    scores = jnp.concatenate(chunks, axis=0)                        # [S, H]
    mx = jnp.max(scores, axis=0, keepdims=True)
    p = jnp.exp(scores - mx)
    p = p / jnp.sum(p, axis=0, keepdims=True)                       # [S, H]
    ctx = jnp.zeros((1, h * dd), jnp.float32)
    for c in range(0, s, cs):
        vf = v_ref[0, c:c + cs].astype(jnp.float32).reshape(cs, h * dd)
        pw = jax.lax.dot_general(p[c:c + cs], e_ref[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ctx = ctx + jnp.sum(pw * vf, axis=0, keepdims=True)         # [1, HD]
    o_ref[0, 0] = ctx.reshape(h, dd).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     kv_valid: jax.Array, *, scale: float,
                     interpret: bool = False) -> jax.Array:
    """q [B, 1, H, D] (already roped); k/v [B, S, H, D] cache contents;
    kv_valid [B, S] (1 = attend, includes the current slot). → [B,1,H,D].
    """
    b, _, h, d = q.shape
    s = k.shape[1]
    # largest sublane-aligned chunk <= 64 that tiles S exactly
    cs = max((c for c in range(8, min(64, s) + 1, 8) if s % c == 0),
             default=s)
    mask = kv_valid.astype(jnp.float32)[:, :, None]
    eye = jnp.kron(jnp.eye(h, dtype=jnp.float32),
                   jnp.ones((1, d), jnp.float32)).astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, cs=cs),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 1, h, d), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, s, h, d), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, s, h, d), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, s, 1), lambda i: (i, 0, 0)),
                  pl.BlockSpec((h, h * d), lambda i: (0, 0)),
                  pl.BlockSpec((h * d, h), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, h, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, mask, eye, eye.T)


def decode_attention_fits(q_shape, k_shape, itemsize: int) -> bool:
    """VMEM + tiling feasibility: one batch row's K/V planes (plus fp32
    working copies) must fit; S must be sublane-tileable."""
    b, sq, h, d = q_shape
    s = k_shape[1]
    if sq != 1 or s % 8 or d % 128:
        return False
    # k, v blocks (double-buffered) + chunked fp32 working values
    plane = s * h * d
    return (plane * 4 * itemsize + 64 * h * d * 3 * 4) < 12 * 1024 * 1024
