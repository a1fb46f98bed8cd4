"""Pallas single-query (decode) attention over a KV cache.

Why: at decode the XLA attention chain (qk einsum → mask → softmax →
av einsum → reshape) is ~6 separate op launches per layer on a [B, 1,
H, D] query AND it streams the cache twice (once per einsum) — at 2k
context that is ~670 MB of HBM per layer per step. This kernel does the
whole masked-softmax attention in ONE call with a flash-style running
softmax over cache chunks, so K and V stream exactly once.

Layout trick: the cache stays in the framework's native [B, S, H, D]
(no relayout); the grid is (B, S/cs) with the chunk axis innermost, and
per-head work vectorizes as lane-segment math on flattened [cs, H*D]
views: scores = segment-sum over D of K ⊙ q, softmax statistics per
head ride [1, H] scratch, context accumulates in [1, H*D]. Mosaic has
no lane-segment reduce/broadcast primitive (a jnp.broadcast_to over a
new minor axis lowers to an unsupported gather), so segment reductions
and broadcasts run as MXU matmuls against E = kron(I_H, 1_D).

Ref behavior: equals attention.dot_product_attention (XLA path) for
Sq == 1 with a kv_valid mask, which is what llama.decode_step needs
(ref HF LlamaAttention with past_key_values, single new position).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, m_ref, e_ref, et_ref, o_ref,
            acc, mx, lse, *, scale):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    cs, h, dd = k_ref.shape[1], k_ref.shape[2], k_ref.shape[3]

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        mx[:] = jnp.full_like(mx, _NEG_INF)
        lse[:] = jnp.zeros_like(lse)

    qf = q_ref[0, 0].astype(jnp.float32).reshape(1, h * dd)
    kf = k_ref[0].astype(jnp.float32).reshape(cs, h * dd)
    sc = jax.lax.dot_general(kf * qf, et_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    sc = jnp.where(m_ref[0] > 0.0, sc, _NEG_INF)            # [cs, H]
    m_old = mx[:]
    m_new = jnp.maximum(m_old, jnp.max(sc, axis=0, keepdims=True))
    p = jnp.exp(sc - m_new)                                 # [cs, H]
    corr = jnp.exp(m_old - m_new)                           # [1, H]
    lse[:] = lse[:] * corr + jnp.sum(p, axis=0, keepdims=True)
    mx[:] = m_new
    vf = v_ref[0].astype(jnp.float32).reshape(cs, h * dd)
    pw = jax.lax.dot_general(p, e_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cw = jax.lax.dot_general(corr, e_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc[:] = acc[:] * cw + jnp.sum(pw * vf, axis=0, keepdims=True)

    @pl.when(c == nc - 1)
    def _():
        lw = jax.lax.dot_general(lse[:], e_ref[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, 0] = (acc[:] / (lw + 1e-30)).reshape(h, dd
                                                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     kv_valid: jax.Array, *, scale: float,
                     interpret: bool = False) -> jax.Array:
    """q [B, 1, H, D] (already roped); k/v [B, S, H, D] cache contents;
    kv_valid [B, S] (1 = attend, includes the current slot). → [B,1,H,D].
    """
    b, _, h, d = q.shape
    s = k.shape[1]
    cs = _chunk(s, h * d)
    mask = kv_valid.astype(jnp.float32)[:, :, None]
    eye = jnp.kron(jnp.eye(h, dtype=jnp.float32),
                   jnp.ones((1, d), jnp.float32)).astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b, s // cs),
        in_specs=[pl.BlockSpec((1, 1, h, d), lambda i, c: (i, 0, 0, 0)),
                  pl.BlockSpec((1, cs, h, d), lambda i, c: (i, c, 0, 0)),
                  pl.BlockSpec((1, cs, h, d), lambda i, c: (i, c, 0, 0)),
                  pl.BlockSpec((1, cs, 1), lambda i, c: (i, c, 0)),
                  pl.BlockSpec((h, h * d), lambda i, c: (0, 0)),
                  pl.BlockSpec((h * d, h), lambda i, c: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, h, d), lambda i, c: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((1, h * d), jnp.float32),
                        pltpu.VMEM((1, h), jnp.float32),
                        pltpu.VMEM((1, h), jnp.float32)],
        interpret=interpret,
    )(q, k, v, mask, eye, eye.T)


def _chunk(s: int, hd: int) -> int:
    """Largest sublane-aligned cache chunk that tiles S exactly and keeps
    the double-buffered k/v tiles plus fp32 working values within the
    scoped-VMEM budget (~16 bytes/element of chunk)."""
    cap = max(8, min(256, (8 * 1024 * 1024) // (hd * 16) // 8 * 8))
    return max((c for c in range(8, min(cap, s) + 1, 8) if s % c == 0),
               default=s)


def decode_attention_fits(q_shape, k_shape, itemsize: int) -> bool:
    """Tiling + VMEM feasibility. The chunked running softmax keeps VMEM
    bounded by the chunk, so any sublane-tileable S fits; head width must
    be lane-aligned and per-chunk fp32 working values must be modest."""
    b, sq, h, d = q_shape
    s = k_shape[1]
    if sq != 1 or s % 8 or d % 128:
        return False
    # Past ~1k slots the XLA einsum chain wins on this target: the
    # kernel's sub-MB per-chunk DMAs sustain only ~170 GB/s vs XLA's
    # ~700 (measured 59 vs 89 tok/s at 2k ctx), so route long caches
    # to XLA even though the running softmax handles any length.
    if s > 1024:
        return False
    cs = _chunk(s, h * d)
    # k/v chunk blocks (double-buffered) + fp32 flat working values
    return cs * h * d * 16 < 12 * 1024 * 1024
