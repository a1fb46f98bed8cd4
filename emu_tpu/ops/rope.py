"""Rotary position embeddings: 1D LLaMA-style and 2D EVA vision-style.

Ref behavior: HF LLaMA rotary (half-split rotate) for the decoder, and
Emu's `VisionRotaryEmbeddingFast` (interleaved-pair rotate over a 2D grid,
ref Emu1/models/rope.py:80-146) for the ViT when `rope=True`.

Tables are precomputed host-side as fp32 constants and closed over by the
jitted forward — no trig inside the hot loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 1D LLaMA RoPE (half-split layout, matching HF transformers)
# ---------------------------------------------------------------------------


def llama_rope_tables(head_dim: int, max_len: int, theta: float = 10000.0
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Return (cos, sin) tables of shape [max_len, head_dim]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                                / head_dim))
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)                       # [S, D/2]
    emb = np.concatenate([freqs, freqs], axis=-1)       # [S, D]
    return (np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32))


def _rotate_half(x: jax.Array) -> jax.Array:
    d2 = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)


def gather_rope_rows(cos: jax.Array, sin: jax.Array, positions: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """Pre-gather per-position rope rows → ([B, S, 1, D], [B, S, 1, D]) fp32.

    Split out of apply_llama_rope so decoder layers can HOIST the gather
    out of the layer scan: the rows are identical for every layer, and on
    the dispatch-latency-bound decode path the per-layer table gathers
    were ~6 extra op launches per layer per step."""
    c = cos[positions][:, :, None, :].astype(jnp.float32)  # [B, S, 1, D]
    s = sin[positions][:, :, None, :].astype(jnp.float32)
    return c, s


def apply_rope_rows(q: jax.Array, k: jax.Array, c: jax.Array, s: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Apply RoPE from pre-gathered rows (see gather_rope_rows).

    Rotation runs in fp32 and casts back — bf16 cos/sin tables measurably
    drift logits over 2k positions."""
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * c + _rotate_half(qf) * s
    k_out = kf * c + _rotate_half(kf) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def apply_llama_rope(q: jax.Array, k: jax.Array, cos: jax.Array,
                     sin: jax.Array, positions: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """Apply RoPE. q/k: [B, S, H, D]; positions: [B, S] absolute indices."""
    c, s = gather_rope_rows(cos, sin, positions)
    return apply_rope_rows(q, k, c, s)


# ---------------------------------------------------------------------------
# 2D vision RoPE (interleaved-pair layout, EVA style)
# ---------------------------------------------------------------------------


def vision_rope_tables(half_head_dim: int, pt_seq_len: int,
                       ft_seq_len: int | None = None, theta: float = 10000.0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of shape [ft*ft, 2*half_head_dim] over the patch grid.

    Mirrors VisionRotaryEmbeddingFast: per-axis angles repeated into
    interleaved pairs, then h-axis and w-axis halves concatenated.
    """
    if ft_seq_len is None:
        ft_seq_len = pt_seq_len
    dim = half_head_dim
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2]
                             / dim))
    t = np.arange(ft_seq_len, dtype=np.float64) / ft_seq_len * pt_seq_len
    ang = np.outer(t, freqs)                            # [ft, dim/2]
    ang = np.repeat(ang, 2, axis=-1)                    # interleave pairs
    h = np.broadcast_to(ang[:, None, :], (ft_seq_len, ft_seq_len, dim))
    w = np.broadcast_to(ang[None, :, :], (ft_seq_len, ft_seq_len, dim))
    full = np.concatenate([h, w], axis=-1).reshape(ft_seq_len * ft_seq_len,
                                                   2 * dim)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def _rotate_pairs(x: jax.Array) -> jax.Array:
    # (-x2, x1) over interleaved pairs, ref Emu1/models/rope.py:24-28.
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_vision_rope(x: jax.Array, cos: jax.Array, sin: jax.Array
                      ) -> jax.Array:
    """x: [B, S, H, D] patch tokens (no cls); cos/sin: [S, D]."""
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_pairs(xf) * s).astype(x.dtype)
