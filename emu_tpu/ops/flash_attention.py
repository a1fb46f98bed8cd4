"""Pallas TPU fused attention kernel.

The framework's native replacement for the reference's xformers
`memory_efficient_attention` dependency (ref Emu1/models/eva_vit_model.py:
22, Emu2/emu/eva_vit.py:19) — the entire S×S logits tensor stays in VMEM:
QKᵀ → mask → fp32 softmax → PV happens in one kernel with no HBM round
trip for the attention matrix.

Shape regime: Emu sequences are short (ViT 257/1025 tokens, LM ≤2048 —
SURVEY §5 "long-context: absent"), so K/V for one (batch, head) fit VMEM
whole (2048×128 bf16 = 0.5 MB). Each program computes one query block
against the full K/V — single-pass softmax, no streaming-max bookkeeping.
That is the right design point here; a streaming multi-block variant only
pays off beyond ~8k tokens.

Supported masking: `causal` (optionally offset for unequal q/kv lengths)
and `kv_valid` [B, Skv] padding masks — exactly what the ViT (no mask) and
LM prefill (causal + left-padding) need. Head dims (88/112/128) and
sequence lengths are zero-padded to lane/tile boundaries; padding columns
are masked, padding head-dims contribute zeros.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, scale, causal,
            diag_offset, bq, skv_real):
    q = q_ref[0, 0].astype(jnp.float32)            # [bq, D]
    k = k_ref[0, 0].astype(jnp.float32)            # [Skv, D]
    v = v_ref[0, 0]                                 # [Skv, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                                   # [bq, Skv]

    skv = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, skv), 1)
    keep = col < skv_real                           # kv padding
    if causal:
        iq = pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, skv), 0) + iq * bq
        keep = jnp.logical_and(keep, col <= row + diag_offset)
    keep = jnp.logical_and(keep, valid_ref[0, 0, :][None, :] > 0)
    s = jnp.where(keep, s, _NEG)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    bias=None, mask=None, kv_valid: Optional[jax.Array] = None,
                    scale: float = 1.0, causal: bool = False,
                    interpret: bool = False) -> jax.Array:
    """q [B, Sq, H, D], k/v [B, Skv, H, D], kv_valid [B, Skv] (1 = attend).

    bias/full-mask are not supported here — the dispatcher routes those to
    the XLA path.
    """
    assert bias is None and mask is None, "flash path: use kv_valid/causal"
    b, sq, h, d = q.shape
    skv = k.shape[1]

    d_pad = _round_up(d, 128)
    # Sequence dims only need sublane (8) alignment — Mosaic accepts any
    # block second-to-last dim equal to the (padded) array dim. Pick the
    # largest 8-aligned query block <= 512 that divides the padded length;
    # this cuts the padding waste from 128-alignment (e.g. 257 -> 264
    # instead of 384 rows: -31% work).
    sq_pad = _round_up(sq, 8)
    divisors = [b for b in range(8, min(sq_pad, 512) + 1, 8)
                if sq_pad % b == 0]
    bq = max(divisors)
    if bq < 128 and sq_pad > 512:          # degenerate factorization
        bq = 512
        sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, 8)

    def pad_to(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0),
                           (0, d_pad - d)))

    qt = pad_to(q, sq_pad).transpose(0, 2, 1, 3)     # [B, H, Sq', D']
    kt = pad_to(k, skv_pad).transpose(0, 2, 1, 3)
    vt = pad_to(v, skv_pad).transpose(0, 2, 1, 3)
    if kv_valid is None:
        kv_valid = jnp.ones((b, skv), jnp.int32)
    valid = jnp.pad(kv_valid.astype(jnp.int32),
                    ((0, 0), (0, skv_pad - skv)))[:, None, :]  # [B, 1, Skv']

    grid = (b, h, sq_pad // bq)
    kernel = functools.partial(
        _kernel, scale=scale, causal=causal, diag_offset=skv - sq, bq=bq,
        skv_real=skv)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_pad, d_pad),
                         lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_pad, d_pad),
                         lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_pad), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d_pad),
                               lambda b_, h_, i: (b_, h_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, valid)
    return out.transpose(0, 2, 1, 3)[:, :sq, :, :d]
