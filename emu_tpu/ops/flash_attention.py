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


def _kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref=None, *, scale,
            causal, diag_offset, bq, skv_real):
    q = q_ref[0, 0]                                 # [bq, D]
    k = k_ref[0, 0]                                 # [Skv, D]
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

    # bf16 row-max (same trick as the ViT bhsd kernel): halves the lane
    # reduction pass. m may sit ~0.4% below the true max, so exp(s - m)
    # stays within exp(0.004|m|) of 1 — overflow would need |s| ~ 2e4,
    # unreachable from normed activations; softmax and the lse residual
    # are shift-invariant for any m, so the VJP math is unchanged. The
    # clip guards fully-masked rows (all s = -1e30): bf16 can round the
    # max BELOW -1e30, making s - m ~ +4e27 → exp overflow → NaN; legit
    # rows never exceed ~0.4, so 30 is unreachable there.
    m = jnp.max(s.astype(jnp.bfloat16), axis=-1,
                keepdims=True).astype(jnp.float32)
    p = jnp.exp(jnp.minimum(s - m, 30.0))
    denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)
    if lse_ref is not None:                         # softmax stats for VJP
        lse_ref[0, 0] = m + jnp.log(denom)          # [bq, 1]


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
        q = q_ref[0, 0]                              # [bq, D]
        k = k_ref[0, 0]                              # [bk, D]
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
        q = q_ref[0, hh]
        k = k_ref[0, hh]
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


# ---------------------------------------------------------------------------
# Packed-QKV variant: consumes the fused QKV projection output directly.
#
# The BSHD kernels above still cost four whole-tensor HBM transposes per
# ViT layer ([B,S,H,D] -> [B,H,S,D] for q/k/v and back for o) — measured
# ~0.6 ms/layer at ViT-g batch 32, the largest remaining gap to the matmul
# roofline. This kernel removes all of them: the [B, S, 3*H*D] output of
# the qkv dense is viewed as [B, S, 3, H*D] (free reshape) and passed
# three times with index maps pinning the q/k/v plane; heads are sliced as
# contiguous lane ranges inside VMEM (a cheap in-core relayout, not an HBM
# pass), and the output is written directly in [B, S, H*D] — exactly what
# the proj matmul consumes.
#
# Constraint: a blocked lane dim must be a multiple of 128, so the head
# group hg must satisfy (hg * D) % 128 == 0 unless hg == H. Both Emu ViTs
# qualify: ViT-g 16x88 = 1408 = 11*128 (hg=16), EVA-4B 8x112 = 896 = 7*128.
# ---------------------------------------------------------------------------


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, hg, d, s_real):
    skv = k_ref.shape[1]
    # kv-padding mask as a [1, skv] additive bias row — broadcast into the
    # logits add, never materializing a [bq, skv] mask (VMEM-stack bound).
    col = jax.lax.broadcasted_iota(jnp.int32, (1, skv), 1)
    pad_bias = jnp.where(col < s_real, 0.0, _NEG)
    for hh in range(hg):                  # static unroll over the head group
        q = q_ref[0, :, hh * d:(hh + 1) * d]
        k = k_ref[0, :, hh * d:(hh + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + pad_bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype),
                                v_ref[0, :, hh * d:(hh + 1) * d],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, hh * d:(hh + 1) * d] = (o / denom).astype(o_ref.dtype)


def _packed_vmem(hg, d, bq, s_pad, itemsize):
    """Mosaic scoped-VMEM footprint model, calibrated against the
    compiler's own accounting (EVA-4B hg=8 bq=344 s_pad=1032 reports
    18.16 MB; this model gives 18.1)."""
    lanes = _round_up(hg * d, 128)
    kv = 2 * 2 * s_pad * lanes * itemsize            # k+v double-buffered
    qo = 2 * 2 * bq * lanes * itemsize               # q block + out block
    tmp = 4.5 * bq * _round_up(s_pad, 128) * 4       # logits/exp/cast temps
    casts = 8 * s_pad * 128                          # per-head q/k fp32
    return kv + qo + tmp + casts


def packed_qkv_plan(h: int, d: int, s: int, itemsize: int):
    """(hg, bq, s_pad) for mha_packed_qkv, or None if nothing fits.

    hg: head group with (hg*d) % 128 == 0 (the lane-block rule — blocks of
    the packed [B, S, 3*H*D] lane dim must be 128-aligned). s_pad: the
    padded sequence (8-aligned, or 128-aligned when the 8-aligned length
    factors badly, e.g. 1032 = 8*3*43 only offers bq 344/24). bq: the
    largest query block with everything under Mosaic's 16 MB scoped limit.
    Candidates are ranked by total work (s_pad) then by bq."""
    groups = [g for g in range(h, 0, -1)
              if h % g == 0 and (g * d) % 128 == 0]
    cands = []
    for hg in groups:
        for s_pad in sorted({_round_up(s, 8), _round_up(s, 128)}):
            fits = [bq for bq in range(8, min(s_pad, 512) + 1, 8)
                    if s_pad % bq == 0
                    and _packed_vmem(hg, d, bq, s_pad, itemsize) <= 15.5e6]
            if fits:
                cands.append((hg, max(fits), s_pad))
    if not cands:
        return None
    # A bq below 64 underfills the MXU badly; prefer any plan with bq>=64,
    # then least padded work, then biggest head group / query block.
    return min(cands, key=lambda c: (c[1] < 64, c[2], -c[0], -c[1]))


@functools.partial(jax.jit, static_argnames=("num_heads", "head_dim",
                                              "scale", "interpret"))
def mha_packed_qkv(qkv: jax.Array, num_heads: int, head_dim: int, *,
                   scale: float = 1.0, interpret: bool = False) -> jax.Array:
    """qkv [B, S, 3*H*D] (q|k|v blocks, the fused-projection layout) →
    attention output [B, S, H*D], no HBM transposes on either side.

    Unmasked self-attention (the ViT encoder path). See packed_qkv_plan
    for the blocking rules."""
    b, s, three_hd = qkv.shape
    hd = num_heads * head_dim
    assert three_hd == 3 * hd
    plan = packed_qkv_plan(num_heads, head_dim, s, qkv.dtype.itemsize)
    assert plan is not None, "no head-group fits VMEM; use batched_mha"
    hg, bq, s_pad = plan
    x = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))

    # The q/k/v planes are contiguous hd-wide lane ranges of the packed
    # array; with lane blocks of hg*D, head group g of plane p starts at
    # lane-block index p*(H/hg) + g. The same array is passed three times
    # with the three plane offsets baked into the index maps.
    nb = num_heads // hg

    def spec(plane):                      # k/v: all rows, one head group
        return pl.BlockSpec((1, s_pad, hg * head_dim),
                            lambda b_, g, iq, p=plane: (b_, 0, p * nb + g),
                            memory_space=pltpu.VMEM)

    q_spec = pl.BlockSpec((1, bq, hg * head_dim),
                          lambda b_, g, iq: (b_, iq, g),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_packed_kernel, scale=scale, hg=hg,
                               d=head_dim, s_real=s)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb, s_pad // bq),
        in_specs=[q_spec, spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, bq, hg * head_dim),
                               lambda b_, g, iq: (b_, iq, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), qkv.dtype),
        interpret=interpret,
    )(x, x, x)
    return out[:, :s]


# ---------------------------------------------------------------------------
# BHSD-direct variant: inputs/outputs already head-major [B, H, S, D].
#
# The fastest ViT formulation measured on v5e-1: the q/k/v projections are
# einsums with head-major *output* layouts ("bsm,mhd->bhsd") whose
# transposes XLA fuses into the matmul epilogue, and this kernel then
# slices heads on a major block axis — free, unlike the ~0.5 ms/layer of
# in-kernel lane relayouts the packed-QKV kernel pays at D=88, and unlike
# the ~0.2 ms of standalone HBM transposes batched_mha pays. The q/v
# projection biases are folded in here (k bias is identically zero in EVA,
# and a v bias is equivalent to adding it to the output rows — but we add
# it to v directly, which is just as free on the VPU).
# ---------------------------------------------------------------------------


def _bhsd_kernel(q_ref, k_ref, v_ref, bq_ref, bv_ref, o_ref, *,
                 scale, hb, s_real, static_max=None):
    skv = k_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, skv), 1)
    pad_bias = jnp.where(col < s_real, 0.0, _NEG)
    for hh in range(hb):                  # head slice on a major dim: free
        q = q_ref[0, hh] + bq_ref[hh]     # bias [1, D] broadcasts over rows
        k = k_ref[0, hh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + pad_bias
        if static_max is not None:
            # max-pass ELIMINATION (EMU_TPU_VIT_STATIC_MAX, opt-in):
            # subtract a calibrated constant instead of reducing the row
            # max — softmax is shift-invariant, so exact math is
            # unchanged; measured 374 -> ~300 us/layer at ViT-g shapes
            # (tools/exp_vit_attn.py). SAFETY CONTRACT: the bound must
            # sit within ~+70 of the true row max (denominator subnormal
            # underflow beyond that) and no more than ~-60 below it (the
            # clip then misweights top entries). bf16 row-max stays the
            # default — see BASELINE.md for why this is opt-in only.
            p = jnp.exp(jnp.minimum(s - static_max, 60.0))
        else:
            # bf16 max: halves the lane-reduction pass. m may sit a hair
            # (~0.4%) below the true row max, so exp(s - m) stays within
            # exp(0.004|m|) of 1 — overflow would need |scores| ~ 2e4,
            # unreachable from LN'd activations at these dims; the
            # softmax output is unchanged (shift invariance).
            m = jnp.max(s.astype(jnp.bfloat16), axis=-1,
                        keepdims=True).astype(jnp.float32)
            p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
        o = jax.lax.dot_general(p.astype(v_ref.dtype),
                                v_ref[0, hh] + bv_ref[hh],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, hh] = (o / denom).astype(o_ref.dtype)


def bhsd_plan(h: int, d: int, s: int, itemsize: int):
    """(hb, bq, s_pad) for mha_bhsd, or None (s too short to bother).

    No lane-alignment constraint (D is the minor dim of its own tile), so
    any head block works; size against the same calibrated VMEM model."""
    cands = []
    d_pad = _round_up(max(d, 128), 128)
    for s_pad in sorted({_round_up(s, 8), _round_up(s, 128)}):
        for hb in range(h, 0, -1):
            if h % hb:
                continue
            for bq in range(min(s_pad, 512), 7, -8):
                if s_pad % bq:
                    continue
                kv = 2 * 2 * s_pad * d_pad * hb * itemsize
                qo = 2 * 2 * bq * d_pad * hb * itemsize
                tmp = 4.5 * bq * _round_up(s_pad, 128) * 4
                if kv + qo + tmp <= 15.5e6:
                    cands.append((hb, bq, s_pad))
                break                      # only the largest bq per (pad, hb)
    if not cands:
        return None
    return min(cands, key=lambda c: (c[1] < 64, c[2], -c[0], -c[1]))


@functools.partial(jax.jit, static_argnames=("scale", "s_real", "interpret",
                                             "static_max"))
def mha_bhsd(q: jax.Array, k: jax.Array, v: jax.Array,
             q_bias: Optional[jax.Array] = None,
             v_bias: Optional[jax.Array] = None, *,
             scale: float = 1.0, s_real: Optional[int] = None,
             interpret: bool = False,
             static_max: Optional[float] = None) -> jax.Array:
    """Unmasked self-attention on head-major [B, H, S', D] inputs.

    S' must be padded (8-aligned) by the caller per bhsd_plan; rows beyond
    `s_real` are masked out of the softmax. q_bias/v_bias are per-head
    [H, D] projection biases applied in-kernel. static_max (opt-in via
    EMU_TPU_VIT_STATIC_MAX) replaces the row-max reduction with a
    calibrated constant — see _bhsd_kernel for the safety contract."""
    b, h, sp, d = q.shape
    s_real = sp if s_real is None else s_real
    plan = bhsd_plan(h, d, s_real, q.dtype.itemsize)
    assert plan is not None and plan[2] == sp, (plan, sp)
    hb, bq, _ = plan
    zeros = jnp.zeros((h, 1, d), q.dtype)
    qb = zeros if q_bias is None else q_bias.reshape(h, 1, d).astype(q.dtype)
    vb = zeros if v_bias is None else v_bias.reshape(h, 1, d).astype(q.dtype)

    kern = functools.partial(_bhsd_kernel, scale=scale, hb=hb, s_real=s_real,
                             static_max=static_max)
    kv_spec = pl.BlockSpec((1, hb, sp, d), lambda i, g, iq: (i, g, 0, 0),
                           memory_space=pltpu.VMEM)
    qo_spec = pl.BlockSpec((1, hb, bq, d), lambda i, g, iq: (i, g, iq, 0),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((hb, 1, d), lambda i, g, iq: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, h // hb, sp // bq),
        in_specs=[qo_spec, kv_spec, kv_spec, b_spec, b_spec],
        out_specs=qo_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sp, d), q.dtype),
        interpret=interpret,
    )(q, k, v, qb, vb)


# K/V for one (batch, head) beyond this stay out of single-pass VMEM
_STREAMING_THRESHOLD = 4096


def _short_plan(sq: int):
    """(bq, sq_pad): largest 8-aligned query block <= 512 dividing the
    padded length — cuts padding waste vs 128-alignment (257 -> 264
    instead of 384 rows: -31% work)."""
    sq_pad = _round_up(sq, 8)
    divisors = [x for x in range(8, min(sq_pad, 512) + 1, 8)
                if sq_pad % x == 0]
    bq = max(divisors)
    if bq < 128 and sq_pad > 512:          # degenerate factorization
        bq = 512
        sq_pad = _round_up(sq, bq)
    return bq, sq_pad


def _pad_bhsd(x, s_pad, d_pad):
    d = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0),
                    (0, d_pad - d)))
    return x.transpose(0, 2, 1, 3)                    # [B, H, S', D']


def _valid_padded(kv_valid, b, skv, skv_pad):
    if kv_valid is None:
        kv_valid = jnp.ones((b, skv), jnp.int32)
    return jnp.pad(kv_valid.astype(jnp.int32),
                   ((0, 0), (0, skv_pad - skv)))[:, None, :]  # [B, 1, Skv']


def _flash_short(q, k, v, kv_valid, scale, causal, interpret,
                 with_lse: bool = False):
    """Short-sequence tier (K/V whole in VMEM). Returns out (sliced) and,
    with with_lse, the padded-layout residuals (qt, kt, vt, ot, lse,
    valid) for the backward kernels."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    d_pad = _round_up(d, 128)
    bq, sq_pad = _short_plan(sq)
    skv_pad = _round_up(skv, 8)

    qt = _pad_bhsd(q, sq_pad, d_pad)
    kt = _pad_bhsd(k, skv_pad, d_pad)
    vt = _pad_bhsd(v, skv_pad, d_pad)
    valid = _valid_padded(kv_valid, b, skv, skv_pad)

    grid = (b, h, sq_pad // bq)
    kernel = functools.partial(
        _kernel, scale=scale, causal=causal, diag_offset=skv - sq, bq=bq,
        skv_real=skv)
    qo_spec = pl.BlockSpec((1, 1, bq, d_pad),
                           lambda b_, h_, i: (b_, h_, i, 0),
                           memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, skv_pad, d_pad),
                           lambda b_, h_, i: (b_, h_, 0, 0),
                           memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, 1, skv_pad), lambda b_, h_, i: (b_, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype)
    if with_lse:
        lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, i: (b_, h_, i, 0),
                                memory_space=pltpu.VMEM)
        ot, lse = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[qo_spec, kv_spec, kv_spec, valid_spec],
            out_specs=(qo_spec, lse_spec),
            out_shape=(out_shape,
                       jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32)),
            interpret=interpret,
        )(qt, kt, vt, valid)
        out = ot.transpose(0, 2, 1, 3)[:, :sq, :, :d]
        return out, (qt, kt, vt, ot, lse, valid)
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[qo_spec, kv_spec, kv_spec, valid_spec],
        out_specs=qo_spec, out_shape=out_shape, interpret=interpret,
    )(qt, kt, vt, valid)
    return out.transpose(0, 2, 1, 3)[:, :sq, :, :d], None


@functools.partial(jax.jit, static_argnames=("scale", "causal", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    bias=None, mask=None, kv_valid: Optional[jax.Array] = None,
                    scale: float = 1.0, causal: bool = False,
                    interpret: bool = False) -> jax.Array:
    """q [B, Sq, H, D], k/v [B, Skv, H, D], kv_valid [B, Skv] (1 = attend).

    bias/full-mask are not supported here — the dispatcher routes those to
    the XLA path. Contexts beyond the VMEM budget stream K/V in blocks
    with a running-softmax accumulator.

    Differentiable: the short tier has a custom VJP (recompute-based
    flash backward, see _flash_bwd); the streaming tier is forward-only
    (long-context training belongs to ring attention).
    """
    assert bias is None and mask is None, "flash path: use kv_valid/causal"
    if k.shape[1] > _STREAMING_THRESHOLD:
        return _flash_streaming(q, k, v, kv_valid, scale, causal, interpret)
    b, skv = q.shape[0], k.shape[1]
    if kv_valid is None:
        kv_valid = jnp.ones((b, skv), jnp.int32)
    return _flash_diff(q, k, v, kv_valid.astype(jnp.float32), scale, causal,
                       interpret)


# ---------------------------------------------------------------------------
# Backward (custom VJP): standard recompute-based flash backward.
#
# Residuals are O and the per-row logsumexp L; both backward kernels
# recompute the logits block and form P = exp(S - L) (the normalized
# softmax) instead of storing the S×S matrix. With D = rowsum(dO ∘ O):
#   dV = Pᵀ dO
#   dS = P ∘ (dO Vᵀ − D)
#   dQ = dS K · scale      (one kernel, grid over q blocks, K/V in VMEM)
#   dK = dSᵀ Q · scale     (one kernel, grid over kv blocks, Q/dO/O in VMEM)
# Replaces the backward half of the reference's xformers dependency
# (Emu1/models/eva_vit_model.py:22) so training runs fused attention in
# both directions.
# ---------------------------------------------------------------------------


def _bwd_blocks(sq_pad, skv_pad, d_pad, budget=15.5e6, n_tmp=4):
    """(bq, bk) for the 2D-grid backward: largest 8-aligned divisors of the
    padded lengths whose fp32 [bq, bk] temps + resident blocks fit the
    scoped-VMEM budget."""
    def divisors_desc(s_pad):
        return [blk for blk in range(min(s_pad, 512), 7, -8)
                if s_pad % blk == 0]

    for bq in divisors_desc(sq_pad):
        for bk in divisors_desc(skv_pad):
            blocks = 7 * bq * d_pad * 4 + 4 * bk * d_pad * 2  # acc+io slack
            if blocks + n_tmp * bq * _round_up(bk, 128) * 4 <= budget:
                return bq, bk
    return None


def _dq_kernel_tiled(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, valid_ref,
               dq_ref, acc, *, scale, causal, diag_offset, bq, bk,
               sq_real, skv_real):
    """One (q block, kv block) tile of dQ; fp32 accumulation over kv blocks
    in VMEM scratch. Causal tiles fully above the diagonal are skipped —
    the backward does ~half the rectangle's work, like the streaming
    forward's block-skip."""
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(jk == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
        keep = jnp.logical_and(col < skv_real, row < sq_real)
        if causal:
            keep = jnp.logical_and(keep, col <= row + diag_offset)
        # valid rides as the WHOLE [nk, bk] plane (resident; a (1, 1, bk)
        # block would need a Mosaic-illegal size-1 sublane) and block jk
        # is sliced here
        vrow = valid_ref[0, pl.ds(jk, 1)].reshape(1, bk)
        keep = jnp.logical_and(keep, vrow > 0)
        p = jnp.where(keep, jnp.exp(s - lse_ref[0, 0]), 0.0)    # [bq, bk]

        do = do_ref[0, 0].astype(jnp.float32)
        o = o_ref[0, 0].astype(jnp.float32)
        d_row = jnp.sum(do * o, axis=-1, keepdims=True)          # [bq, 1]
        dp = jax.lax.dot_general(do_ref[0, 0], v_ref[0, 0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_row)
        acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        # tile needed iff some col <= some row + diag: min col of the tile
        # vs max row of the tile
        pl.when(jk * bk <= iq * bq + (bq - 1) + diag_offset)(compute)
    else:
        compute()

    @pl.when(jk == nk - 1)
    def _():
        dq_ref[0, 0] = acc[...].astype(dq_ref.dtype)


def _dkv_kernel_tiled(k_ref, v_ref, q_ref, do_ref, o_ref, lse_ref, valid_ref,
                dk_ref, dv_ref, acc_k, acc_v, *, scale, causal, diag_offset,
                bq, bk, sq_real, skv_real):
    """One (kv block, q block) tile of dK/dV; fp32 accumulation over q
    blocks, causal skip of tiles with no row <= col + diag."""
    jk = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _():
        acc_k[...] = jnp.zeros_like(acc_k)
        acc_v[...] = jnp.zeros_like(acc_v)

    def compute():
        k = k_ref[0, 0]
        q = q_ref[0, 0]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 0) + jk * bk  # kv
        col = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 1) + iq * bq  # q
        keep = jnp.logical_and(row < skv_real, col < sq_real)
        if causal:
            keep = jnp.logical_and(keep, row <= col + diag_offset)
        # valid rides as the WHOLE [nk, bk] plane and block jk is sliced
        # here (a (1, 1, bk) block has a Mosaic-illegal size-1 sublane)
        vblk = valid_ref[0, pl.ds(jk, 1)].reshape(bk, 1)
        keep = jnp.logical_and(keep, vblk > 0)
        pt = jnp.where(keep, jnp.exp(st - lse_ref[0, 0, :, 0][None, :]), 0.0)

        do = do_ref[0, 0]                                        # [bq, D]
        acc_v[...] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        dpt = jax.lax.dot_general(v_ref[0, 0], do, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        d_row = jnp.sum(do.astype(jnp.float32)
                        * o_ref[0, 0].astype(jnp.float32), axis=-1)   # [bq]
        dst = pt * (dpt - d_row[None, :])
        acc_k[...] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        # tile needed iff some kv row <= some col + diag: min row of the
        # tile vs max col of the tile
        pl.when(jk * bk <= iq * bq + (bq - 1) + diag_offset)(compute)
    else:
        compute()

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0, 0] = acc_k[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = acc_v[...].astype(dv_ref.dtype)


def _flash_bwd_tiled(q, k, v, kv_valid, out, do, lse_bhs, scale, causal,
                     interpret):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    d_pad = _round_up(d, 128)
    sq_pad = lse_bhs.shape[2]
    skv_pad = _round_up(skv, 8)

    qt = _pad_bhsd(q, sq_pad, d_pad)
    kt = _pad_bhsd(k, skv_pad, d_pad)
    vt = _pad_bhsd(v, skv_pad, d_pad)
    ot = _pad_bhsd(out, sq_pad, d_pad)
    dot = _pad_bhsd(do.astype(q.dtype), sq_pad, d_pad)
    valid = _valid_padded(kv_valid, b, skv, skv_pad)
    diag = skv - sq

    plan = _bwd_blocks(sq_pad, skv_pad, d_pad)
    if plan is None:
        # unreachable with today's 8-aligned pads (bq=bk=8 always fits),
        # but degrade to the whole-KV backward rather than crash training
        # if a future budget/shape change shrinks the block space (ADVICE
        # r3)
        return _flash_bwd_whole(q, k, v, kv_valid, out, do, lse_bhs,
                                scale, causal, interpret)
    bq, bk = plan
    nq, nk = sq_pad // bq, skv_pad // bk

    qblk = lambda b_, h_, i, j: (b_, h_, i, 0)
    kblk = lambda b_, h_, i, j: (b_, h_, j, 0)
    vrow = lambda b_, h_, i, j: (b_, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel_tiled, scale=scale, causal=causal,
                          diag_offset=diag, bq=bq, bk=bk, sq_real=sq,
                          skv_real=skv),
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d_pad), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d_pad), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, bk), vrow, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d_pad), qblk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d_pad), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, dot, ot, lse_bhs, valid.reshape(b, nk, bk))

    # dk/dv: kv blocks outer, q blocks inner (accumulated)
    kblk2 = lambda b_, h_, j, i: (b_, h_, j, 0)
    qblk2 = lambda b_, h_, j, i: (b_, h_, i, 0)
    vrow2 = lambda b_, h_, j, i: (b_, 0, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_tiled, scale=scale, causal=causal,
                          diag_offset=diag, bq=bq, bk=bk, sq_real=sq,
                          skv_real=skv),
        grid=(b, h, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bk, d_pad), kblk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d_pad), kblk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d_pad), qblk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d_pad), qblk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d_pad), qblk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), qblk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, bk), vrow2, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, bk, d_pad), kblk2,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, bk, d_pad), kblk2,
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), v.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, d_pad), jnp.float32),
                        pltpu.VMEM((bk, d_pad), jnp.float32)],
        interpret=interpret,
    )(kt, vt, qt, dot, ot, lse_bhs, valid.reshape(b, nk, bk))

    unpad = lambda x, s: x.transpose(0, 2, 1, 3)[:, :s, :, :d]
    return unpad(dq, sq), unpad(dk, skv), unpad(dv, skv)


def _bwd_block(budget, whole_bytes, s_other_pad, s_pad, n_tmp):
    """Largest 8-aligned block of s_pad fitting the scoped-VMEM budget."""
    for blk in range(min(s_pad, 512), 7, -8):
        if s_pad % blk:
            continue
        if whole_bytes + n_tmp * blk * _round_up(s_other_pad, 128) * 4 \
                <= budget:
            return blk
    return None


def _dq_kernel_whole(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, valid_ref,
               dq_ref, *, scale, causal, diag_offset, bq, sq_real, skv_real):
    skv = k_ref.shape[2]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    iq = pl.program_id(2)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, skv), 0) + iq * bq
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, skv), 1)
    keep = jnp.logical_and(col < skv_real, row < sq_real)
    if causal:
        keep = jnp.logical_and(keep, col <= row + diag_offset)
    keep = jnp.logical_and(keep, valid_ref[0, 0, :][None, :] > 0)
    p = jnp.where(keep, jnp.exp(s - lse_ref[0, 0]), 0.0)    # [bq, Skv]

    do = do_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    d_row = jnp.sum(do * o, axis=-1, keepdims=True)          # [bq, 1]
    dp = jax.lax.dot_general(do_ref[0, 0], v_ref[0, 0],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - d_row)
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel_whole(k_ref, v_ref, q_ref, do_ref, o_ref, lse_ref, valid_ref,
                dk_ref, dv_ref, *, scale, causal, diag_offset, bk,
                sq_real, skv_real):
    sq = q_ref.shape[2]
    ik = pl.program_id(2)
    k = k_ref[0, 0]
    q = q_ref[0, 0]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (bk, sq), 0) + ik * bk  # kv
    col = jax.lax.broadcasted_iota(jnp.int32, (bk, sq), 1)            # q
    keep = jnp.logical_and(row < skv_real, col < sq_real)
    if causal:
        keep = jnp.logical_and(keep, row <= col + diag_offset)
    # valid rides as the WHOLE [nb, bk] row (resident; lane dim == array
    # dim, Mosaic-legal for any bk) and block ik is sliced here — a
    # per-block (1, 1, bk) lane slice would need bk % 128 == 0
    vblk = valid_ref[0, pl.ds(ik, 1)].reshape(bk, 1)
    keep = jnp.logical_and(keep, vblk > 0)
    pt = jnp.where(keep, jnp.exp(st - lse_ref[0, 0, :, 0][None, :]), 0.0)

    do = do_ref[0, 0]                                        # [Sq, D]
    dv = jax.lax.dot_general(pt.astype(do.dtype), do,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    dpt = jax.lax.dot_general(v_ref[0, 0], do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    d_row = jnp.sum(do.astype(jnp.float32)
                    * o_ref[0, 0].astype(jnp.float32), axis=-1)   # [Sq]
    dst = pt * (dpt - d_row[None, :])
    dk = jax.lax.dot_general(dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)


def _flash_bwd_whole(q, k, v, kv_valid, out, do, lse_bhs, scale, causal,
                     interpret):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    d_pad = _round_up(d, 128)
    sq_pad = lse_bhs.shape[2]
    skv_pad = _round_up(skv, 8)
    itemsize = q.dtype.itemsize

    qt = _pad_bhsd(q, sq_pad, d_pad)
    kt = _pad_bhsd(k, skv_pad, d_pad)
    vt = _pad_bhsd(v, skv_pad, d_pad)
    ot = _pad_bhsd(out, sq_pad, d_pad)
    dot = _pad_bhsd(do.astype(q.dtype), sq_pad, d_pad)
    valid = _valid_padded(kv_valid, b, skv, skv_pad)
    diag = skv - sq

    # dq: K/V whole in VMEM, grid over q blocks
    kv_bytes = 2 * 2 * skv_pad * d_pad * itemsize
    bq = _bwd_block(15.5e6, kv_bytes, skv_pad, sq_pad, n_tmp=4)
    assert bq is not None, "dq backward block does not fit VMEM"
    qblk = lambda b_, h_, i: (b_, h_, i, 0)
    whole = lambda b_, h_, i: (b_, h_, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel_whole, scale=scale, causal=causal,
                          diag_offset=diag, bq=bq, sq_real=sq,
                          skv_real=skv),
        grid=(b, h, sq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_pad, d_pad), whole,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_pad, d_pad), whole,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_pad), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d_pad), qblk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, dot, ot, lse_bhs, valid)

    # dk/dv: Q/dO/O whole in VMEM, grid over kv blocks
    q_bytes = 3 * 2 * sq_pad * d_pad * itemsize + sq_pad * 4
    bk = _bwd_block(15.5e6, q_bytes, sq_pad, skv_pad, n_tmp=4)
    assert bk is not None, "dk/dv backward block does not fit VMEM"
    kblk = lambda b_, h_, j: (b_, h_, j, 0)
    whole_q = lambda b_, h_, j: (b_, h_, 0, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_whole, scale=scale, causal=causal,
                          diag_offset=diag, bk=bk, sq_real=sq,
                          skv_real=skv),
        grid=(b, h, skv_pad // bk),
        in_specs=[
            pl.BlockSpec((1, 1, bk, d_pad), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d_pad), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad, d_pad), whole_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad, d_pad), whole_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad, d_pad), whole_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad, 1), whole_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad // bk, bk),
                         lambda b_, h_, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, bk, d_pad), kblk,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, bk, d_pad), kblk,
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), v.dtype)),
        interpret=interpret,
    )(kt, vt, qt, dot, ot, lse_bhs,
      valid.reshape(b, skv_pad // bk, bk))

    unpad = lambda x, s: x.transpose(0, 2, 1, 3)[:, :s, :, :d]
    return unpad(dq, sq), unpad(dk, skv), unpad(dv, skv)


# Measured crossover on v5e-1 (B*S^2 held constant, H40 D128, causal):
# whole-KV 6.03/11.25/22.15 ms at S 1024/2048/4096 vs tiled-skip
# 6.91/11.49/20.27 — the diagonal block-skip only overtakes the bigger
# whole-KV dots once there are enough tiles to skip (~44% at 8x8).
# The differentiable tier only sees Skv <= _STREAMING_THRESHOLD (longer
# sequences route to the forward-only streaming kernel), so the tiled
# backward is reachable only for Skv in [_BWD_SKIP_MIN,
# _STREAMING_THRESHOLD] — exactly the boundary today. The assert keeps a
# future threshold change from silently dead-coding it (ADVICE r3).
_BWD_SKIP_MIN = 4096
assert _BWD_SKIP_MIN <= _STREAMING_THRESHOLD, (
    "tiled flash backward unreachable: crossover above streaming tier")


def _flash_bwd_impl(q, k, v, kv_valid, out, do, lse_bhs, scale, causal,
                    interpret):
    """Route the backward: causal long sequences take the 2D-tiled kernels
    (diagonal block-skip, fp32 scratch accumulation); everything else the
    whole-KV single-shot kernels."""
    if causal and min(q.shape[1], k.shape[1]) >= _BWD_SKIP_MIN:
        return _flash_bwd_tiled(q, k, v, kv_valid, out, do, lse_bhs, scale,
                                causal, interpret)
    return _flash_bwd_whole(q, k, v, kv_valid, out, do, lse_bhs, scale,
                            causal, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_diff(q, k, v, kv_valid_f, scale, causal, interpret):
    out, _ = _flash_short(q, k, v, kv_valid_f, scale, causal, interpret)
    return out


def _flash_diff_fwd(q, k, v, kv_valid_f, scale, causal, interpret):
    out, res = _flash_short(q, k, v, kv_valid_f, scale, causal, interpret,
                            with_lse=True)
    _, _, _, ot, lse, _ = res
    return out, (q, k, v, kv_valid_f, out, lse)


def _flash_diff_bwd(scale, causal, interpret, res, do):
    q, k, v, kv_valid_f, out, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, kv_valid_f, out, do, lse, scale,
                                 causal, interpret)
    return dq, dk, dv, jnp.zeros_like(kv_valid_f)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)
