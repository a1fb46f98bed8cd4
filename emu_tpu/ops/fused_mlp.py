"""Pallas fused transformer MLP: [LN →] fc1 → activation → fc2 [→ LN]
[→ +residual] in one kernel.

Why: the ViT's exact-GELU (torch nn.GELU, ref Emu1/models/eva_vit_model.py
Mlp) is erf-based and VPU-heavy; run unfused it serializes with the
matmuls and the [M, hidden] intermediate round-trips HBM. Fused, the erf
polynomial executes on the VPU in the shadow of the MXU's fc2 tiles.
Folding the block's LayerNorm (pre-norm Emu1 or post-norm Emu2, ref
eva_vit_model.py:367-426) and the residual add into the same kernel
removes two more whole-tensor HBM passes per block.

Blocking: grid (M/bm, hidden/bf), hidden minor. The x row-block is
resident across the inner loop (index map constant in j), fc2 partial sums
accumulate in an fp32 VMEM scratch, and each program computes
  h = act(xn @ w1[:, j] + b1[j]);  acc += h @ w2[j, :]
so weight traffic (w1+w2 re-streamed per row block) stays under the MXU
time at the Emu shapes.

Supports the two Emu MLP families: exact-GELU (ViT-g, EVA-4B) and SwiGLU
(EVA rope variants: silu(x@w1) * (x@w2) @ w3, ref Emu2/emu/eva_vit.py:
110-140).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf(x, cheap: bool = False):
    # Mosaic has no erf/erfc primitive. Default: Abramowitz & Stegun 7.1.26
    # rational approximation (max abs error ~4e-7 in fp32). cheap=True uses
    # A&S 7.1.25 (3 terms, max abs error 2.5e-5) — still far below bf16
    # resolution (2^-8 relative), so bf16 outputs are identical to
    # jax.nn.gelu(approximate=False) after the cast; measured ~30 us/layer
    # faster at ViT-g shapes (the erf serializes between the two MXU dots).
    a = jnp.abs(x)
    if cheap:
        t = 1.0 / (1.0 + 0.47047 * a)
        poly = t * (0.3480242 + t * (-0.0958798 + t * 0.7478556))
    else:
        t = 1.0 / (1.0 + 0.3275911 * a)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _exact_gelu(x, cheap: bool = False):
    # jax.nn.gelu(approximate=False) semantics: 0.5x(1+erf(x/sqrt(2))).
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5), cheap))


def _layer_norm32(x32, scale_ref, bias_ref, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale_ref[0].astype(jnp.float32)
            + bias_ref[0].astype(jnp.float32))


def _make_kernel(activation: str, ln_mode, residual: bool, eps: float,
                 cheap_erf: bool = False):
    """Kernel ref order: x, (w, b) pairs, [ln_scale, ln_bias], o, acc, [xn].

    ln_mode "pre":  y = fc(act(fc(LN(x)))) — LN cached in the xn scratch at
                    j==0 (the x block is resident across the inner loop).
    ln_mode "post": y = LN(fc(act(fc(x)))).
    residual:       y += x (the pre-LN input), fp32 add before the cast.
    cheap_erf: 3-term erf poly, valid when the output dtype is bf16.
    """
    nw = 3 if activation == "swiglu" else 2

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        wb = refs[idx:idx + 2 * nw]; idx += 2 * nw
        if ln_mode:
            lns_ref, lnb_ref = refs[idx:idx + 2]; idx += 2
        o_ref = refs[idx]; idx += 1
        acc = refs[idx]; idx += 1
        xn = refs[idx] if ln_mode == "pre" else x_ref

        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            if ln_mode == "pre":
                xn[:] = _layer_norm32(x_ref[:].astype(jnp.float32),
                                      lns_ref, lnb_ref, eps).astype(xn.dtype)

        def dot(a, b_ref):
            return jax.lax.dot_general(a, b_ref[:], (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        if activation == "swiglu":
            g = jax.nn.silu(dot(xn[:], wb[0]) + wb[1][0].astype(jnp.float32))
            u = dot(xn[:], wb[2]) + wb[3][0].astype(jnp.float32)
            h = (g * u).astype(x_ref.dtype)
            acc[:] += dot(h, wb[4])
            b_out = wb[5]
        else:
            h = dot(xn[:], wb[0]) + wb[1][0].astype(jnp.float32)
            h = _exact_gelu(h, cheap_erf)
            acc[:] += dot(h.astype(x_ref.dtype), wb[2])
            b_out = wb[3]

        @pl.when(j == nj - 1)
        def _():
            y = acc[:] + b_out[0].astype(jnp.float32)
            if ln_mode == "post":
                y = _layer_norm32(y, lns_ref, lnb_ref, eps)
            if residual:
                y = y + x_ref[:].astype(jnp.float32)
            o_ref[:] = y.astype(o_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# W8A8 variant: int8 weights, in-kernel dynamic per-row activation quant,
# s8 x s8 -> s32 dots on the MXU's int8 path (measured 256 TOP/s vs 150
# TFLOP/s bf16 on v5e-1). GELU MLP only (the Emu ViT family); the hidden
# activation re-quantizes per (row, hidden-block) before fc2.
# ---------------------------------------------------------------------------


def _quant_rows(x32):
    """[M, K] fp32 → (int8, per-row fp32 scale [M, 1])."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0,
                    1e-8)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _make_w8a8_kernel(ln_mode, residual: bool, eps: float):
    def kernel(*refs):
        (x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref) = refs[:7]
        idx = 7
        if ln_mode:
            lns_ref, lnb_ref = refs[idx:idx + 2]; idx += 2
        o_ref = refs[idx]; idx += 1
        acc, xq, sx = refs[idx:idx + 3]

        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            xin = x_ref[:].astype(jnp.float32)
            if ln_mode == "pre":
                xin = _layer_norm32(xin, lns_ref, lnb_ref, eps)
            q, s = _quant_rows(xin)
            xq[:] = q
            sx[:] = jnp.broadcast_to(s, sx.shape)

        h = jax.lax.dot_general(xq[:], w1_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        h = (h.astype(jnp.float32) * sx[:, :1]
             * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32))
        h = _exact_gelu(h)
        hq, sh = _quant_rows(h)
        pv = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        acc[:] += pv.astype(jnp.float32) * sh

        @pl.when(j == nj - 1)
        def _():
            y = acc[:] * s2_ref[0].astype(jnp.float32) + \
                b2_ref[0].astype(jnp.float32)
            if ln_mode == "post":
                y = _layer_norm32(y, lns_ref, lnb_ref, eps)
            if residual:
                y = y + x_ref[:].astype(jnp.float32)
            o_ref[:] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ln_mode", "residual", "eps", "bm", "bf",
                                    "interpret"))
def fused_mlp_w8a8(x: jax.Array, w1_q8: jax.Array, scale1, b1,
                   w2_q8: jax.Array, scale2, b2, ln_scale=None, ln_bias=None,
                   *, ln_mode=None, residual: bool = False, eps: float = 1e-6,
                   bm: int = 512, bf: int = 1024,
                   interpret: bool = False) -> jax.Array:
    """W8A8 fused GELU MLP: [LN →] quant → fc1(s8) → gelu → requant →
    fc2(s8) [→ LN] [→ +residual]. Weights {int8 [K,F]/[F,N], f32 per-out-
    channel scales}; activations quantize per row inside the kernel."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    f = w1_q8.shape[1]
    n = w2_q8.shape[1]
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    m_pad = _round_up(m, bm)
    f_pad = _round_up(f, bf)
    xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))

    def padf(w, axis):
        pads = [(0, 0), (0, 0)]
        pads[axis] = (0, f_pad - f)
        return jnp.pad(w, pads)

    def row(v, dim, dtype=jnp.float32):
        if v is None:
            v = jnp.zeros((dim,), dtype)
        return v.reshape(1, -1).astype(dtype)

    args = [xf, padf(w1_q8, 1), padf(row(scale1, f), 1), padf(row(b1, f), 1),
            padf(w2_q8, 0), row(scale2, n), row(b2, n)]
    in_specs = [pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                pl.BlockSpec((k, bf), lambda i, j: (0, j)),
                pl.BlockSpec((1, bf), lambda i, j: (0, j)),
                pl.BlockSpec((1, bf), lambda i, j: (0, j)),
                pl.BlockSpec((bf, n), lambda i, j: (j, 0)),
                pl.BlockSpec((1, n), lambda i, j: (0, 0)),
                pl.BlockSpec((1, n), lambda i, j: (0, 0))]
    if ln_mode:
        ln_dim = k if ln_mode == "pre" else n
        args += [ln_scale.reshape(1, -1), ln_bias.reshape(1, -1)]
        in_specs += [pl.BlockSpec((1, ln_dim), lambda i, j: (0, 0))] * 2
    if residual:
        assert n == k

    out = pl.pallas_call(
        _make_w8a8_kernel(ln_mode, residual, eps),
        grid=(m_pad // bm, f_pad // bf),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.float32),
                        pltpu.VMEM((bm, k), jnp.int8),
                        pltpu.VMEM((bm, 128), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)


# ---------------------------------------------------------------------------
# Fused single dense: [LN →] x@W+b [→ LN] [→ +residual] in one kernel.
#
# Covers the ViT attention branch's two norm placements (the MLP branch
# already fuses via fused_mlp): pre-norm LN1+QKV projection (Emu1 ViT-g)
# and post-norm proj+LN1+residual (Emu2 EVA-4B). Removes the standalone
# fp32 LayerNorm HBM pass per block (ref semantics: transformer.py:25-31).
# ---------------------------------------------------------------------------


def _make_dense_kernel(ln_mode, residual: bool, eps: float):
    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        b_ref = refs[idx]; idx += 1
        if ln_mode:
            lns_ref, lnb_ref = refs[idx:idx + 2]; idx += 2
        res_ref = None
        if residual:
            res_ref = refs[idx]; idx += 1
        o_ref = refs[idx]; idx += 1
        xn = refs[idx] if ln_mode == "pre" else x_ref

        if ln_mode == "pre":
            @pl.when(pl.program_id(1) == 0)
            def _():
                xn[:] = _layer_norm32(x_ref[:].astype(jnp.float32),
                                      lns_ref, lnb_ref, eps).astype(xn.dtype)

        y = jax.lax.dot_general(xn[:], w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y + b_ref[0].astype(jnp.float32)
        if ln_mode == "post":
            y = _layer_norm32(y, lns_ref, lnb_ref, eps)
        if residual:
            y = y + res_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ln_mode", "eps", "bm", "bn", "interpret"))
def fused_dense(x: jax.Array, w: jax.Array, b=None, ln_scale=None,
                ln_bias=None, residual=None, *, ln_mode=None,
                eps: float = 1e-6, bm: int = 512, bn: int = 512,
                interpret: bool = False) -> jax.Array:
    """x [..., K] → [..., N]: [LN →] x@W+b [→ LN] [→ +residual].

    ln_mode "pre" normalizes the input (fp32, cached per row block);
    "post" normalizes the matmul output — this needs the full output row,
    so the N dim runs as a single block (bn is ignored). `residual` is an
    explicit [..., N] tensor added after everything, in fp32."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.shape[1]
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    m_pad = _round_up(m, bm)
    xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))
    if ln_mode == "post":
        bn = n
    bn = min(bn, n)
    assert n % bn == 0, "N must tile by bn"
    grid = (m_pad // bm, n // bn)

    args = [xf, w, _bias2d(b, n, x.dtype)]
    in_specs = [pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                pl.BlockSpec((k, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j))]
    if ln_mode:
        ln_dim = k if ln_mode == "pre" else n
        args += [ln_scale.reshape(1, -1), ln_bias.reshape(1, -1)]
        in_specs += [pl.BlockSpec((1, ln_dim), lambda i, j: (0, 0))] * 2
    if residual is not None:
        rf = jnp.pad(residual.reshape(-1, n), ((0, m_pad - m), (0, 0)))
        args.append(rf)
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j)))

    scratch = []
    if ln_mode == "pre":
        scratch.append(pltpu.VMEM((bm, k), x.dtype))

    out = pl.pallas_call(
        _make_dense_kernel(ln_mode, residual is not None, eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)


def _bias2d(b, f, dtype):
    if b is None:
        b = jnp.zeros((f,), dtype)
    return b.reshape(1, -1)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bf", "interpret", "activation",
                                    "ln_mode", "residual", "eps"))
def fused_mlp(x: jax.Array, w1: jax.Array, b1, w2: jax.Array, b2,
              w3=None, b3=None, ln_scale=None, ln_bias=None, *,
              activation: str = "gelu", ln_mode=None, residual: bool = False,
              eps: float = 1e-6, bm: int = 512, bf: int = 512,
              interpret: bool = False) -> jax.Array:
    """x [..., K] → [..., N] through [LN →] fc1/act/fc2 [→ LN] [→ +x].

    gelu:   act(x@w1+b1) @ w2 + b2, exact (erf) GELU.
    swiglu: (silu(x@w1+b1) * (x@w2+b2)) @ w3 + b3.
    ln_mode "pre"/"post" folds the block LayerNorm in (fp32, matching
    ops.layers.layer_norm); residual=True adds the kernel input back
    (requires N == K). Biases may be None. Hidden dim is zero-padded to
    bf: padded h columns are act(0)=0 (gelu) or silu(0)*0=0 (swiglu) and
    hit zero w2/w3 rows.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    f = w1.shape[1]
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    m_pad = _round_up(m, bm)
    f_pad = _round_up(f, bf)
    xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))

    def padf(w, axis):
        pads = [(0, 0), (0, 0)]
        pads[axis] = (0, f_pad - f)
        return jnp.pad(w, pads)

    grid = (m_pad // bm, f_pad // bf)
    row_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0))
    col_w = pl.BlockSpec((k, bf), lambda i, j: (0, j))
    col_b = pl.BlockSpec((1, bf), lambda i, j: (0, j))
    if activation == "swiglu":
        n = w3.shape[1]
        args = [xf, padf(w1, 1), padf(_bias2d(b1, f, x.dtype), 1),
                padf(w2, 1), padf(_bias2d(b2, f, x.dtype), 1),
                padf(w3, 0), _bias2d(b3, n, x.dtype)]
        in_specs = [row_spec, col_w, col_b, col_w, col_b,
                    pl.BlockSpec((bf, n), lambda i, j: (j, 0)),
                    pl.BlockSpec((1, n), lambda i, j: (0, 0))]
    else:
        n = w2.shape[1]
        args = [xf, padf(w1, 1), padf(_bias2d(b1, f, x.dtype), 1),
                padf(w2, 0), _bias2d(b2, n, x.dtype)]
        in_specs = [row_spec, col_w, col_b,
                    pl.BlockSpec((bf, n), lambda i, j: (j, 0)),
                    pl.BlockSpec((1, n), lambda i, j: (0, 0))]
    if ln_mode:
        ln_dim = k if ln_mode == "pre" else n
        args += [ln_scale.reshape(1, -1), ln_bias.reshape(1, -1)]
        in_specs += [pl.BlockSpec((1, ln_dim), lambda i, j: (0, 0))] * 2
    if residual:
        assert n == k, "residual fusion requires square block (N == K)"

    scratch = [pltpu.VMEM((bm, n), jnp.float32)]
    if ln_mode == "pre":
        scratch.append(pltpu.VMEM((bm, k), x.dtype))

    out = pl.pallas_call(
        _make_kernel(activation, ln_mode, residual, eps,
                     cheap_erf=(x.dtype == jnp.bfloat16)),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)
