"""Pallas W4A8 matmul: nibble-packed int4 weights consumed directly.

Why: decode is HBM-bound — step time ~= bytes(weights) / bandwidth. The
XLA int4 path (`quant.dequantize_int4` + matmul) materializes a full
bf16 kernel, so HBM traffic is 4x the packed bytes and int4 decodes no
faster than bf16. This kernel reads ONLY the packed nibbles: activations
are pre-quantized to int8 per token, each scale group contributes an
s8 x s8 -> s32 MXU dot (the nibbles live in -7..7 so int8 operands are
exact), and the per-(group, out-channel) scale applies to the fp32
accumulator. Per-token activation scales and bias apply outside (XLA
fuses them into the epilogue).

Staying bandwidth-bound requires the unpack to cost almost nothing on
the VPU, and Mosaic legalizes no int8 shifts and no cheap int8<->int32
round trips (an earlier interleaved-packing version spent ~60% of its
time widening to int32 to shift). The fold packing from
`quant.quantize_kernel_int4` (packed row i = orig row i low nibble,
orig row i + K/2 high nibble) makes everything int8-native:

- low nibble stores value+8, so (p & 15) is a linear operand whose -8
  bias folds into the dot as an int32 row-sum correction — one AND
- high:  (p & 0xF0) == 16*high exactly in two's complement, so the
  high dot runs against the masked byte and 1/16 folds into its scale
- the x halves pairing with each plane are contiguous column blocks,
  so all slices are lane-aligned (no Mosaic relayouts)

Blocking: grid (M/bm, N/bn, (G/2)/gpb) with the group axis innermost;
gpb plane-groups unpack+dot per step so each weight DMA is ~1 MB (many
tiny tiles leave the kernel grid-overhead-bound).

This is the TPU replacement for the 4-bit bitsandbytes decode path of
the reference demo (ref Emu2/demo/backend/hf_model/emu/chat.py:59-67).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(gpb: int, gs: int, obm: int):
    def kernel(xl_ref, xh_ref, p_ref, sl_ref, sh_ref, o_ref, acc):
        g = pl.program_id(2)
        ng = pl.num_programs(2)

        @pl.when(g == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        total = jnp.zeros_like(acc)
        for t in range(gpb):
            p = p_ref[t * gs:(t + 1) * gs, :]
            # Mosaic legalizes only BITWISE int8 vector ops (no sub/
            # shift), so nibble recovery is one AND each: the low nibble
            # is stored biased (value+8, see quantize_kernel_int4) and
            # the -8 folds into the dot as an int32 row-sum correction;
            # (p & 0xF0) == 16*high exactly in two's complement with the
            # 1/16 folded into the high-plane scale.
            lu8 = p & 15
            h16 = p & -16
            xl = xl_ref[:, t * gs:(t + 1) * gs]
            xh = xh_ref[:, t * gs:(t + 1) * gs]
            dl = jax.lax.dot_general(xl, lu8, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)[:obm]
            dl -= 8 * jnp.sum(xl[:obm].astype(jnp.int32), axis=1,
                              keepdims=True)
            dh = jax.lax.dot_general(xh, h16, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)[:obm]
            # the rescale runs on [obm, bn] — real rows only, not the
            # int8-tiling-padded 32 — it is the kernel's main VPU cost
            total += (dl.astype(jnp.float32) * sl_ref[t, 0]
                      + dh.astype(jnp.float32) * sh_ref[t, 0])
        acc[:] += total

        @pl.when(g == ng - 1)
        def _():
            o_ref[:] = acc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("bm", "bn", "gpb", "interpret"))
def matmul_q4(x: jax.Array, packed: jax.Array, scale4: jax.Array,
              bias=None, *, bm: int = 32, bn: int = 2304, gpb: int = 8,
              interpret: bool = False) -> jax.Array:
    """y = x @ dequant(packed, scale4) (+ bias), reading only packed bytes.

    x [..., K] float; packed [K//2, N] int8 (fold packing); scale4 [G, N]
    f32 with group_size = K/G a multiple of 128 (so each group's x
    columns form whole lane tiles). Returns x.dtype.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = packed.shape[-1]
    groups = scale4.shape[-2]
    gs = k // groups
    assert gs * groups == k and gs % 128 == 0 and groups % 2 == 0, (k, groups)
    gh = groups // 2                       # plane-groups per nibble plane
    while gh % gpb:
        gpb -= 1
    # bn must tile n EXACTLY whenever possible: a pad here runs per call,
    # and on scan-sliced layer weights that is a whole-weight HBM copy
    # every decode step (measured ~2.5 ms/step on the 13B shapes).
    if n % 128 == 0:
        cap = max(bn // 128, 1)
        b = max(d for d in range(1, cap + 1) if (n // 128) % d == 0)
        bn = 128 * b
    else:
        bn = min(bn, _round_up(n, 128))

    from emu_tpu.ops.quant import quantize_activations
    xq, sx = quantize_activations(x.reshape(-1, k))
    m = xq.shape[0]
    # x rows pad to the int8 sublane tile (32); the accumulator/rescale
    # only keeps the fp32 tile rows actually needed
    obm = bm if m > 8 else 8
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
    xlo = xq[:, :k // 2]
    xhi = xq[:, k // 2:]
    packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    # group axis leads (untiled) so the (gpb, 1, bn) scale tiles satisfy
    # the last-two-dims tiling rule; high-plane scales absorb the *16 of
    # the masked-byte dot
    s = jnp.pad(scale4.astype(jnp.float32), ((0, 0), (0, n_pad - n)))
    s_lo = s[:gh, None, :]
    s_hi = (s[gh:] * (1.0 / 16.0))[:, None, :]

    out = pl.pallas_call(
        _make_kernel(gpb, gs, obm),
        grid=(m_pad // bm, n_pad // bn, gh // gpb),
        in_specs=[pl.BlockSpec((bm, gs * gpb), lambda i, j, g: (i, g)),
                  pl.BlockSpec((bm, gs * gpb), lambda i, j, g: (i, g)),
                  pl.BlockSpec((gs * gpb, bn), lambda i, j, g: (g, j)),
                  pl.BlockSpec((gpb, 1, bn), lambda i, j, g: (g, 0, j)),
                  pl.BlockSpec((gpb, 1, bn), lambda i, j, g: (g, 0, j))],
        out_specs=pl.BlockSpec((obm, bn), lambda i, j, g: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad // bm * obm, n_pad),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((obm, bn), jnp.float32)],
        interpret=interpret,
    )(xlo, xhi, packed, s_lo, s_hi)

    y = out[:m, :n] * sx
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype).reshape(*lead, n)


def q4_plan(params: dict, x: jax.Array):
    """Whether the pallas W4A8 path applies: TPU backend, 2-D packed
    kernel, tile-aligned group size, and a small-M (decode-shaped) call —
    large-M prefill reads weights once anyway, so the bf16 dequant matmul
    (full-MXU) wins there."""
    from emu_tpu.ops.flags import flag
    if flag("EMU_TPU_Q4_KERNEL") == "0":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    packed = params["kernel_q4"]
    if packed.ndim != 2:
        return False
    k = x.shape[-1]
    groups = params["scale4"].shape[-2]
    if groups == 0 or groups % 2 or k % groups or (k // groups) % 128:
        return False
    m = 1
    for s in x.shape[:-1]:
        m *= s
    return m <= 1024


# ---------------------------------------------------------------------------
# Fused W4A8 SwiGLU MLP: one pallas call per decode MLP.
#
# Why: on the serving target each op launch costs tens of microseconds of
# decode-step time, so the per-layer chain [rmsnorm → gate_up matmul →
# split/silu/mul → down matmul → +residual] should be ONE kernel, and the
# nibble-packed weights should stream exactly once. Layout exploits fold
# packing twice: the gate_up contraction (over D) unpacks like matmul_q4,
# and each down-projection packed row pairs hidden unit i with i + F/2 —
# so the grid walks PAIRED hidden blocks (j, j + F/2), both halves of the
# silu(g)*u activation are produced in the same step, and the down dot
# consumes them against the low/high nibble planes of one weight tile.
#
# Grid (nf,): j = hidden block pair; the D-group loop is unrolled inside
# the kernel so every ref slice offset is static (Mosaic-friendly).
# ---------------------------------------------------------------------------


def _make_swiglu_kernel(nf: int, gd: int, gs_d: int, gs_f: int, bf: int,
                        obm: int, eps: float, residual: bool):
    ngj = bf // gs_f                       # down scale groups per block

    def kernel(x_ref, rms_ref, g1_ref, g2_ref, u1_ref, u2_ref,
               sgu_lo_ref, sgu_hi_ref, dn_ref, sdl_ref, sdh_ref, o_ref,
               acc, xq, sx):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            xf = x_ref[:].astype(jnp.float32)
            var = jnp.mean(jnp.square(xf[:obm]), axis=-1, keepdims=True)
            rs = jax.lax.rsqrt(var + eps)
            if obm < xq.shape[0]:
                # pad rows normalize by 1 (their quantized rows are junk
                # but masked out of the [:obm] outputs); zero-row pads
                # are invalid Mosaic broadcasts, so skip when obm == bm
                pad = jnp.ones((xq.shape[0] - obm, 1), jnp.float32)
                rs = jnp.concatenate([rs, pad], axis=0)
            xn = ((xf * rs).astype(x_ref.dtype).astype(jnp.float32)
                  * rms_ref[0].astype(jnp.float32))
            s = jnp.maximum(jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
                            / 127.0, 1e-8)
            xq[:] = jnp.clip(jnp.round(xn / s), -127, 127).astype(jnp.int8)
            sx[:] = jnp.broadcast_to(s, sx.shape)

        half = xq.shape[1] // 2
        parts = []
        for w_ref, col in ((g1_ref, 0), (g2_ref, 1), (u1_ref, 2),
                           (u2_ref, 3)):
            tot = jnp.zeros((obm, bf), jnp.float32)
            for g in range(gd):
                p = w_ref[g * gs_d:(g + 1) * gs_d, :]
                lu8 = p & 15
                h16 = p & -16
                xl = xq[:, g * gs_d:(g + 1) * gs_d]
                xh = xq[:, half + g * gs_d:half + (g + 1) * gs_d]
                dl = jax.lax.dot_general(xl, lu8, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.int32
                                         )[:obm]
                dl -= 8 * jnp.sum(xl[:obm].astype(jnp.int32), axis=1,
                                  keepdims=True)
                dh = jax.lax.dot_general(xh, h16, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.int32
                                         )[:obm]
                tot += (dl.astype(jnp.float32) * sgu_lo_ref[0, g, col]
                        + dh.astype(jnp.float32) * sgu_hi_ref[0, g, col])
            parts.append(tot * sx[:obm, :1])

        g1v, g2v, u1v, u2v = parts
        h1 = (g1v / (1.0 + jnp.exp(-g1v))) * u1v         # silu(g) * u
        h2 = (g2v / (1.0 + jnp.exp(-g2v))) * u2v

        def requant(h):
            s = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True)
                            / 127.0, 1e-8)
            q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
            if obm < xq.shape[0]:
                pad = jnp.zeros((xq.shape[0] - obm, q.shape[1]), jnp.int8)
                q = jnp.concatenate([q, pad], axis=0)
            return q, s

        hq1, s1 = requant(h1)
        hq2, s2 = requant(h2)
        total = jnp.zeros_like(acc)
        for t in range(ngj):
            pd = dn_ref[t * gs_f:(t + 1) * gs_f, :]
            lu8 = pd & 15
            h16 = pd & -16
            hl = hq1[:, t * gs_f:(t + 1) * gs_f]
            hh = hq2[:, t * gs_f:(t + 1) * gs_f]
            dl = jax.lax.dot_general(hl, lu8, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)[:obm]
            dl -= 8 * jnp.sum(hl[:obm].astype(jnp.int32), axis=1,
                              keepdims=True)
            dh = jax.lax.dot_general(hh, h16, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)[:obm]
            total += (dl.astype(jnp.float32) * (s1 * sdl_ref[t, 0])
                      + dh.astype(jnp.float32) * (s2 * sdh_ref[t, 0]))
        acc[:] += total

        @pl.when(j == nf - 1)
        def _():
            y = acc[:]
            if residual:
                y = y + x_ref[:obm].astype(jnp.float32)
            o_ref[:] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("eps", "residual", "bf", "interpret"))
def fused_swiglu_q4(x: jax.Array, rms_scale: jax.Array,
                    gu_packed: jax.Array, gu_scale: jax.Array,
                    dn_packed: jax.Array, dn_scale: jax.Array, *,
                    eps: float = 1e-6, residual: bool = True,
                    bf: int = 384, interpret: bool = False) -> jax.Array:
    """x + down(silu(gate(rms(x))) * up(rms(x))) in one kernel, int4
    weights streamed packed (W4A8, dynamic per-row activation quant).

    x [..., D]; gu_packed [D//2, 2F] (fused gate|up, fold packing);
    gu_scale [G_D, 2F]; dn_packed [F//2, D]; dn_scale [G_F, D].
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    f = gu_packed.shape[-1] // 2
    gdt = gu_scale.shape[-2]               # D-groups (both planes)
    gd = gdt // 2
    gs_d = d // gdt
    gft = dn_scale.shape[-2]
    gs_f = f // gft
    assert gs_d % 128 == 0 and gs_f % 128 == 0, (gs_d, gs_f)
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    bm = 32
    assert m <= bm, "decode-shaped kernel: batch rows must fit one block"
    obm = 8 if m <= 8 else bm
    xf = jnp.pad(xf, ((0, bm - m), (0, 0)))

    # bf must divide f//2 and be a multiple of gs_f; snap the requested bf
    # down to the group-size grid first, then shrink until it divides —
    # naive `bf -= gs_f` from a misaligned start never terminates.
    bf = gs_f * max(1, bf // gs_f)
    while (f // 2) % bf:
        bf -= gs_f
        assert bf >= gs_f, (
            f"no F-block: f//2={f // 2} not tileable by multiples of "
            f"gs_f={gs_f}")
    nf = (f // 2) // bf
    ngj = bf // gs_f

    # gate/up scale tiles: [gd, 4, bf] — per D-plane-group row, the four
    # column blocks (gate j | gate j+nf | up j | up j+nf) stacked on a
    # leading-adjacent axis so one (gd, 4, bf) block serves the kernel
    gsc = gu_scale.astype(jnp.float32)
    f2 = 2 * f

    def col_stack(s2d):                    # [gd?, 2F] -> [rows, nf, 4, bf]
        r = s2d.reshape(s2d.shape[0], 4, nf, bf)
        return r.transpose(2, 0, 1, 3)     # [nf, rows, 4, bf]

    sgu_lo = col_stack(gsc[:gd])           # [nf, gd, 4, bf]
    sgu_hi = col_stack(gsc[gdt - gd:] * (1.0 / 16.0))
    sdl = dn_scale.astype(jnp.float32)[:gft // 2, None, :]
    sdh = (dn_scale.astype(jnp.float32)[gft // 2:] * (1.0 / 16.0))[:, None, :]

    specs = [pl.BlockSpec((bm, d), lambda j: (0, 0)),
             pl.BlockSpec((1, d), lambda j: (0, 0))]
    args = [xf, rms_scale.reshape(1, d)]
    hd2 = d // 2
    for cm in [lambda j: (0, j), lambda j: (0, j + nf),
               lambda j: (0, j + 2 * nf), lambda j: (0, j + 3 * nf)]:
        specs.append(pl.BlockSpec((hd2, bf), cm))
        args.append(gu_packed)
    specs.append(pl.BlockSpec((1, gd, 4, bf), lambda j: (j, 0, 0, 0)))
    args.append(sgu_lo)
    specs.append(pl.BlockSpec((1, gd, 4, bf), lambda j: (j, 0, 0, 0)))
    args.append(sgu_hi)
    specs.append(pl.BlockSpec((bf, d), lambda j: (j, 0)))
    args.append(dn_packed)
    specs.append(pl.BlockSpec((ngj, 1, d), lambda j: (j, 0, 0)))
    args.append(sdl)
    specs.append(pl.BlockSpec((ngj, 1, d), lambda j: (j, 0, 0)))
    args.append(sdh)

    out = pl.pallas_call(
        _make_swiglu_kernel(nf, gd, gs_d, gs_f, bf, obm, eps, residual),
        grid=(nf,),
        in_specs=specs,
        out_specs=pl.BlockSpec((obm, d), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((obm, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((obm, d), jnp.float32),
                        pltpu.VMEM((bm, d), jnp.int8),
                        pltpu.VMEM((bm, 128), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, d)


def swiglu_q4_plan(norm_scale, mlp_params: dict, x: jax.Array):
    """Whether the fused W4A8 swiglu kernel applies: TPU, fused gate_up
    int4 layout, decode-shaped batch, tile-aligned groups."""
    from emu_tpu.ops.flags import flag
    if flag("EMU_TPU_Q4_KERNEL") == "0":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if "gate_up" not in mlp_params or "down" not in mlp_params:
        return False
    gu, dn = mlp_params["gate_up"], mlp_params["down"]
    if "kernel_q4" not in gu or "kernel_q4" not in dn:
        return False
    if gu["kernel_q4"].ndim != 2 or norm_scale is None:
        return False
    d = x.shape[-1]
    f = gu["kernel_q4"].shape[-1] // 2
    gdt, gft = gu["scale4"].shape[-2], dn["scale4"].shape[-2]
    if gdt % 2 or gft % 2 or d % gdt or f % gft:
        return False
    if (d // gdt) % 128 or (f // gft) % 128 or (f // 2) % 128:
        return False
    m = 1
    for s in x.shape[:-1]:
        m *= s
    return m <= 32
