"""Pallas fused transformer MLP: fc1 → activation → fc2 in one kernel.

Why: the ViT's exact-GELU (torch nn.GELU, ref Emu1/models/eva_vit_model.py
Mlp) is erf-based and VPU-compute-bound — measured 1.22 ms/layer on v5e-1
at the ViT-g shape [32·257, 6144], MORE than fc1's entire MXU time. Run
unfused it serializes with the matmuls. Fused, the erf polynomial executes
on the VPU in the shadow of the MXU's fc2 tiles, and the [M, hidden]
intermediate never touches HBM.

Blocking: grid (M/bm, hidden/bf), hidden minor. The x row-block is
resident across the inner loop (index map constant in j), fc2 partial sums
accumulate in an fp32 VMEM scratch, and each program computes
  h = act(x_blk @ w1[:, j] + b1[j]);  acc += h @ w2[j, :]
so weight traffic (w1+w2 re-streamed per row block) stays under the MXU
time at the Emu shapes (~0.7 ms DMA vs ~1.8 ms MXU per ViT-g layer).

Supports the two Emu MLP families: exact-GELU (ViT-g) and SwiGLU
(EVA-4B: silu(x@w1) * (x@w2) @ w3, ref Emu2/emu/eva_vit.py:110-140).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf(x):
    # Mosaic has no erf/erfc primitive; Abramowitz & Stegun 7.1.26 rational
    # approximation (max abs error 1.5e-7 — far below bf16 resolution, so
    # outputs match jax.nn.gelu(approximate=False) bit-for-bit after the
    # bf16 cast in practice). Built from exp + mul/div, all VPU-native.
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _exact_gelu(x):
    # jax.nn.gelu(approximate=False) semantics: 0.5x(1+erf(x/sqrt(2))).
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _gelu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = jax.lax.dot_general(x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _exact_gelu(h)
    acc[:] += jax.lax.dot_general(h.astype(x_ref.dtype), w2_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = (acc[:] + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _swiglu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   o_ref, acc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    g = jax.lax.dot_general(x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.nn.silu(g + b1_ref[0].astype(jnp.float32))
    u = jax.lax.dot_general(x_ref[:], w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b2_ref[0].astype(jnp.float32)
    h = (g * u).astype(x_ref.dtype)
    acc[:] += jax.lax.dot_general(h, w3_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = (acc[:] + b3_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _bias2d(b, f, dtype):
    if b is None:
        b = jnp.zeros((f,), dtype)
    return b.reshape(1, -1)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bf", "interpret", "activation"))
def fused_mlp(x: jax.Array, w1: jax.Array, b1, w2: jax.Array, b2,
              w3=None, b3=None, *, activation: str = "gelu",
              bm: int = 512, bf: int = 512,
              interpret: bool = False) -> jax.Array:
    """x [..., K] → [..., N] through fc1/act/fc2 (or SwiGLU w1/w2/w3).

    gelu:   act(x@w1+b1) @ w2 + b2, exact (erf) GELU.
    swiglu: (silu(x@w1+b1) * (x@w2+b2)) @ w3 + b3.
    Biases may be None. Hidden dim is zero-padded to bf: padded h columns
    are act(0)=0 (gelu) or silu(0)*0=0 (swiglu) and hit zero w2/w3 rows.
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
    if activation == "swiglu":
        n = w3.shape[1]
        args = (xf, padf(w1, 1), padf(_bias2d(b1, f, x.dtype), 1),
                padf(w2, 1), padf(_bias2d(b2, f, x.dtype), 1),
                padf(w3, 0), _bias2d(b3, n, x.dtype))
        kernel = _swiglu_kernel
        in_specs = [
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bf), lambda i, j: (0, j)),
            pl.BlockSpec((1, bf), lambda i, j: (0, j)),
            pl.BlockSpec((k, bf), lambda i, j: (0, j)),
            pl.BlockSpec((1, bf), lambda i, j: (0, j)),
            pl.BlockSpec((bf, n), lambda i, j: (j, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
        ]
    else:
        n = w2.shape[1]
        args = (xf, padf(w1, 1), padf(_bias2d(b1, f, x.dtype), 1),
                padf(w2, 0), _bias2d(b2, n, x.dtype))
        kernel = _gelu_kernel
        in_specs = [
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bf), lambda i, j: (0, j)),
            pl.BlockSpec((1, bf), lambda i, j: (0, j)),
            pl.BlockSpec((bf, n), lambda i, j: (j, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)
