"""int8 quantization: weight-only (decode) and W8A8 dynamic (encode).

The TPU replacement for the reference demo's 4-bit bitsandbytes serving
mode (ref Emu2/demo/backend/hf_model/emu/chat.py:59-67): per-output-channel
symmetric int8 kernels with bf16 scales. Essential for Emu2-33B on v5e
(16 GB/chip): bf16 66 GB → int8 33 GB (TP-sharded 8-way ≈ 4.2 GB/chip)
→ int4 16.5 GB — with the int8 KV cache that is a two-chip 33B serving
footprint, and the full 37B stack fits a v5e-4 with room for batch.

Two consumption modes, distinguished by the param key:
- {"kernel_q8", "scale"} — weight-only: `layers.dense` dequantizes into
  the matmul operand load (bf16 MXU). Right for HBM-bound decode.
- {"kernel_w8a8", "scale"} — W8A8 dynamic: activations quantize per token
  at matmul time and the dot runs s8 x s8 -> s32 on the MXU's int8 path
  (measured 256 TOP/s vs 150 TFLOP/s bf16 on v5e-1, 1.7x). Right for
  MXU-bound encode (ViT). Per-token x per-out-channel scales is the
  standard W8A8 recipe.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_PATTERNS = (
    r"self_attn/(q|k|v|o|qkv)_proj/kernel$",
    r"mlp/(gate|up|down|gate_up)/kernel$",
    r"lm_head/kernel$",
)


def quantize_kernel(kernel: jax.Array) -> dict:
    """[..., in, out] float kernel → int8 + per-out-channel scale [..., out]
    (stacked [L, in, out] layers get per-layer-per-channel scales)."""
    kf = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(kf), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(kf / scale[..., None, :]), -127, 127)
    return {"kernel_q8": q.astype(jnp.int8), "scale": scale}


def quantize_activations(x: jax.Array):
    """Per-token symmetric int8: [..., K] → (int8 values, f32 scale [..., 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-8)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def dense_w8a8(params: dict, x: jax.Array) -> jax.Array:
    """W8A8 dense: dynamic per-token activation quant, s8xs8->s32 MXU dot,
    rank-1 rescale (per-token x per-out-channel), fp32 bias."""
    xq, sx = quantize_activations(x)
    y = jax.lax.dot_general(xq, params["kernel_w8a8"],
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * params["scale"].astype(jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def einsum_w8a8(spec: str, x: jax.Array, kernel_w8a8: jax.Array,
                scale: jax.Array, token_axes=(-1,)) -> jax.Array:
    """W8A8 einsum for head-major projections (e.g. "bsm,mhd->bhsd").

    `token_axes`: x axes reduced by the contraction (the per-token scale
    is max-abs over them). The weight `scale` must broadcast against the
    einsum output."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=token_axes, keepdims=True)
                    / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    y = jnp.einsum(spec, xq, kernel_w8a8, preferred_element_type=jnp.int32)
    lhs, out = spec.split(",")[0], spec.split("->")[1]
    kept = [a for a in lhs if a in out]
    sq = jnp.squeeze(s, axis=token_axes)              # [token dims...]
    expand = [i for i, a in enumerate(out) if a not in kept]
    for i in expand:
        sq = jnp.expand_dims(sq, i)
    return (y.astype(jnp.float32) * sq
            * scale.astype(jnp.float32)).astype(x.dtype)


def quantize_kernel_int4(kernel: jax.Array, group_size: int = 128) -> dict:
    """[..., in, out] → nibble-packed int4 with per-(group, out) scales.

    Two 4-bit values pack into one int8 along the `in` axis; scales are
    per input-group (group_size rows) per output channel — the accuracy
    recipe that makes 4-bit usable (≙ bitsandbytes' blockwise 4-bit,
    ref Emu2 demo backend's load_in_4bit path).

    Fold packing: packed row i holds input row i in the low nibble and
    row i + n_in/2 in the high nibble, so each nibble plane is a
    contiguous block of input rows — what lets the pallas W4A8 kernel
    (ops/q4_matmul.py) consume the halves of x as lane-aligned tiles
    and extract nibbles with int8-native bitwise ops (Mosaic legalizes
    no int8 shift/sub). The low nibble stores value+8 so a single AND
    recovers a linear function of it; the high nibble stores two's
    complement so (byte & 0xF0) == 16*value exactly. Group boundaries
    never straddle the fold (asserted).
    """
    *lead, n_in, n_out = kernel.shape
    assert n_in % group_size == 0 and (n_in // 2) % group_size == 0
    kf = kernel.astype(jnp.float32).reshape(*lead, n_in // group_size,
                                            group_size, n_out)
    scale = jnp.max(jnp.abs(kf), axis=-2) / 7.0          # [..., G, out]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(kf / scale[..., None, :]), -7, 7)
    q = q.astype(jnp.int8).reshape(*lead, n_in, n_out)
    half = n_in // 2
    low = q[..., :half, :] + 8                           # biased: [1, 15]
    high = q[..., half:, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(low, 0x0F),
                            jnp.left_shift(high, 4)).astype(jnp.int8)
    return {"kernel_q4": packed, "scale4": scale}


def materialize_s4(q4p: dict) -> dict:
    """{kernel_q4, scale4} → {kernel_s4, scale4}: unpack the nibble-packed
    int4 plane to a MATERIALIZED native-s4 [..., G/2, 2, gs, out] buffer
    (input-group, fold-plane, rows-in-group, out — original row
    p*n_in/2 + gi*gs + j lives at [gi, p, j]), inside the current jit
    program.

    Why: XLA-native s4 dots (convert-to-bf16 operand stream from an s4
    buffer) measure 88.8 µs vs 110.1 µs for the pallas W4A8 GEMV and
    152.6 µs for XLA int8 weight-only at the 13B gate/up decode shape
    (tools/microbench_int4.py, same chip state) — but ONLY when the s4
    array is a real buffer. If the nibble-unpack stays fused into each
    dot's operand stream XLA re-does it per matmul at ~240 GB/s. The
    `optimization_barrier` forces the one-time materialization.

    s4 buffers cannot cross a jit boundary on the tunnel backend
    (device_put/RecursionError), so storage stays nibble-packed int8 and
    this conversion runs once at the top of each jitted generate/decode
    program (6.7 GB read + write for 13B, amortized over the sequence).
    In-program weight residency doubles (packed + s4) while the program
    runs — callers own that trade (EMU_TPU_DECODE_S4 gates it).
    """
    packed = q4p["kernel_q4"]                      # [..., in/2, out] i8
    scale = q4p["scale4"]                          # [..., G, out]
    *lead, half, n_out = packed.shape
    g = scale.shape[-2]
    g2, gs = g // 2, (2 * half) // g

    # Nibble extraction that stays NARROW: int→int4 converts truncate
    # bits, so `(byte ^ 8).astype(int4)` IS the un-biased low nibble
    # (stored v+8 ∈ [1,15]; flipping bit 3 yields v's two's-complement
    # bits) and the arithmetic `>> 4` is the high nibble. Both planes
    # are elementwise byte→s4 maps that fuse into the stack's slab
    # writes — no widened s8 temp can materialize (a concat-of-int8
    # formulation left 1.46 GB s8 halves live per 13B qkv plane and
    # OOM'd), and no s4 array is ever transposed (strided sub-byte
    # reads of a transposed pair-bitcast miscompiled on the CPU
    # backend: output columns interleaved).
    def _conv(p):                                  # [g2, gs, out] i8 → s4
        low = jnp.bitwise_xor(p, 0x08).astype(jnp.int4)
        high = jnp.right_shift(p, 4).astype(jnp.int4)
        return jnp.stack([low, high], axis=-3)     # [g2, 2, gs, out]

    pg = packed.reshape(*lead, g2, gs, n_out)      # int8 reshape: free
    if lead:
        # stacked layers: serialize per-layer so any nibble-plane temp
        # the stack fusion materializes stays layer-sized (~33 MB) —
        # converting the whole gate_up stack at once left 2x1.32 GB
        # pre-stack s4 temps live at some batch shapes and OOM'd. The
        # lax.map ys-buffer writes each layer's slab in place.
        w = jax.lax.map(_conv, pg.reshape(-1, g2, gs, n_out))
        w = w.reshape(*lead, g2, 2, gs, n_out)
    else:
        w = _conv(pg)
    out = {"kernel_s4": jax.lax.optimization_barrier(w),
           "scale4": scale}
    if "bias" in q4p:
        out["bias"] = q4p["bias"]
    return out


def materialize_s4_tree(params, only: str = ""):
    """Map int4-quantized dense param dicts in the tree to the
    materialized-s4 form (see materialize_s4). Identity on other leaves.

    `only`: regex a dict's path must match to convert (e.g. "mlp/" to
    materialize just the gate_up/down planes — 60% of 13B weight bytes
    for 60% of the s4 residency cost — when the full conversion's 2x
    weight footprint doesn't fit next to the KV cache)."""
    pat = re.compile(only) if only else None

    def walk(t, path=""):
        if isinstance(t, dict):
            if "kernel_q4" in t:
                return (materialize_s4(t)
                        if pat is None or pat.search(path) else t)
            return {k: walk(v, f"{path}{k}/") for k, v in t.items()}
        if isinstance(t, list):                # e.g. UNet block lists
            return [walk(v, f"{path}{i}/") for i, v in enumerate(t)]
        return t
    return walk(params)


def dequantize_int4(params: dict, dtype) -> jax.Array:
    """Unpack {kernel_q4, scale4} back to a dense [..., in, out] kernel.
    The group size is implied by the shapes (n_in / n_groups)."""
    packed = params["kernel_q4"]
    scale = params["scale4"]
    low = jnp.bitwise_and(packed, 0x0F) - 8              # un-bias
    high = jnp.right_shift(packed, 4)                    # sign-extends
    q = jnp.concatenate([low, high], axis=-2)            # [..., in, out]
    *lead, n_in, n_out = q.shape
    group = n_in // scale.shape[-2]
    qf = q.reshape(*lead, n_in // group, group, n_out).astype(dtype)
    w = qf * scale[..., None, :].astype(dtype)
    return w.reshape(*lead, n_in, n_out)


VIT_PATTERNS = (
    r"blocks/attn/(qkv|proj)/kernel$",
    r"blocks/mlp/(fc1|fc2|w1|w2|w3)/kernel$",
)

# UNet Transformer2D interior: attention projections, GEGLU FF, and the
# (linear-projection) in/out projections — the MXU-bound majority of an
# SDXL-class step at 128² latents. Convs/resnets/time-embeds stay float.
UNET_PATTERNS = (
    r"attn[12]/to_(q|k|v|out)/kernel$",
    r"proj_(in|out)/kernel$",
)


def quantize_unet_params(params):
    """The one UNet quantization recipe (W8A8 Transformer2D interior) —
    shared by both pipelines' quantize_unet() and the bench int8 lane."""
    return quantize_tree(params, UNET_PATTERNS, act_quant=True)


QUANTIZE_MODES = ("int8", "int4", "int4-s4", "int4-s4mlp")


def quantize_model_params(params: dict, mode: str) -> dict:
    """The product-surface quantization recipe, shared by the pipelines'
    `quantize=` option and `python -m emu_tpu.serving --quantize` (≙ the
    reference demo's 4-bit serving flag, ref
    Emu2/demo/backend/hf_model/emu/chat.py:59-67).

    mode "int8"/"int4": decoder dense kernels weight-only (decode is
    HBM-bound — fewer weight bytes is the whole win) and, when a
    "visual" tower is present, W8A8 int8 (encode is MXU-bound — the
    int8 MXU path is the win; int4 buys nothing there so the tower is
    W8A8 in both modes). "int4-s4" additionally materializes persistent
    native-s4 buffers at load — backends where s4 arrays cross jit
    boundaries (CPU, real TPU). "int4-s4mlp" materializes only the MLP
    weights (~70% of bytes) — the measured-best recipe when persistent
    residency is tight next to a large KV cache (the b32 serving
    shape: 885 tok/s vs int8's 841 on v5e-1). On the tunnel backend
    materialization at load is not possible (RecursionError); use
    "int4" + EMU_TPU_DECODE_S4=1|mlp there (per-program
    materialization, up to 2x in-program weight residency).

    Already-quantized leaves are left untouched (idempotent)."""
    if mode not in QUANTIZE_MODES:
        raise ValueError(f"quantize mode {mode!r}: pick from "
                         f"{QUANTIZE_MODES}")
    bits = 4 if mode.startswith("int4") else 8
    out = dict(params)
    if "visual" in out:
        out["visual"] = quantize_tree(out["visual"], VIT_PATTERNS,
                                      act_quant=True, layer_chunked=True)
    if "decoder" in out:
        out["decoder"] = quantize_tree(out["decoder"], bits=bits,
                                       layer_chunked=True)
        if mode.startswith("int4-s4"):
            if jax.default_backend() == "axon":
                import warnings
                warnings.warn(
                    f"{mode}: s4 arrays cannot cross a jit boundary on "
                    "the tunneled backend; keeping packed int4 — set "
                    "EMU_TPU_DECODE_S4=1|mlp for per-program "
                    "materialization", stacklevel=2)
            else:
                only = "mlp/" if mode == "int4-s4mlp" else ""
                out["decoder"] = materialize_s4_tree(out["decoder"],
                                                     only=only)
    return out


def quantize_tree(params, patterns: Sequence[str] = DEFAULT_PATTERNS,
                  bits: int = 8, group_size: int = 128,
                  act_quant: bool = False, layer_chunked: bool = False):
    """Quantize matching kernels in a param pytree (path-regex match).

    bits=8: per-channel symmetric int8; bits=4: nibble-packed grouped int4.
    act_quant=True stores int8-MXU W8A8 kernels ({"kernel_w8a8", "scale"},
    consumed with dynamic per-token activation quant) instead of the
    weight-only form — use for MXU-bound encoders (pass VIT_PATTERNS).
    layer_chunked=True runs the quantization one leading-axis slice at a
    time (lax.map over the stacked layer dim) so the fp32 temporaries of
    a multi-GB model fit next to it in HBM."""
    regexes = [re.compile(p) for p in patterns]

    def chunked(fn, v):
        if layer_chunked and v.ndim >= 3:
            return jax.lax.map(fn, v)
        return fn(v)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                sub = f"{path}/{k}" if path else k
                if (k == "kernel" and isinstance(v, jax.Array)
                        and v.ndim <= 3    # matmul kernels only, not convs
                        and any(r.search(sub) for r in regexes)):
                    if bits == 4:
                        # clamp the group to a divisor of the fold half
                        # (small/tiny models have n_in < group_size)
                        n_in = v.shape[-2]
                        gs = group_size
                        while gs > 1 and ((n_in // 2) % gs or n_in % gs):
                            gs //= 2
                        out.update(chunked(
                            lambda w, gs=gs: quantize_kernel_int4(w, gs),
                            v))
                    elif act_quant:
                        q = chunked(quantize_kernel, v)
                        out.update({"kernel_w8a8": q["kernel_q8"],
                                    "scale": q["scale"]})
                    else:
                        out.update(chunked(quantize_kernel, v))
                else:
                    out[k] = walk(v, sub)
            return out
        if isinstance(tree, list):              # e.g. UNet block lists
            return [walk(v, f"{path}/{i}") for i, v in enumerate(tree)]
        return tree

    return walk(params)
