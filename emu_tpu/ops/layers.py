"""Core neural-net ops, TPU-first.

Design notes:
- Parameters are plain pytrees (nested dicts of jnp arrays); every op is a
  pure function `op(params, x, ...)`. This keeps pjit/GSPMD sharding fully
  explicit and avoids framework magic on the hot path.
- Matmul-heavy ops keep operands in the compute dtype (bf16 on TPU, fed to
  the MXU) while normalizations run in fp32, matching the reference's
  `LayerNormFp32` semantics (ref: Emu1/models/transformer.py:25-31).
- Linear kernels are stored as [in, out] (column-major for `x @ W`), i.e.
  transposed w.r.t. torch's `nn.Linear.weight`; the checkpoint converter
  handles the transpose.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# Dense / linear
# ---------------------------------------------------------------------------


def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
               std: float = 0.02, dtype=jnp.float32) -> dict:
    p = {"kernel": _trunc_normal(key, (in_dim, out_dim), std, dtype)}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(params: dict, x: jax.Array) -> jax.Array:
    """y = x @ W (+ b). Accumulates in fp32 on the MXU.

    Also consumes int8 weight-only-quantized params
    ({"kernel_q8", "scale"}, see emu_tpu.ops.quant): the per-output-channel
    scale commutes with the contraction, so it applies AFTER the dot —
    the operand is the bare int8→bf16 cast (exact: |v| ≤ 127) and the
    rescale is an [.., out]-sized epilogue multiply in the fp32
    accumulator instead of an [in, out]-sized dequant, with no
    reliance on XLA fusing a multiply into the dot's operand load."""
    if "kernel_w8a8" in params:
        from emu_tpu.ops.quant import dense_w8a8
        return dense_w8a8(params, x)
    if "kernel_q8" in params:
        y = jnp.dot(x, params["kernel_q8"].astype(x.dtype),
                    preferred_element_type=jnp.float32)
        y = y * params["scale"].astype(jnp.float32)
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)
    if "kernel_s4" in params:
        return _dense_s4(params, x)
    if "kernel_q4" in params:
        from emu_tpu.ops.q4_matmul import matmul_q4, q4_plan
        if q4_plan(params, x):
            return matmul_q4(x, params["kernel_q4"], params["scale4"],
                             params.get("bias"))
        from emu_tpu.ops.quant import dequantize_int4
        w = dequantize_int4(params, x.dtype)
    else:
        w = params["kernel"].astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    # named so the "named" remat policy can save the BF16 cast instead of
    # the f32 dot output: jax's dots_*_saveable policies checkpoint the
    # raw dot_general result, which at preferred_element_type=f32 stacks
    # 2x the bytes per layer under the training scan (and OOMs 2x sooner)
    return checkpoint_name(y.astype(x.dtype), "dense_out")


def _dense_s4(params: dict, x: jax.Array) -> jax.Array:
    """Dense over a materialized native-s4 kernel (quant.materialize_s4).

    Decode-shaped rows (≤32) run a per-group batched dot: the bf16
    operand stream is the bare s4→bf16 cast (exact, |v| ≤ 7) and the
    per-(group, out) scale applies in the fp32 accumulator — no
    [in, out] dequant buffer, no pallas launch. XLA streams the s4
    buffer at ~1.7× the int8 weight-only rate (half the bytes at ~85%
    of the byte bandwidth; tools/microbench_int4.py). Larger row counts
    (prefill) dequantize per use, like the packed-int4 fallback."""
    w4 = params["kernel_s4"]               # [G/2, 2, gs, out] s4
    scale = params["scale4"]               # [G, out] f32
    if w4.ndim != 4:
        raise ValueError(
            f"dense() got a stacked s4 kernel {w4.shape}; s4 params must "
            "be per-layer (run the layer scan first, or materialize after "
            "slicing)")
    g2, _, gs, n_out = w4.shape[-4:]
    n_in = 2 * g2 * gs
    lead = x.shape[:-1]
    xf = x.reshape(-1, n_in)
    m = xf.shape[0]
    # scale group p*G/2 + gi sits at [gi, p]: match the kernel layout
    sr = scale.reshape(2, g2, n_out).transpose(1, 0, 2)[:, :, None, :]
    if m > 32:
        wq = w4.astype(x.dtype) * sr.astype(x.dtype)
        w = wq.transpose(1, 0, 2, 3).reshape(n_in, n_out)  # original rows
        y = jnp.dot(xf, w, preferred_element_type=jnp.float32)
    else:
        xg = xf.reshape(m, 2, g2, gs).transpose(2, 1, 0, 3)    # [G/2,2,M,gs]
        yg = jax.lax.dot_general(
            xg, w4.astype(x.dtype),
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)                # [G/2,2,M,out]
        y = jnp.sum(yg * sr.astype(jnp.float32), axis=(0, 1))
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.reshape(*lead, n_out).astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm computed in fp32, output cast back to input dtype.

    Matches the reference's LayerNormFp32 used whenever the model runs in
    bf16 (ref: Emu1/models/transformer.py:25-31, model.py:106).
    """
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(scale: jax.Array, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LLaMA RMSNorm / T5LayerNorm: no mean subtraction, no bias.

    Variance in fp32; scale applied in the input dtype after the cast back,
    matching HF LlamaRMSNorm (hidden.to(fp32) → rsqrt → to(dtype) → * weight).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(dtype)
    return y * scale.astype(dtype)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------


def _pick_bm(m: int, bm0: int) -> int:
    """Largest row block <= bm0 (multiple of 128, >= 256) minimizing the
    M padding round_up(m, bm) - m. ViT-g at batch 32 has M = 32*264 =
    8448 rows: bm=512 pads to 8704 (+3% dead MXU work) while 384 tiles
    exactly — measured ~2% whole-kernel win. Smaller bm always fits the
    same VMEM plan, so this never regresses the OOM envelope."""
    best, best_pad = bm0, (m + bm0 - 1) // bm0 * bm0 - m
    for bm in range(bm0, 255, -128):
        pad = (m + bm - 1) // bm * bm - m
        if pad < best_pad:
            best, best_pad = bm, pad
    return best


def _fused_mlp_bf(params, x, names):
    """(bm, bf) block sizes for the fused pallas MLP, or None to stay
    unfused. Eligibility: TPU only, bf16, unquantized, no inner LN, enough
    rows to fill the row-block pipeline. EMU_TPU_FUSED_MLP=0 forces the
    unfused path (snapshotted at import — ops/flags.py)."""
    from emu_tpu.ops.flags import flag
    if flag("EMU_TPU_FUSED_MLP") == "0":
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    if "ffn_ln" in params or any("kernel" not in params[n] for n in names):
        return None
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if m < 2048:
        return None
    if x.dtype.itemsize > 2:
        return None                       # bf16/fp8 regime only
    k = x.shape[-1]
    n = params[names[-1]]["kernel"].shape[1]
    # Empirically validated against Mosaic's 16MB scoped-VMEM limit on
    # v5e (estimating the allocator's footprint proved unreliable):
    # ViT-g (k=n=1408) compiles at (512, 768); EVA-4B (k=n=1792,
    # hidden 15360) OOMs there but compiles at (256, 512).
    dim = max(k, n)
    if len(names) == 3:                   # swiglu: two hidden-side streams
        return (_pick_bm(m, 256), 512) if dim <= 1536 else None
    if dim <= 1536:
        return (_pick_bm(m, 512), 768)
    if dim <= 2304:
        return (256, 512)
    return None


def _fused_mlp_w8a8_bf(params, x, names):
    """(bm, bf) for the int8 fused MLP kernel, or None. GELU family only;
    int8 weight blocks are half-size, so hidden blocks run larger."""
    from emu_tpu.ops.flags import flag
    if flag("EMU_TPU_FUSED_MLP") == "0":
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    if len(names) != 2 or "ffn_ln" in params:
        return None
    if any("kernel_w8a8" not in params[n] for n in names):
        return None
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if m < 2048 or x.dtype.itemsize > 2:
        return None
    dim = max(x.shape[-1], params[names[-1]]["kernel_w8a8"].shape[1])
    if dim <= 1536:
        return (_pick_bm(m, 512), 768)
    if dim <= 2304:
        return (256, 768)
    return None


def gelu_mlp(params: dict, x: jax.Array, subln_eps: Optional[float] = None
             ) -> jax.Array:
    """ViT MLP: Linear → exact GELU → (optional sub-LN) → Linear.

    Ref: Emu1/models/eva_vit_model.py Mlp (torch nn.GELU = exact erf gelu).
    On TPU, big unquantized shapes run as one fused pallas kernel (the erf
    GELU executes in the MXU's shadow; see ops/fused_mlp.py); W8A8 shapes
    run the int8-MXU fused variant.
    """
    blk = _fused_mlp_bf(params, x, ("fc1", "fc2"))
    if blk is not None:
        from emu_tpu.ops.fused_mlp import fused_mlp
        return fused_mlp(x, params["fc1"]["kernel"], params["fc1"].get("bias"),
                         params["fc2"]["kernel"], params["fc2"].get("bias"),
                         bm=blk[0], bf=blk[1])
    blk = _fused_mlp_w8a8_bf(params, x, ("fc1", "fc2"))
    if blk is not None:
        from emu_tpu.ops.fused_mlp import fused_mlp_w8a8
        return fused_mlp_w8a8(
            x, params["fc1"]["kernel_w8a8"], params["fc1"]["scale"],
            params["fc1"].get("bias"), params["fc2"]["kernel_w8a8"],
            params["fc2"]["scale"], params["fc2"].get("bias"),
            bm=blk[0], bf=blk[1])
    h = dense(params["fc1"], x)
    h = jax.nn.gelu(h, approximate=False)
    if "ffn_ln" in params:
        h = layer_norm(params["ffn_ln"], h, eps=subln_eps or 1e-6)
    return dense(params["fc2"], h)


def fused_block_mlp(norm_params: dict, mlp_params: dict, x: jax.Array,
                    eps: float, postnorm: bool) -> Optional[jax.Array]:
    """Whole MLP residual branch in one pallas kernel, or None if not
    eligible (CPU, quantized, sub-LN, small batch — caller falls back).

    pre-norm (Emu1):  x + mlp(LN(x));  post-norm (Emu2): x + LN(mlp(x)).
    """
    names = ("w1", "w2", "w3") if "w1" in mlp_params else ("fc1", "fc2")
    p = mlp_params
    kw = dict(ln_mode="post" if postnorm else "pre", residual=True, eps=eps,
              ln_scale=norm_params["scale"], ln_bias=norm_params["bias"])
    blk = _fused_mlp_bf(mlp_params, x, names)
    if blk is not None:
        from emu_tpu.ops.fused_mlp import fused_mlp
        kw.update(bm=blk[0], bf=blk[1])
        if names[0] == "w1":
            return fused_mlp(x, p["w1"]["kernel"], p["w1"].get("bias"),
                             p["w2"]["kernel"], p["w2"].get("bias"),
                             p["w3"]["kernel"], p["w3"].get("bias"),
                             activation="swiglu", **kw)
        return fused_mlp(x, p["fc1"]["kernel"], p["fc1"].get("bias"),
                         p["fc2"]["kernel"], p["fc2"].get("bias"), **kw)
    blk = _fused_mlp_w8a8_bf(mlp_params, x, names)
    if blk is not None:
        from emu_tpu.ops.fused_mlp import fused_mlp_w8a8
        return fused_mlp_w8a8(
            x, p["fc1"]["kernel_w8a8"], p["fc1"]["scale"],
            p["fc1"].get("bias"), p["fc2"]["kernel_w8a8"], p["fc2"]["scale"],
            p["fc2"].get("bias"), bm=blk[0], bf=blk[1], **kw)
    return None


def swiglu_mlp(params: dict, x: jax.Array, subln_eps: Optional[float] = None
               ) -> jax.Array:
    """EVA SwiGLU MLP: silu(w1(x)) * w2(x) → (optional sub-LN) → w3.

    Ref: Emu2/emu/eva_vit.py SwiGLU (:110-140).
    """
    blk = _fused_mlp_bf(params, x, ("w1", "w2", "w3"))
    if blk is not None:
        from emu_tpu.ops.fused_mlp import fused_mlp
        return fused_mlp(x, params["w1"]["kernel"], params["w1"].get("bias"),
                         params["w2"]["kernel"], params["w2"].get("bias"),
                         params["w3"]["kernel"], params["w3"].get("bias"),
                         activation="swiglu", bm=blk[0], bf=blk[1])
    h = jax.nn.silu(dense(params["w1"], x)) * dense(params["w2"], x)
    if "ffn_ln" in params:
        h = layer_norm(params["ffn_ln"], h, eps=subln_eps or 1e-6)
    return dense(params["w3"], h)


def llama_mlp(params: dict, x: jax.Array) -> jax.Array:
    """LLaMA gated MLP: down(silu(gate(x)) * up(x)).

    With the fused `gate_up` layout (llama.fuse_projections) the two
    input projections run as one matmul."""
    if "gate_up" in params:
        g, u = jnp.split(dense(params["gate_up"], x), 2, axis=-1)
        return dense(params["down"], jax.nn.silu(g) * u)
    return dense(params["down"],
                 jax.nn.silu(dense(params["gate"], x)) * dense(params["up"], x))


# ---------------------------------------------------------------------------
# Patch embedding
# ---------------------------------------------------------------------------


def patch_embed_init(key, patch_size: int, in_chans: int, width: int,
                     dtype=jnp.float32) -> dict:
    # Stored as a matmul kernel [p*p*c, width] — the stride==kernel conv of
    # the reference (eva_vit PatchEmbed, Conv2d k=p s=p) is exactly a
    # patchify-reshape followed by a dense layer, which keeps the whole
    # embedding on the MXU instead of a conv window walk.
    k = _trunc_normal(key, (patch_size * patch_size * in_chans, width), 0.02,
                      dtype)
    return {"kernel": k, "bias": jnp.zeros((width,), dtype)}


def patch_embed(params: dict, images: jax.Array, patch_size: int) -> jax.Array:
    """[B, H, W, C] images → [B, (H/p)*(W/p), width] patch tokens.

    NHWC layout (TPU-native). Equivalent to the reference's Conv2d
    patch projection (ref: Emu1/models/eva_vit_model.py:429-452) —
    the converter reshapes the torch conv weight [w, c, p, p] into our
    [p*p*c, w] matmul kernel with matching (h, w, c) patch-pixel order.
    """
    b, h, w, c = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [B, gh, gw, p, p, c]
    x = x.reshape(b, gh * gw, p * p * c)
    return dense(params, x)


# ---------------------------------------------------------------------------
# Token-grid pooling (Emu2 adapter)
# ---------------------------------------------------------------------------


def avg_pool_tokens(tokens: jax.Array, n_query: int) -> jax.Array:
    """Average-pool a square token grid down to n_query tokens.

    [B, S, C] with S a perfect square → [B, n_query, C]; equivalent to the
    reference's permute + F.avg_pool2d + flatten (Emu2/emu/emu.py:77-90).
    """
    b, s, c = tokens.shape
    g = int(round(s ** 0.5))
    q = int(round(n_query ** 0.5))
    stride = g // q
    x = tokens.reshape(b, q, stride, q, stride, c)
    x = jnp.mean(x.astype(jnp.float32), axis=(2, 4))
    return x.reshape(b, q * q, c).astype(tokens.dtype)
