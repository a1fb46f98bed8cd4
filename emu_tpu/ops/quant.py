"""Weight-only int8 quantization.

The TPU replacement for the reference demo's 4-bit bitsandbytes serving
mode (ref Emu2/demo/backend/hf_model/emu/chat.py:59-67): per-output-channel
symmetric int8 kernels with bf16 scales. Essential for Emu2-33B on v5e
(16 GB/chip): bf16 66 GB → int8 33 GB, TP-sharded 8-way ≈ 4.2 GB/chip.

`emu_tpu.ops.layers.dense` consumes quantized param dicts transparently:
{"kernel_q8": int8 [in, out], "scale": f32 [out]} — XLA fuses the
dequantize into the matmul's operand load.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_PATTERNS = (
    r"self_attn/(q|k|v|o)_proj/kernel$",
    r"mlp/(gate|up|down)/kernel$",
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


def quantize_tree(params, patterns: Sequence[str] = DEFAULT_PATTERNS):
    """Quantize matching kernels in a param pytree (path-regex match)."""
    regexes = [re.compile(p) for p in patterns]

    def walk(tree, path=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                sub = f"{path}/{k}" if path else k
                if (k == "kernel" and isinstance(v, jax.Array)
                        and any(r.search(sub) for r in regexes)):
                    qd = quantize_kernel(v)
                    out["kernel_q8"] = qd["kernel_q8"]
                    out["scale"] = qd["scale"]
                else:
                    out[k] = walk(v, sub)
            return out
        return tree

    return walk(params)
