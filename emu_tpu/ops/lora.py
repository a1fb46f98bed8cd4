"""LoRA support for the Emu-I instruction-tuned checkpoints.

The reference patches LoRA r=16 α=16 onto q/k/v/o_proj before loading
Emu-I (ref Emu1/inference.py:41-51, peft). At inference LoRA is exactly
equivalent to the merged weight W' = W + (α/r)·B·A (dropout is train-only),
so the TPU build merges adapters into the base kernels at load time —
zero runtime overhead, no adapter branches in the jitted graph.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def merge_lora_state_dict(sd: Dict[str, np.ndarray], r: int = 16,
                          alpha: float = 16.0) -> Dict[str, np.ndarray]:
    """Fold peft lora_A/lora_B pairs into their base weights.

    peft naming: `<base>.lora_A.weight` [r, in], `<base>.lora_B.weight`
    [out, r]; base either `<base>.weight` or `<base>.base_layer.weight`.
    Also strips peft's `base_model.model.` prefix so the merged dict
    matches the plain model namespace.
    """
    out: Dict[str, np.ndarray] = {}
    lora_a = {k[:-len(".lora_A.weight")]: v for k, v in sd.items()
              if k.endswith(".lora_A.weight")}
    lora_b = {k[:-len(".lora_B.weight")]: v for k, v in sd.items()
              if k.endswith(".lora_B.weight")}
    scaling = alpha / r

    for key, val in sd.items():
        if ".lora_A." in key or ".lora_B." in key:
            continue
        base = None
        if key.endswith(".base_layer.weight"):
            base = key[:-len(".base_layer.weight")]
            clean = base + ".weight"
        elif key.endswith(".weight"):
            base = key[:-len(".weight")]
            clean = key
        else:
            clean = key
        if base is not None and base in lora_a and base in lora_b:
            val = val + scaling * (lora_b[base] @ lora_a[base])
        clean = clean.replace("base_model.model.", "")
        out[clean] = val
    return out
