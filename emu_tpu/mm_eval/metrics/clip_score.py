"""CLIP-score metric for generated images.

The quantitative text-image alignment check for the visual-generation
pipeline (the reference evaluates its generations qualitatively only —
Emu1/image_inference.py writes samples to disk). Standard CLIPScore:
mean over samples of max(100 * cos(CLIP_img, CLIP_txt), 0).

Weights come from any HF CLIPModel checkpoint via
models.clip.convert_clip; tokenized prompts are the caller's job (the
CLIP BPE tokenizer ships with the checkpoint, e.g.
transformers.CLIPTokenizer) so this stays offline-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from emu_tpu.models import clip as C


def evaluate_clip_score(params: dict, cfg: "C.CLIPConfig",
                        images01: np.ndarray, input_ids: np.ndarray,
                        batch_size: int = 16) -> dict:
    """images01 [N, H, W, 3] in [0, 1]; input_ids [N, T] CLIP-BPE tokens.

    Returns {"clip_score": mean, "scores": [N]}."""
    n = images01.shape[0]
    assert input_ids.shape[0] == n, "one prompt per image"
    scores = []
    for i in range(0, n, batch_size):
        imgs = C.clip_preprocess(images01[i:i + batch_size],
                                 cfg.vision.image_size)
        ids = jnp.asarray(input_ids[i:i + batch_size])
        scores.append(np.asarray(C.clip_score(params, cfg, imgs, ids)))
    scores = np.concatenate(scores)
    return {"clip_score": float(scores.mean()), "scores": scores.tolist()}
