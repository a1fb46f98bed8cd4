"""Stable-Diffusion safety checker: CLIP ViT-L/14 + concept thresholds.

Behavioral model: the diffusers `StableDiffusionSafetyChecker` both
reference pipelines run after VAE decode (ref Emu1/models/pipeline.py:
203-216, Emu2/emu/diffusion.py:236-249): CLIP-embed the output image,
compare cosine similarity against 17 NSFW concept embeddings (+3
special-care embeddings that tighten the thresholds), and black out
flagged images.

Includes the CLIP vision tower itself (quick-GELU, class embedding,
pre/post layer norms — structurally different from EVA, so it gets its own
forward) plus the CLIPImageProcessor-style resize/center-crop/normalize,
and a converter from the HF safety-checker state dict.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emu_tpu.ops import layers as L


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls):
        return cls(image_size=28, patch_size=14, hidden_size=32,
                   num_layers=2, num_heads=2, intermediate_size=64,
                   projection_dim=16)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init(key, cfg: CLIPVisionConfig, n_concepts: int = 17,
         n_special: int = 3, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 8))
    d = cfg.hidden_size

    def layer_init(k):
        ks = iter(jax.random.split(k, 6))
        return {
            "ln1": L.layer_norm_init(d, dtype),
            "ln2": L.layer_norm_init(d, dtype),
            "attn": {n: L.dense_init(next(ks), d, d, dtype=dtype)
                     for n in ("q", "k", "v", "out")},
            "mlp": {"fc1": L.dense_init(next(ks), d, cfg.intermediate_size,
                                        dtype=dtype),
                    "fc2": L.dense_init(next(ks), cfg.intermediate_size, d,
                                        dtype=dtype)},
        }

    grid = cfg.image_size // cfg.patch_size
    return {
        "patch_embed": {"kernel": L._trunc_normal(
            next(keys), (cfg.patch_size ** 2 * 3, d), 0.02, dtype)},
        "class_embedding": jnp.zeros((d,), dtype),
        "position_embedding": L._trunc_normal(
            next(keys), (grid * grid + 1, d), 0.02, dtype),
        "pre_layrnorm": L.layer_norm_init(d, dtype),
        "layers": jax.vmap(layer_init)(
            jax.random.split(next(keys), cfg.num_layers)),
        "post_layernorm": L.layer_norm_init(d, dtype),
        "visual_projection": L.dense_init(
            next(keys), d, cfg.projection_dim, use_bias=False, dtype=dtype),
        "concept_embeds": L._trunc_normal(
            next(keys), (n_concepts, cfg.projection_dim), 1.0, dtype),
        "special_care_embeds": L._trunc_normal(
            next(keys), (n_special, cfg.projection_dim), 1.0, dtype),
        "concept_embeds_weights": 0.2 * jnp.ones((n_concepts,), dtype),
        "special_care_embeds_weights": 0.2 * jnp.ones((n_special,), dtype),
    }


def clip_image_embeds(params: dict, cfg: CLIPVisionConfig,
                      images: jax.Array) -> jax.Array:
    """Normalized CLIP pixels [B, S, S, 3] → projected embeds [B, P]."""
    eps = cfg.layer_norm_eps
    x = L.patch_embed({"kernel": params["patch_embed"]["kernel"],
                       "bias": jnp.zeros((cfg.hidden_size,), images.dtype)},
                      images, cfg.patch_size)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["class_embedding"][None, None],
                           (b, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)
    x = L.layer_norm(params["pre_layrnorm"], x, eps)

    h, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def body(x, p):
        res = x
        y = L.layer_norm(p["ln1"], x, eps)
        q = L.dense(p["attn"]["q"], y).reshape(b, -1, h, hd)
        k = L.dense(p["attn"]["k"], y).reshape(b, -1, h, hd)
        v = L.dense(p["attn"]["v"], y).reshape(b, -1, h, hd)
        from emu_tpu.ops.attention import dot_product_attention
        o = dot_product_attention(q, k, v, scale=hd ** -0.5, backend="xla")
        x = res + L.dense(p["attn"]["out"], o.reshape(b, -1,
                                                      cfg.hidden_size))
        y = L.layer_norm(p["ln2"], x, eps)
        y = L.dense(p["mlp"]["fc2"], _quick_gelu(L.dense(p["mlp"]["fc1"],
                                                         y)))
        return x + y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = L.layer_norm(params["post_layernorm"], x[:, 0], eps)
    return L.dense(params["visual_projection"], pooled)


def _cosine(a, b):
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return a @ b.T


class SafetyChecker:
    """Callable matching the pipelines' `safety_checker(images)` hook:
    np images in [0,1] → (images with flagged ones blacked, [bool])."""

    def __init__(self, params: dict, cfg: CLIPVisionConfig =
                 CLIPVisionConfig()):
        self.params, self.cfg = params, cfg

    def clip_preprocess(self, images: np.ndarray) -> jax.Array:
        """[B, H, W, 3] in [0,1] → CLIP-normalized [B, 224, 224, 3]."""
        from emu_tpu.pipelines.preprocess import OPENAI_MEAN, OPENAI_STD
        x = jnp.asarray(images, jnp.float32)
        b, h, w, _ = x.shape
        s = self.cfg.image_size
        short = min(h, w)
        nh, nw = int(round(h * s / short)), int(round(w * s / short))
        x = jax.image.resize(x, (b, nh, nw, 3), "bicubic")
        top, left = (nh - s) // 2, (nw - s) // 2
        x = x[:, top:top + s, left:left + s]
        return (x - jnp.asarray(OPENAI_MEAN)) / jnp.asarray(OPENAI_STD)

    def __call__(self, images: np.ndarray
                 ) -> Tuple[np.ndarray, list]:
        clip_in = self.clip_preprocess(images)
        embeds = clip_image_embeds(self.params, self.cfg, clip_in)
        special_cos = _cosine(embeds, self.params["special_care_embeds"])
        concept_cos = _cosine(embeds, self.params["concept_embeds"])

        special_scores = (special_cos
                          - self.params["special_care_embeds_weights"][None])
        has_special = jnp.any(special_scores > 0, axis=1)
        adjustment = jnp.where(has_special, 0.01, 0.0)[:, None]
        concept_scores = (concept_cos
                          - self.params["concept_embeds_weights"][None]
                          + adjustment)
        has_nsfw = np.asarray(jnp.any(concept_scores > 0, axis=1))

        out = np.array(images)
        out[has_nsfw] = 0.0
        return out, has_nsfw.tolist()


def convert_safety_checker(sd: dict, cfg: CLIPVisionConfig =
                           CLIPVisionConfig(), dtype=jnp.float32) -> dict:
    """HF StableDiffusionSafetyChecker state dict → our params."""
    from emu_tpu.checkpoint import _SD
    s = _SD(sd, dtype=dtype)
    vm = s.sub("vision_model.vision_model")
    p_sz = cfg.patch_size
    conv = sd["vision_model.vision_model.embeddings.patch_embedding.weight"]

    def layer(b: _SD):
        return {
            "ln1": b.ln("layer_norm1"), "ln2": b.ln("layer_norm2"),
            "attn": {"q": b.linear("self_attn.q_proj"),
                     "k": b.linear("self_attn.k_proj"),
                     "v": b.linear("self_attn.v_proj"),
                     "out": b.linear("self_attn.out_proj")},
            "mlp": {"fc1": b.linear("mlp.fc1"), "fc2": b.linear("mlp.fc2")},
        }

    return {
        "patch_embed": {"kernel": jnp.asarray(
            conv.transpose(2, 3, 1, 0).reshape(p_sz * p_sz * 3, -1), dtype)},
        "class_embedding": vm.raw("embeddings.class_embedding"),
        "position_embedding": vm.raw("embeddings.position_embedding.weight"),
        "pre_layrnorm": vm.ln("pre_layrnorm"),
        "layers": vm.sub("encoder").stack(cfg.num_layers, layer,
                                          "layers.{}"),
        "post_layernorm": vm.ln("post_layernorm"),
        "visual_projection": s.linear("visual_projection", bias=False),
        "concept_embeds": s.raw("concept_embeds"),
        "special_care_embeds": s.raw("special_care_embeds"),
        "concept_embeds_weights": s.raw("concept_embeds_weights"),
        "special_care_embeds_weights": s.raw("special_care_embeds_weights"),
    }
