"""CLIP dual encoder (vision + text towers, projections, logit scale).

Purpose: CLIP-score evaluation of generated images — the standard
text↔image alignment metric for the visual-generation path (the
reference repo evaluates generations qualitatively only; CLIP score is
the quantitative equivalent used by the T2I literature). Also reusable
as a retrieval scorer.

The vision tower is the same architecture the safety checker carries
(quick-GELU, class embedding, pre/post LN — models/safety_checker.py);
this module adds the text tower (causal transformer, eot-token pooling,
ref HF CLIPTextModel semantics), both projection heads, the learned
logit scale, and a converter from the HF `CLIPModel` state dict.
Golden-tested against transformers.CLIPModel in tests/test_clip.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from emu_tpu.models.safety_checker import (CLIPVisionConfig, _quick_gelu,
                                           clip_image_embeds)
from emu_tpu.ops import layers as L
from emu_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls):
        return cls(vocab_size=99, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, max_position_embeddings=16,
                   projection_dim=16)


@dataclass(frozen=True)
class CLIPConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig(projection_dim=768)
    text: CLIPTextConfig = CLIPTextConfig()

    @classmethod
    def tiny(cls):
        return cls(vision=CLIPVisionConfig.tiny(), text=CLIPTextConfig.tiny())


def _text_layer_init(key, cfg: CLIPTextConfig, dtype):
    ks = iter(jax.random.split(key, 6))
    d = cfg.hidden_size
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


def init(key, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    from emu_tpu.models import safety_checker as SC
    keys = iter(jax.random.split(key, 8))
    t = cfg.text
    vision = SC.init(next(keys), cfg.vision, dtype=dtype)
    for k in ("concept_embeds", "special_care_embeds",
              "concept_embeds_weights", "special_care_embeds_weights"):
        vision.pop(k, None)
    return {
        "vision": vision,
        "text": {
            "token_embedding": L._trunc_normal(
                next(keys), (t.vocab_size, t.hidden_size), 0.02, dtype),
            "position_embedding": L._trunc_normal(
                next(keys), (t.max_position_embeddings, t.hidden_size),
                0.02, dtype),
            "layers": jax.vmap(
                lambda k: _text_layer_init(k, t, dtype))(
                    jax.random.split(next(keys), t.num_layers)),
            "final_layer_norm": L.layer_norm_init(t.hidden_size, dtype),
            "text_projection": L.dense_init(
                next(keys), t.hidden_size, t.projection_dim, use_bias=False,
                dtype=dtype),
        },
        "logit_scale": jnp.asarray(2.6592, dtype),   # HF CLIP init
    }


def text_embeds(params: dict, cfg: CLIPTextConfig,
                input_ids: jax.Array) -> jax.Array:
    """[B, T] token ids → projected text embeds [B, P].

    Pooled at the eot token = argmax(input_ids) per row (the eot id is the
    largest in CLIP's vocab), matching HF CLIPTextModel pooling."""
    p = params
    eps = cfg.layer_norm_eps
    b, tlen = input_ids.shape
    x = p["token_embedding"][input_ids]
    x = x + p["position_embedding"][None, :tlen].astype(x.dtype)

    h, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def body(x, lp):
        res = x
        y = L.layer_norm(lp["ln1"], x, eps)
        q = L.dense(lp["attn"]["q"], y).reshape(b, -1, h, hd)
        k = L.dense(lp["attn"]["k"], y).reshape(b, -1, h, hd)
        v = L.dense(lp["attn"]["v"], y).reshape(b, -1, h, hd)
        o = dot_product_attention(q, k, v, scale=hd ** -0.5, causal=True,
                                  backend="xla")
        x = res + L.dense(lp["attn"]["out"],
                          o.reshape(b, -1, cfg.hidden_size))
        y = L.layer_norm(lp["ln2"], x, eps)
        y = L.dense(lp["mlp"]["fc2"], _quick_gelu(L.dense(lp["mlp"]["fc1"],
                                                          y)))
        return x + y, None

    x, _ = jax.lax.scan(body, x, p["layers"])
    x = L.layer_norm(p["final_layer_norm"], x, eps)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return L.dense(p["text_projection"], pooled)


def image_embeds(params: dict, cfg: CLIPConfig, images: jax.Array
                 ) -> jax.Array:
    """Normalized CLIP pixels [B, S, S, 3] → projected embeds [B, P]."""
    return clip_image_embeds(params["vision"], cfg.vision, images)


def clip_score(params: dict, cfg: CLIPConfig, images: jax.Array,
               input_ids: jax.Array) -> jax.Array:
    """Pairwise CLIP score: max(100·cos(img_i, txt_i), 0)  — [B].

    The torchmetrics/literature-standard CLIPScore definition (w=100, clipped
    at 0); images must already be CLIP-preprocessed."""
    ie = image_embeds(params, cfg, images)
    te = text_embeds(params["text"], cfg.text, input_ids)
    ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    return jnp.maximum(100.0 * jnp.sum(ie * te, axis=-1), 0.0)


def clip_preprocess(images, size: int = 224) -> jax.Array:
    """[B, H, W, 3] images in [0, 1] → CLIP-normalized [B, size, size, 3]
    (bicubic shortest-side resize + center crop + OpenAI normalize)."""
    from emu_tpu.pipelines.preprocess import OPENAI_MEAN, OPENAI_STD
    x = jnp.asarray(images, jnp.float32)
    b, h, w, _ = x.shape
    short = min(h, w)
    nh, nw = int(round(h * size / short)), int(round(w * size / short))
    x = jax.image.resize(x, (b, nh, nw, 3), "bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size]
    return (x - jnp.asarray(OPENAI_MEAN)) / jnp.asarray(OPENAI_STD)


def similarity_logits(params: dict, cfg: CLIPConfig, images: jax.Array,
                      input_ids: jax.Array):
    """(logits_per_image [B_img, B_txt], logits_per_text) as HF CLIPModel."""
    ie = image_embeds(params, cfg, images)
    te = text_embeds(params["text"], cfg.text, input_ids)
    ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    lpi = scale * ie @ te.T
    return lpi, lpi.T


def convert_clip(sd: dict, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    """HF transformers CLIPModel state dict → our params."""
    from emu_tpu.checkpoint import _SD
    s = _SD({k: (v.float().numpy() if hasattr(v, "numpy") else v)
             for k, v in sd.items()}, dtype=dtype)
    vm = s.sub("vision_model")
    p_sz = cfg.vision.patch_size
    conv = s.sd["vision_model.embeddings.patch_embedding.weight"]
    if hasattr(conv, "numpy"):
        conv = conv.float().numpy()

    def layer(b: _SD):
        return {
            "ln1": b.ln("layer_norm1"), "ln2": b.ln("layer_norm2"),
            "attn": {"q": b.linear("self_attn.q_proj"),
                     "k": b.linear("self_attn.k_proj"),
                     "v": b.linear("self_attn.v_proj"),
                     "out": b.linear("self_attn.out_proj")},
            "mlp": {"fc1": b.linear("mlp.fc1"), "fc2": b.linear("mlp.fc2")},
        }

    tm = s.sub("text_model")
    return {
        "vision": {
            "patch_embed": {"kernel": jnp.asarray(
                conv.transpose(2, 3, 1, 0).reshape(p_sz * p_sz * 3, -1),
                dtype)},
            "class_embedding": vm.raw("embeddings.class_embedding"),
            "position_embedding": vm.raw(
                "embeddings.position_embedding.weight"),
            "pre_layrnorm": vm.ln("pre_layrnorm"),
            "layers": vm.sub("encoder").stack(
                cfg.vision.num_layers, layer, "layers.{}"),
            "post_layernorm": vm.ln("post_layernorm"),
            "visual_projection": s.linear("visual_projection", bias=False),
        },
        "text": {
            "token_embedding": tm.raw("embeddings.token_embedding.weight"),
            "position_embedding": tm.raw(
                "embeddings.position_embedding.weight"),
            "layers": tm.sub("encoder").stack(
                cfg.text.num_layers, layer, "layers.{}"),
            "final_layer_norm": tm.ln("final_layer_norm"),
            "text_projection": s.linear("text_projection", bias=False),
        },
        "logit_scale": s.raw("logit_scale"),
    }
