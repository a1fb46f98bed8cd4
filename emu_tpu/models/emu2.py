"""Emu2 composite model: EVA-4B ViT → avg-pool + linear → LLaMA-33B.

Behavioral model: `EmuModel` (Emu2/emu/emu.py:19-235):
- `encode_image`: visual(image) → drop cls → 32×32 grid → avg_pool to
  √n_query² tokens → [B, n_query, 1792] (emu.py:77-90);
- `project_up` 1792→6656 / `project_down` 6656→1792 (no bias, :53-55);
- `generate`: scatter `project_up(encode_image(...))` over `<image>`
  (and `[gIMG]` video) placeholders, HF-style generate (:155-229);
- `generate_image`: regress n_query visual embeddings in 1792-d space —
  hidden → project_down = output embedding, project_up(output) = next
  input embedding (:92-153). KV-cached incremental loop (mathematically
  identical to the reference's full-prefix re-runs; see emu1.py note).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from emu_tpu.config import Emu2Config
from emu_tpu.models import llama, vit
from emu_tpu.ops import layers as L


def init(key: jax.Array, cfg: Emu2Config, dtype=jnp.float32) -> dict:
    kv, kl, ku, kd = jax.random.split(key, 4)
    w, d = cfg.vision.width, cfg.llama.hidden_size
    return {
        "visual": vit.init(kv, cfg.vision, dtype),
        "decoder": llama.init(kl, cfg.llama, dtype),
        "project_up": L.dense_init(ku, w, d, use_bias=False, dtype=dtype),
        "project_down": L.dense_init(kd, d, w, use_bias=False, dtype=dtype),
    }


def encode_image(params: dict, cfg: Emu2Config, images: jax.Array,
                 n_query: Optional[int] = None) -> jax.Array:
    """[B, H, W, 3] → [B, n_query, 1792] pooled visual tokens (emu.py:77-90)."""
    n_query = n_query or cfg.n_query
    feats = vit.forward_features(params["visual"], cfg.vision, images)
    return L.avg_pool_tokens(feats[:, 1:, :], n_query)


def encode_image_lm(params: dict, cfg: Emu2Config, images: jax.Array,
                    n_query: Optional[int] = None) -> jax.Array:
    """encode_image projected to LM width: [B, n_query, 6656]."""
    return L.dense(params["project_up"],
                   encode_image(params, cfg, images, n_query))


def scatter_embeds(params: dict, token_ids: jax.Array,
                   visual_embeds: Optional[jax.Array],
                   placeholder_id: int,
                   base_embeds: Optional[jax.Array] = None) -> jax.Array:
    """Embed tokens, overwrite placeholder positions with visual embeds.

    visual_embeds: [total_placeholders, d_llm] flattened in reading order.
    Composable: pass the previous result as base_embeds to scatter a second
    modality (video over `[gIMG]` after images over `<image>`, emu.py:197-211).
    """
    embeds = (llama.embed(params["decoder"], token_ids)
              if base_embeds is None else base_embeds)
    if visual_embeds is None:
        return embeds
    is_ph = token_ids == placeholder_id
    b, s = token_ids.shape
    order = jnp.cumsum(is_ph.reshape(-1).astype(jnp.int32)) - 1
    gathered = visual_embeds[jnp.clip(order, 0, visual_embeds.shape[0] - 1)]
    gathered = gathered.reshape(b, s, -1).astype(embeds.dtype)
    return jnp.where(is_ph[:, :, None], gathered, embeds)


def generate(params: dict, cfg: Emu2Config, token_ids: jax.Array,
             attention_mask: jax.Array, gcfg, image_token_id: int,
             image_embeds: Optional[jax.Array] = None,
             video_token_id: Optional[int] = None,
             video_embeds: Optional[jax.Array] = None, rng=None) -> jax.Array:
    """Multimodal text generation (ref emu.py:155-229)."""
    from emu_tpu.generation import llama_generate
    embeds = scatter_embeds(params, token_ids, image_embeds, image_token_id)
    if video_embeds is not None:
        embeds = scatter_embeds(params, token_ids, video_embeds,
                                video_token_id, base_embeds=embeds)
    return llama_generate(params["decoder"], cfg.llama, embeds,
                          attention_mask, gcfg, rng)


@functools.partial(jax.jit, static_argnums=(1,))
def generate_image_embeds(params: dict, cfg: Emu2Config,
                          token_ids: jax.Array, attention_mask: jax.Array,
                          prompt_image_embeds: Optional[jax.Array],
                          image_token_id: int) -> jax.Array:
    """Regress n_query visual embeddings in 1792-d space (emu.py:92-153).

    token_ids end with `[IMG]`; prompt_image_embeds are already projected
    to LM width. Returns [B, n_query, 1792] for the diffusion decoder.
    """
    b, s = token_ids.shape
    n = cfg.n_query
    total = -(-(s + n - 1) // 8) * 8       # kernel-legal cache capacity
    embeds = scatter_embeds(params, token_ids, prompt_image_embeds,
                            image_token_id)
    cache = llama.init_cache(cfg.llama, b, total, dtype=embeds.dtype)
    hidden, cache = llama.prefill(params["decoder"], cfg.llama, embeds,
                                  attention_mask, cache)
    down = lambda h: L.dense(params["project_down"], h)
    up = lambda e: L.dense(params["project_up"], e)
    e = down(hidden[:, -1])                                  # [B, 1792]

    slot_mask = jnp.zeros((b, total), bool)
    slot_mask = slot_mask.at[:, :s].set(attention_mask.astype(bool))
    positions = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)

    def step(carry, i):
        cache, e, slot_mask, positions = carry
        slot = s + i
        slot_mask = slot_mask.at[:, slot].set(True)
        h, cache = llama.decode_step(params["decoder"], cfg.llama, cache,
                                     up(e)[:, None, :], slot, slot_mask,
                                     positions)
        e_next = down(h[:, 0])
        return (cache, e_next, slot_mask, positions + 1), e_next

    _, rest = jax.lax.scan(step, (cache, e, slot_mask, positions),
                           jnp.arange(n - 1))
    return jnp.concatenate([e[:, None, :], rest.transpose(1, 0, 2)], axis=1)


sharding_rules = (
    [("visual/" + p, s) for p, s in vit.sharding_rules]
    + [("decoder/" + p, s) for p, s in llama.sharding_rules]
    + [(r"project_up/kernel$", P(None, "model")),
       (r"project_down/kernel$", P("model", None))]
)
