"""Emu1 composite model: EVA-ViT-g → ln_visual → CausalFormer → LLaMA-13B.

Behavioral model: `Emu` (Emu1/models/modeling_emu.py:22-249):
- `encode_image`: visual.forward_features → LayerNorm(eps 1e-6) → CausalFormer
  → [B, n_causal=32, 5120] (modeling_emu.py:92-95);
- `generate`: tokenize left-padded prompt, embed, scatter the 32 visual
  embeddings per image over `<image>` placeholder positions, HF generate
  with inputs_embeds (:100-185) — here `emu_tpu.generation.llama_generate`;
- `generate_image`: autoregressively regress n_causal visual embeddings
  through `stu_regress_head` (:187-249). The reference re-runs the full
  prefix per token (32 full forwards, O(32·L²)); causal attention makes the
  incremental KV-cached loop below mathematically identical, so we decode —
  one prefill + 31 cached steps.
- `forward_loss`: the (unused-in-release) training CE path
  (modeling_llama.py:189-252): labels = input ids with pad/[IMG]/[/IMG]/
  `<image>` masked to -100, shifted CE.

Token-string work (placeholder expansion, tokenization) lives in
`emu_tpu.pipelines`; this module is pure array computation under jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from emu_tpu.config import Emu1Config
from emu_tpu.models import causal_former, llama, vit
from emu_tpu.ops import layers as L


def init(key: jax.Array, cfg: Emu1Config, dtype=jnp.float32) -> dict:
    kv, kc, kl = jax.random.split(key, 3)
    return {
        "visual": vit.init(kv, cfg.vision, dtype),
        "ln_visual": L.layer_norm_init(cfg.vision.width, dtype),
        "cformer": causal_former.init(kc, cfg.t5, cfg.n_causal,
                                      cfg.llama.hidden_size, dtype),
        "decoder": llama.init(kl, cfg.llama, dtype, with_regress_head=True),
    }


def encode_image(params: dict, cfg: Emu1Config, images: jax.Array
                 ) -> jax.Array:
    """[B, H, W, 3] normalized images → [B, n_causal, d_llm]."""
    feats = vit.forward_features(params["visual"], cfg.vision, images)
    feats = L.layer_norm(params["ln_visual"], feats, eps=1e-6)
    return causal_former.forward(params["cformer"], cfg.t5, feats)


def scatter_image_embeds(params: dict, token_ids: jax.Array,
                         image_embeds: Optional[jax.Array],
                         image_token_id: int) -> jax.Array:
    """Embed tokens and overwrite `<image>` positions with visual embeds.

    image_embeds: [n_images * n_causal, d] flattened in reading order —
    placeholder count must equal its length (ref modeling_emu.py:151-157).
    Implemented as a cumulative-index gather (jit-safe scatter equivalent of
    the reference's boolean fancy-indexing).
    """
    embeds = llama.embed(params["decoder"], token_ids)
    if image_embeds is None:
        return embeds
    is_img = token_ids == image_token_id                      # [B, S]
    b, s = token_ids.shape
    flat = is_img.reshape(-1)
    order = jnp.cumsum(flat.astype(jnp.int32)) - 1            # index into embeds
    gathered = image_embeds[jnp.clip(order, 0, image_embeds.shape[0] - 1)]
    gathered = gathered.reshape(b, s, -1).astype(embeds.dtype)
    return jnp.where(is_img[:, :, None], gathered, embeds)


def generate(params: dict, cfg: Emu1Config, token_ids: jax.Array,
             attention_mask: jax.Array, image_embeds: Optional[jax.Array],
             gcfg, image_token_id: int, rng=None) -> jax.Array:
    """Multimodal text generation (ref modeling_emu.py:100-185)."""
    from emu_tpu.generation import llama_generate
    embeds = scatter_image_embeds(params, token_ids, image_embeds,
                                  image_token_id)
    return llama_generate(params["decoder"], cfg.llama, embeds,
                          attention_mask, gcfg, rng)


# ---------------------------------------------------------------------------
# Visual regression (image generation conditioning)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def generate_image_embeds(params: dict, cfg: Emu1Config,
                          token_ids: jax.Array, attention_mask: jax.Array,
                          prompt_image_embeds: Optional[jax.Array],
                          image_token_id: int) -> jax.Array:
    """Regress n_causal visual embeddings.

    token_ids already END with the `[IMG]` token (the pipeline appends it,
    ref modeling_emu.py:207-210). Returns [B, n_causal, d_llm] — the
    `stu_regress_head` outputs that condition the diffusion decoder.

    KV-cached equivalent of the reference's 32-full-forward loop: each
    regressed embedding is fed back as the next input embedding; hiddens are
    read post-final-norm (HF hidden_states[-1]).
    """
    b, s = token_ids.shape
    d = cfg.llama.hidden_size
    n = cfg.n_causal
    total = -(-(s + n - 1) // 8) * 8       # kernel-legal cache capacity
    embeds = scatter_image_embeds(params, token_ids, prompt_image_embeds,
                                  image_token_id)
    cache = llama.init_cache(cfg.llama, b, total, dtype=embeds.dtype)
    hidden, cache = llama.prefill(params["decoder"], cfg.llama, embeds,
                                  attention_mask, cache)
    regress = lambda h: L.dense(params["decoder"]["stu_regress_head"], h)
    e = regress(hidden[:, -1])                              # [B, d] — e_1

    slot_mask = jnp.zeros((b, total), bool)
    slot_mask = slot_mask.at[:, :s].set(attention_mask.astype(bool))
    positions = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)

    def step(carry, i):
        cache, e, slot_mask, positions = carry
        slot = s + i
        slot_mask = slot_mask.at[:, slot].set(True)
        h, cache = llama.decode_step(params["decoder"], cfg.llama, cache,
                                     e[:, None, :], slot, slot_mask,
                                     positions)
        e_next = regress(h[:, 0])
        return (cache, e_next, slot_mask, positions + 1), e_next

    (_, _, _, _), rest = jax.lax.scan(
        step, (cache, e, slot_mask, positions), jnp.arange(n - 1))
    # rest: [n-1, B, d] → full sequence [B, n, d]
    return jnp.concatenate([e[:, None, :], rest.transpose(1, 0, 2)], axis=1)


# ---------------------------------------------------------------------------
# Training-style loss path (parity with LLaMAForClsAndRegression.forward)
# ---------------------------------------------------------------------------


def forward_loss(params: dict, cfg: Emu1Config, token_ids: jax.Array,
                 attention_mask: jax.Array, image_embeds: jax.Array,
                 special_ids: Tuple[int, int, int, int],
                 remat: bool = False, scan_unroll: int = 1) -> jax.Array:
    """Masked shifted cross-entropy (ref modeling_llama.py:189-252).

    special_ids: (pad, img_start, img_end, image). Returns mean CE over
    non-masked target positions. remat accepts the forward_hidden policy
    vocabulary (False/True/"dots"/"named"/"dots+attn"); the measured-best
    13B train config on v5e-1 is remat="named" + scan_unroll=depth
    (BASELINE.md train row).
    """
    pad_id, img_id, img_end_id, image_id = special_ids
    embeds = scatter_image_embeds(params, token_ids, image_embeds, image_id)
    hidden = llama.forward_hidden(params["decoder"], cfg.llama, embeds,
                                  attention_mask, remat=remat,
                                  scan_unroll=scan_unroll)
    ignore = ((token_ids == pad_id) | (token_ids == img_id)
              | (token_ids == img_end_id) | (token_ids == image_id))
    shift_valid = (~ignore[:, 1:]) & attention_mask[:, 1:].astype(bool)
    # chunked logsumexp CE: identical math to log_softmax+gather but the
    # [B, T, V] fp32 logits never exist whole (llama.masked_ce_loss) —
    # ~2 GB less peak HBM per step at 8x1024x32k
    return llama.masked_ce_loss(params["decoder"], hidden[:, :-1],
                                token_ids[:, 1:], shift_valid)


sharding_rules = (
    [("visual/" + p, s) for p, s in vit.sharding_rules]
    + [("cformer/" + p, s) for p, s in causal_former.sharding_rules]
    + [("decoder/" + p, s) for p, s in llama.sharding_rules]
)
