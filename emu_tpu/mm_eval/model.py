"""Eval-time model adapter: batched generation + loss-ranked classification.

Behavioral model: `emu_inference` / PredictClassMixin (ref
Emu1/mm_eval/models/emu.py:61-131, Emu1/models/prediction_mixin.py:5-131):
- generation: batch prompts (left-padded), scatter visual embeds, beam
  generate, postprocess text;
- classification (VisDial): rank candidate answers by per-candidate LM
  loss, candidates evaluated in `n_segments` chunks to bound memory.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from emu_tpu import tokenization as T
from emu_tpu.config import Emu1Config
from emu_tpu.generation import GenerationConfig
from emu_tpu.models import emu1, llama
from emu_tpu.pipelines import preprocess


class EmuEvalModel:
    def __init__(self, params: dict, cfg: Emu1Config,
                 tokenizer: Optional[T.EmuTokenizer] = None):
        if "q_proj" in params["decoder"]["layers"]["self_attn"]:
            from emu_tpu.models import llama
            # fused qkv/gate_up decode layout — exact, fewer launches
            params = dict(params,
                          decoder=llama.fuse_projections(params["decoder"]))
        self.params, self.cfg = params, cfg
        self.tokenizer = tokenizer or T.EmuTokenizer.emu1(
            instruct=cfg.instruct)

    def _encode_images(self, samples):
        import jax.numpy as jnp
        images = [preprocess.preprocess_image(
            s["image"], self.cfg.vision.image_size) for s in samples
            if s.get("image") is not None]
        if not images:
            return None
        e = emu1.encode_image(self.params, self.cfg,
                              jnp.asarray(np.stack(images)))
        return e.reshape(-1, e.shape[-1])

    def generate_batch(self, samples: List[Dict], num_beams=5,
                       max_new_tokens=20, min_length=1, length_penalty=0.0,
                       repetition_penalty=1.0, prompt_key="prompt",
                       trie=None, **kw) -> List[str]:
        import jax.numpy as jnp
        # bucket prompt lengths so variable-length eval batches reuse the
        # compiled generate program (same trick as the chat pipeline)
        ids, mask = self.tokenizer.encode_batch(
            [s[prompt_key] for s in samples], padding_side="left",
            pad_to_multiple=64)
        image_embeds = self._encode_images(samples)
        gcfg = GenerationConfig(
            max_new_tokens=max_new_tokens, min_length=min_length,
            num_beams=num_beams if trie is None else 1,
            length_penalty=length_penalty,
            repetition_penalty=repetition_penalty,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id)
        from emu_tpu.generation import llama_generate
        embeds = emu1.scatter_image_embeds(
            self.params, jnp.asarray(ids), image_embeds,
            self.tokenizer.image_token_id)
        out = llama_generate(self.params["decoder"], self.cfg.llama, embeds,
                             jnp.asarray(mask), gcfg, trie=trie)
        return self.tokenizer.batch_decode(np.asarray(out))

    def generate_answerability(self, samples: List[Dict],
                               candidates) -> List[str]:
        """Trie-constrained decode over fixed candidates
        (≙ prefix_allowed_tokens_fn, ref mm_eval/models/emu.py:97-109)."""
        from emu_tpu.mm_eval.trie import build_trie
        import jax.numpy as jnp
        seqs = [self.tokenizer.encode(" " + c, add_bos=False)
                + [self.tokenizer.eos_token_id] for c in candidates]
        trie = build_trie(seqs, self.tokenizer.vocab_size,
                          self.tokenizer.eos_token_id,
                          self.tokenizer.pad_token_id)
        trie = {k: jnp.asarray(v) for k, v in trie.items()}
        max_new = max(len(s) for s in seqs)
        return self.generate_batch(samples, num_beams=1,
                                   max_new_tokens=max_new,
                                   prompt_key="answerability_prompt",
                                   trie=trie)

    def predict_batch(self, samples: List[Dict], n_segments=10,
                      options_key="options", **kw) -> List[List[int]]:
        """Per-sample candidate ranking by LM loss (ascending)."""
        return [self._rank_options(s, s[options_key], n_segments)
                for s in samples]

    def _rank_options(self, sample: Dict, options: List[str],
                      n_segments: int) -> List[int]:
        import jax
        import jax.numpy as jnp
        prompt_ids = self.tokenizer.encode(sample["prompt"])
        image_embeds = self._encode_images([sample])
        losses = []
        seg = max(1, len(options) // n_segments)
        for start in range(0, len(options), seg):
            chunk = options[start:start + seg]
            cand_ids = [self.tokenizer.encode(" " + o, add_bos=False)
                        for o in chunk]
            max_c = max(len(c) for c in cand_ids)
            b = len(chunk)
            total = len(prompt_ids) + max_c
            ids = np.full((b, total), self.tokenizer.pad_token_id, np.int32)
            mask = np.zeros((b, total), np.int32)
            tgt_mask = np.zeros((b, total), np.int32)
            for i, c in enumerate(cand_ids):
                ids[i, :len(prompt_ids)] = prompt_ids
                ids[i, len(prompt_ids):len(prompt_ids) + len(c)] = c
                mask[i, :len(prompt_ids) + len(c)] = 1
                tgt_mask[i, len(prompt_ids):len(prompt_ids) + len(c)] = 1
            embeds = emu1.scatter_image_embeds(
                self.params, jnp.asarray(ids),
                None if image_embeds is None else jnp.tile(
                    image_embeds, (b, 1)),
                self.tokenizer.image_token_id)
            hidden = llama.forward_hidden(self.params["decoder"],
                                          self.cfg.llama, embeds,
                                          jnp.asarray(mask))
            logits = llama.logits(self.params["decoder"],
                                  hidden).astype(jnp.float32)
            logprobs = jax.nn.log_softmax(logits[:, :-1], -1)
            tgt = jnp.asarray(ids[:, 1:])
            ll = jnp.take_along_axis(logprobs, tgt[:, :, None], -1)[..., 0]
            valid = jnp.asarray(tgt_mask[:, 1:]).astype(jnp.float32)
            loss = -(ll * valid).sum(-1) / jnp.maximum(valid.sum(-1), 1)
            losses.extend(np.asarray(loss).tolist())
        return list(np.argsort(losses))
