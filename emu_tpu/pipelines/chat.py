"""EmuChatGeneration: the Emu2 user-facing multimodal chat API.

Behavioral model: Emu2/emu/chat.py:20-232 — plain (`List[str | Image]`) and
chat (`List[List[str | Image]]`) input formats, USER/ASSISTANT role
alternation with `</s>` between turns, system message, grounding mode
(`<grounding>` suffix), `[VIDEO]`/`[/VIDEO]` span handling where each frame
becomes a `[gIMG]`-placeholder image, bicubic-448 CLIP preprocessing, and
the reference's generation defaults (beam 5, length_penalty −1).

The reference's ModelParallelMixin layer-placement is replaced by mesh
sharding: pass `mesh=` to shard the whole parameter tree over
("data", "model") — GSPMD then runs the same `__call__` tensor-parallel.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from emu_tpu import tokenization as T
from emu_tpu.config import Emu2Config
from emu_tpu.generation import GenerationConfig
from emu_tpu.models import emu2
from emu_tpu.pipelines import preprocess


class EmuChatGeneration:
    def __init__(self, params: dict, cfg: Emu2Config,
                 tokenizer: Optional[T.EmuTokenizer] = None,
                 mesh=None, fuse: bool = True,
                 quantize: Optional[str] = None,
                 preprocess_mode: str = "host"):
        """fuse=True (default) rewrites the decoder to the fused
        qkv_proj/gate_up layout (llama.fuse_projections) — numerically
        exact, one projection launch instead of three per decode step.

        quantize: None | "int8" | "int4" | "int4-s4" | "int4-s4mlp"
        — the serving-grade
        quantization recipe (decoder weight-only + vision tower W8A8;
        ops/quant.quantize_model_params), ≙ the reference demo backend's
        4-bit flag (ref Emu2/demo/backend/hf_model/emu/chat.py:59-67).

        preprocess_mode: "host" (PIL bicubic, bit-exact vs the reference
        transform, ref Emu2/emu/chat.py:35-39) or "device" (host→TPU
        transfer is RAW uint8 bytes; fused resize+normalize on device —
        the north-star data path; pixel values differ from PIL at the
        ~1e-2 level from bicubic antialiasing)."""
        assert preprocess_mode in ("host", "device"), preprocess_mode
        if fuse and "q_proj" in params["decoder"]["layers"]["self_attn"]:
            from emu_tpu.models import llama
            params = dict(params,
                          decoder=llama.fuse_projections(params["decoder"]))
        if quantize:
            from emu_tpu.ops.quant import quantize_model_params
            # no donation: callers may share the float tree across
            # replica builds (serving --tiny)
            params = jax.jit(
                lambda p: quantize_model_params(p, quantize))(params)
        self.cfg = cfg
        self.tokenizer = tokenizer or T.EmuTokenizer.emu2(
            instruct=cfg.instruct)
        self.image_placeholder = (
            T.IMG + T.IMAGE * cfg.n_query + T.IMG_END)
        self.video_placeholder = (
            T.IMG + T.GIMG * cfg.v_query + T.IMG_END)
        if mesh is not None:
            from emu_tpu.parallel import shard_params
            params = shard_params(params, mesh, emu2.sharding_rules)
        self.params = params
        self.preprocess_mode = preprocess_mode
        # encode in the tower's compute dtype: host preprocessing yields
        # fp32 numpy, and feeding that to a bf16 tower silently promotes
        # the whole ViT to fp32 matmuls (dense casts kernels to x.dtype)
        # patch_embed is never quantized (VIT_PATTERNS covers blocks only)
        self._img_dtype = params["visual"]["patch_embed"]["kernel"].dtype

    def multito(self, devices) -> "EmuChatGeneration":
        """Device-list API shim over mesh sharding (≙ the reference's
        `multicuda`/`multito` layer placement, Emu2/emu/chat.py:235-283):
        tensor-parallel-shards the params over the given devices."""
        from emu_tpu.parallel import make_mesh, shard_params
        mesh = make_mesh((1, len(devices)), devices=devices)
        self.params = shard_params(self.params, mesh, emu2.sharding_rules)
        return self

    multicuda = multito

    @classmethod
    def from_config(cls, instruct: bool = False, seed: int = 0,
                    dtype=None, **kwargs) -> "EmuChatGeneration":
        """Random-init instance (ref chat.py:215-232: n_query 256 for
        instruct, 64 for base)."""
        import jax.numpy as jnp
        cfg = Emu2Config.chat() if instruct else Emu2Config()
        params = emu2.init(jax.random.PRNGKey(seed), cfg,
                           dtype or jnp.bfloat16)
        return cls(params, cfg, **kwargs)

    @classmethod
    def from_pretrained(cls, path: str, instruct: bool = False,
                        dtype=None, **kwargs) -> "EmuChatGeneration":
        import jax.numpy as jnp
        from emu_tpu.checkpoint import load_emu2_checkpoint
        cfg = Emu2Config.chat() if instruct else Emu2Config()
        params = load_emu2_checkpoint(path, cfg, dtype or jnp.bfloat16)
        return cls(params, cfg, **kwargs)

    # -- input assembly (ref chat.py:121-195) -------------------------------

    def _preprocess(self, image):
        if self.preprocess_mode == "device":
            return preprocess.to_uint8_rgb(image)      # raw bytes; resize
        size = self.cfg.vision.image_size              # + normalize on TPU
        return preprocess.preprocess_image(image, size)

    def _prepare_inputs(self, inputs):
        is_video = False
        text, images, videos = "", [], []
        for x in inputs:
            if x == T.FAKE_VIDEO_END:
                is_video = False
            elif isinstance(x, str):
                if x == T.VIDEO:
                    is_video = True
                text += x
            elif is_video:
                text += T.VID_PLACEHOLDER
                videos.append(self._preprocess(x))
            else:
                text += T.IMG_PLACEHOLDER
                images.append(self._preprocess(x))
        return text, images, videos

    def _prepare_chat_inputs(self, inputs, is_grounding: bool):
        text = (T.GROUND_SYSTEM_MESSAGE if is_grounding
                else T.SYSTEM_MESSAGE)
        images, videos = [], []
        prev = None
        for msg in inputs:
            if prev == T.ASSISTANT:
                text += f"{T.EOS}{T.USER}: "
                prev = T.USER
            elif prev is None:
                text += f" {T.USER}: "
                prev = T.USER
            else:
                text += f" {T.ASSISTANT}: "
                prev = T.ASSISTANT
            t, im, vid = self._prepare_inputs(msg)
            text += t
            images += im
            videos += vid
        text += f" {T.ASSISTANT}:"
        if is_grounding:
            text += T.GRD
        return text, images, videos

    def _assemble_batch(self, batch_inputs: List[List],
                        is_grounding: bool):
        """Conversations → (prompt texts, image arrays, video arrays)."""
        texts, images, videos = [], [], []
        for inputs in batch_inputs:
            assert isinstance(inputs, list)
            if inputs and isinstance(inputs[0], list):
                assert len(inputs) % 2 == 1, \
                    "last message must be user input"
                text, im, vid = self._prepare_chat_inputs(inputs,
                                                          is_grounding)
            else:
                text, im, vid = self._prepare_inputs(inputs)
            text = text.replace(T.IMG_PLACEHOLDER, self.image_placeholder)
            text = text.replace(T.VID_PLACEHOLDER, self.video_placeholder)
            texts.append(text)
            images += im
            videos += vid
        return texts, images, videos

    def _image_batch(self, arrs):
        """Preprocessed list → device batch in the tower's compute dtype.
        Device mode ships raw uint8 and fuses resize+normalize on TPU
        (per-shape groups: raw images may differ in resolution)."""
        import jax.numpy as jnp
        size = self.cfg.vision.image_size
        if self.preprocess_mode != "device":
            return jnp.asarray(np.stack(arrs)).astype(self._img_dtype)
        if all(a.shape == arrs[0].shape for a in arrs):
            x = preprocess.device_preprocess(jnp.asarray(np.stack(arrs)),
                                             size)
        else:
            x = jnp.concatenate(
                [preprocess.device_preprocess(jnp.asarray(a)[None], size)
                 for a in arrs])
        return x.astype(self._img_dtype)

    def _encode_visuals(self, images, videos):
        image_embeds = video_embeds = None
        if images:
            e = emu2.encode_image_lm(self.params, self.cfg,
                                     self._image_batch(images),
                                     self.cfg.n_query)
            image_embeds = e.reshape(-1, e.shape[-1])
        if videos:
            e = emu2.encode_image_lm(self.params, self.cfg,
                                     self._image_batch(videos),
                                     self.cfg.v_query)
            video_embeds = e.reshape(-1, e.shape[-1])
        return image_embeds, video_embeds

    def embed_inputs(self, inputs: List, is_grounding: bool = False):
        """One conversation → (inputs_embeds [1,S,D], mask [1,S],
        token_ids [1,S]): the prompt in decoder-embedding space with
        visual embeds scattered in — the admission unit for the
        slot-level continuous engine (generation.continuous). token_ids
        additionally serve the text-only speculative path."""
        import jax.numpy as jnp
        texts, images, videos = self._assemble_batch([inputs],
                                                     is_grounding)
        ids, mask = self.tokenizer.encode_batch(texts)
        image_embeds, video_embeds = self._encode_visuals(images, videos)
        ids_j = jnp.asarray(ids)
        embeds = emu2.scatter_embeds(self.params, ids_j, image_embeds,
                                     self.tokenizer.image_token_id)
        if video_embeds is not None:
            embeds = emu2.scatter_embeds(self.params, ids_j, video_embeds,
                                         self.tokenizer.gimg_token_id,
                                         base_embeds=embeds)
        return embeds, jnp.asarray(mask), ids

    # -- generation ----------------------------------------------------------

    def __call__(self, inputs: List, **kwargs) -> str:
        return self.generate_batch([inputs], **kwargs)[0]

    def generate_batch(self, batch_inputs: List[List],
                       is_grounding: bool = False,
                       num_beams: int = 5, max_new_tokens: int = 10,
                       min_len: int = 1, do_sample: bool = False,
                       penalty_alpha: Optional[float] = None,
                       top_p: Optional[float] = None,
                       top_k: Optional[int] = None,
                       temperature: Optional[float] = None,
                       length_penalty: float = -1.0,
                       repetition_penalty: float = 1.0,
                       skip_special_tokens: bool = True,
                       speculative: bool = False,
                       rng=None) -> List[str]:
        """Run several independent conversations as one padded batch —
        the unit the serving-side dynamic batcher dispatches.

        `speculative` is a serving-level routing hint (consumed by the
        continuous backend's draft/verify side path); the batched path
        accepts and ignores it."""
        import jax.numpy as jnp
        texts, images, videos = self._assemble_batch(batch_inputs,
                                                     is_grounding)
        # bucket prompt lengths so repeat requests hit the jit cache
        ids, mask = self.tokenizer.encode_batch(texts, padding_side="left",
                                                pad_to_multiple=64)
        image_embeds, video_embeds = self._encode_visuals(images, videos)

        if penalty_alpha:              # contrastive search (ref chat.py:52)
            num_beams = 1
        gcfg = GenerationConfig(
            max_new_tokens=max_new_tokens, min_length=min_len,
            num_beams=num_beams, do_sample=do_sample,
            temperature=temperature or 1.0, top_k=top_k or 0,
            top_p=top_p or 1.0, repetition_penalty=repetition_penalty,
            length_penalty=length_penalty,
            penalty_alpha=penalty_alpha or 0.0,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id)
        out = emu2.generate(self.params, self.cfg, jnp.asarray(ids),
                            jnp.asarray(mask), gcfg,
                            self.tokenizer.image_token_id,
                            image_embeds=image_embeds,
                            video_token_id=self.tokenizer.gimg_token_id,
                            video_embeds=video_embeds, rng=rng)
        return self.tokenizer.batch_decode(np.asarray(out),
                                           skip_special_tokens)
