"""EmuVisualGeneration: Emu2-Gen image generation / autoencoding.

Behavioral model: Emu2/emu/diffusion.py:31-318 —
- autoencoding mode (single image, no text): `encode_image` directly as the
  UNet condition, CFG negative = zero image, cached (:194-202);
- generation mode: `generate_image` regression of n_query 1792-d embeds,
  CFG negative = empty prompt, cached (:204-210);
- SDXL added conditions: time_ids = original_size + crop + target,
  text_embeds = mean(prompt_embeds, dim=1) (:107-113);
- EulerDiscrete 50 steps at 1024², CFG 3.0, `latents *= init_noise_sigma`,
  SDXL VAE (scaling 0.13025) decode, PIL out.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emu_tpu import tokenization as T
from emu_tpu.config import (Emu2Config, SchedulerConfig, UNetConfig,
                            VAEConfig)
from emu_tpu.diffusion import EulerDiscreteScheduler, unet, vae
from emu_tpu.models import emu2
from emu_tpu.pipelines import preprocess


@dataclass
class VisualGenerationOutput:
    image: object
    nsfw_content_detected: Optional[bool] = None


class EmuVisualGeneration:
    def __init__(self, emu_params: dict, emu_cfg: Emu2Config,
                 unet_params: dict, unet_cfg: UNetConfig,
                 vae_params: dict, vae_cfg: VAEConfig,
                 tokenizer: Optional[T.EmuTokenizer] = None,
                 scheduler_cfg: SchedulerConfig = SchedulerConfig(),
                 safety_checker: Optional[Callable] = None,
                 quantize: Optional[str] = None):
        if quantize:
            # serving-grade recipe: decoder weight-only int8/int4 +
            # vision tower W8A8 (ops/quant.quantize_model_params; ≙ ref
            # demo 4-bit flag, Emu2/demo/backend/hf_model/emu/chat.py:59)
            from emu_tpu.ops.quant import quantize_model_params
            # donate: the bf16 input leaves free as each is quantized —
            # without it the full bf16 decoder and its int8 copy coexist
            # next to the UNet (measured OOM at 33B-width L8 on 16 GB).
            # The caller's emu_params buffers are consumed.
            emu_params = jax.jit(
                lambda p: quantize_model_params(p, quantize),
                donate_argnums=0)(emu_params)
        self.emu_params, self.emu_cfg = emu_params, emu_cfg
        self.unet_params, self.unet_cfg = unet_params, unet_cfg
        self.vae_params, self.vae_cfg = vae_params, vae_cfg
        self.scheduler_cfg = scheduler_cfg
        self.tokenizer = tokenizer or T.EmuTokenizer.emu2(
            instruct=emu_cfg.instruct)
        self.safety_checker = safety_checker
        self.image_placeholder = (
            T.IMG + T.IMAGE * emu_cfg.n_query + T.IMG_END)
        self.vae_scale_factor = 2 ** (len(vae_cfg.block_out_channels) - 1)
        self.negative_prompt = {}          # CFG negative cache (ref :65)

    def quantize_unet(self) -> "EmuVisualGeneration":
        """W8A8-quantize the UNet's Transformer2D interior in place (the
        MXU-bound majority of an SDXL step; int8 MXU sustains ~1.7x the
        bf16 rate on v5e). Opt-in; composes with cache_interval."""
        from emu_tpu.ops.quant import quantize_unet_params
        self.unet_params = quantize_unet_params(self.unet_params)
        return self

    @classmethod
    def from_config(cls, seed: int = 0, dtype=jnp.bfloat16,
                    tiny: bool = False, **kwargs) -> "EmuVisualGeneration":
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        if tiny:
            emu_cfg = Emu2Config.tiny()
            unet_cfg = UNetConfig.tiny(
                cross_attention_dim=emu_cfg.vision.width, sdxl=True)
            vae_cfg = VAEConfig.tiny()
        else:
            emu_cfg = Emu2Config()
            unet_cfg = UNetConfig.emu2_sdxl()
            vae_cfg = VAEConfig()
        return cls(emu2.init(k1, emu_cfg, dtype), emu_cfg,
                   unet.init(k2, unet_cfg, dtype), unet_cfg,
                   vae.init(k3, vae_cfg, dtype), vae_cfg, **kwargs)

    @classmethod
    def from_pretrained(cls, model_path: str, dtype=jnp.bfloat16,
                        tiny: bool = False,
                        **kwargs) -> "EmuVisualGeneration":
        """Load the whole Emu2-Gen pipeline from one state dict file
        (ref Emu2/emu/diffusion.py:250-267: a single safetensors/torch
        blob whose keys carry multimodal_encoder. / unet. / vae.
        prefixes, loaded strict onto the from_config structure;
        safety_checker.* entries are accepted and ignored — pipelines
        default safety_checker=None)."""
        from emu_tpu import checkpoint as C
        sd = C.load_state_dict(model_path)
        split = {"multimodal_encoder": {}, "unet": {}, "vae": {}}
        for k, v in sd.items():
            head, _, rest = k.partition(".")
            if head in split:
                split[head][rest] = v
        missing = [k for k, v in split.items() if not v]
        if missing:
            raise ValueError(f"{model_path}: no {missing} weights found "
                             f"(keys must be prefixed like the reference "
                             f"pipeline state dict)")
        if tiny:
            emu_cfg = Emu2Config.tiny()
            unet_cfg = UNetConfig.tiny(
                cross_attention_dim=emu_cfg.vision.width, sdxl=True)
            vae_cfg = VAEConfig.tiny()
        else:
            emu_cfg = Emu2Config()
            unet_cfg = UNetConfig.emu2_sdxl()
            vae_cfg = VAEConfig()
        return cls(
            C.convert_emu2(split["multimodal_encoder"], emu_cfg, dtype),
            emu_cfg,
            C.convert_unet(split["unet"], unet_cfg, dtype), unet_cfg,
            C.convert_vae(split["vae"], vae_cfg, dtype), vae_cfg, **kwargs)

    # -- conditioning (ref diffusion.py:168-212) ----------------------------

    def _encode_inputs(self, inputs, do_cfg: bool) -> jax.Array:
        size = self.emu_cfg.vision.image_size
        has_image = has_text = False
        text, images = "", []
        for x in inputs:
            if isinstance(x, str):
                has_text = True
                text += x
            else:
                has_image = True
                text += T.IMG_PLACEHOLDER
                images.append(preprocess.preprocess_image(x, size))

        if has_image and not has_text:          # autoencoding mode
            # ref diffusion.py:194: "you can ONLY input exactly one image"
            assert len(images) == 1, (
                "autoencoding mode takes exactly one image "
                f"(got {len(images)}); add text for generation mode")
            batch = jnp.asarray(np.stack(images))
            prompt = emu2.encode_image(self.emu_params, self.emu_cfg, batch)
            if do_cfg:
                key = "[NULL_IMAGE]"
                if key not in self.negative_prompt:
                    self.negative_prompt[key] = emu2.encode_image(
                        self.emu_params, self.emu_cfg,
                        jnp.zeros_like(batch))
                prompt = jnp.concatenate(
                    [prompt, self.negative_prompt[key]], 0)
            return prompt

        image_embeds = None
        if images:
            batch = jnp.asarray(np.stack(images))
            e = emu2.encode_image_lm(self.emu_params, self.emu_cfg, batch)
            image_embeds = e.reshape(-1, e.shape[-1])

        prompt = self._regress(text, image_embeds)
        if do_cfg:
            key = ""
            if key not in self.negative_prompt:
                self.negative_prompt[key] = self._regress(key, None)
            prompt = jnp.concatenate([prompt, self.negative_prompt[key]], 0)
        return prompt

    def _regress(self, text: str, image_embeds) -> jax.Array:
        text = text.replace(T.IMG_PLACEHOLDER,
                            self.image_placeholder) + T.IMG
        ids, mask = self.tokenizer.encode_batch([text], padding_side="left")
        return emu2.generate_image_embeds(
            self.emu_params, self.emu_cfg, jnp.asarray(ids),
            jnp.asarray(mask), image_embeds, self.tokenizer.image_token_id)

    # -- generation ----------------------------------------------------------

    def __call__(self, inputs, height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 50, guidance_scale: float = 3.0,
                 crop_info: List[int] = (0, 0),
                 original_size: List[int] = (1024, 1024),
                 rng: Optional[jax.Array] = None,
                 cache_interval: int = 1) -> VisualGenerationOutput:
        if not isinstance(inputs, list):
            inputs = [inputs]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0
        prompt_embeds = self._encode_inputs(inputs, do_cfg)

        time_ids = jnp.asarray(
            list(original_size) + list(crop_info) + [height, width],
            jnp.float32)
        time_ids = jnp.tile(time_ids[None], (prompt_embeds.shape[0], 1))

        h = height // self.vae_scale_factor
        w = width // self.vae_scale_factor
        latents = jax.random.normal(
            rng, (1, h, w, self.unet_cfg.in_channels), prompt_embeds.dtype)
        image = _denoise_euler(
            self.unet_params, self.unet_cfg, self.vae_params, self.vae_cfg,
            self.scheduler_cfg, num_inference_steps, latents, prompt_embeds,
            time_ids, jnp.float32(guidance_scale), do_cfg, cache_interval)
        image = np.asarray(image)
        nsfw = None
        if self.safety_checker is not None:
            image, nsfw = self.safety_checker(image)
        from emu_tpu.pipelines.emu1_pipeline import _to_pil
        return VisualGenerationOutput(image=_to_pil(image)[0],
                                      nsfw_content_detected=nsfw)


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 10, 11))
def _denoise_euler(unet_params, unet_cfg, vae_params, vae_cfg, sched_cfg,
                   steps: int, latents, prompt_embeds, time_ids,
                   guidance_scale, do_cfg: bool, cache_interval: int = 1):
    """cache_interval > 1 enables UNet block caching (unet.forward
    deep_cache): each group of `cache_interval` steps runs one full pass
    and reuses its deep feature for the rest — an intentional
    approximation (DeepCache-style) trading a little fidelity for a
    near-proportional speedup of the transformer-heavy interior."""
    sched = EulerDiscreteScheduler(sched_cfg, num_inference_steps=steps)
    latents = latents * jnp.asarray(sched.init_noise_sigma, latents.dtype)
    text_embeds = jnp.mean(prompt_embeds, axis=1)
    n = sched.num_inference_steps

    def substep(i, latents, cache):
        ic = jnp.minimum(i, n - 1)              # guard group overhang
        inp = jnp.concatenate([latents] * 2, 0) if do_cfg else latents
        inp = sched.scale_model_input(inp, ic)
        t = jnp.broadcast_to(sched.timesteps[ic], (inp.shape[0],))
        eps = unet.forward(unet_params, unet_cfg, inp, t, prompt_embeds,
                           added_text_embeds=text_embeds,
                           added_time_ids=time_ids,
                           deep_cache=cache,
                           return_cache=cache_interval > 1)
        if cache_interval > 1:
            eps, cache = eps
        if do_cfg:
            cond, uncond = jnp.split(eps, 2, axis=0)
            eps = uncond + guidance_scale * (cond - uncond)
        new = sched.step(eps, ic, latents)
        return jnp.where(i < n, new, latents), cache

    if cache_interval == 1:
        body = lambda i, lat: substep(i, lat, None)[0]
        latents = jax.lax.fori_loop(0, n, body, latents)
    else:
        def group(g, lat):
            i0 = g * cache_interval
            lat, cache = substep(i0, lat, None)
            for o in range(1, cache_interval):
                lat, _ = substep(i0 + o, lat, cache)
            return lat
        latents = jax.lax.fori_loop(0, -(-n // cache_interval), group,
                                    latents)
    img = vae.decode(vae_params, vae_cfg,
                     latents / jnp.asarray(vae_cfg.scaling_factor,
                                           latents.dtype))
    return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
