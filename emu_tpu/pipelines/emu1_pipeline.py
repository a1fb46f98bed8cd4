"""EmuGenerationPipeline: Emu1 text/image-conditioned image generation.

Behavioral model: Emu1/models/pipeline.py:20-262 —
- interleaved `[str | Image]` inputs become a prompt with `[IMG]<image>*32
  [/IMG]` runs per image;
- classifier-free guidance with the pair [prompt, ""] (pipeline.py:167-170),
  noise mix `uncond + g*(cond - uncond)` with cond first (:122-125);
- 32 visual embeddings regressed by the multimodal encoder condition an
  SD1.5-class UNet (cross_attention_dim = 5120) through a 50-step PNDM
  (PLMS) schedule at 512×512; VAE decode, optional safety checker, PIL out.

TPU design: the whole CFG denoise loop jits into one lax.fori_loop program
(both CFG branches in a single [2B] UNet batch); latents stay on device
from randn to VAE decode.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emu_tpu import tokenization as T
from emu_tpu.config import (Emu1Config, SchedulerConfig, UNetConfig,
                            VAEConfig)
from emu_tpu.diffusion import PNDMScheduler, unet, vae
from emu_tpu.models import emu1
from emu_tpu.pipelines import preprocess


class EmuGenerationPipeline:
    def __init__(self, emu_params: dict, emu_cfg: Emu1Config,
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
            import jax as _jax
            from emu_tpu.ops.quant import quantize_model_params
            emu_params = _jax.jit(
                lambda p: quantize_model_params(p, quantize))(emu_params)
        self.emu_params, self.emu_cfg = emu_params, emu_cfg
        self.unet_params, self.unet_cfg = unet_params, unet_cfg
        self.vae_params, self.vae_cfg = vae_params, vae_cfg
        self.scheduler_cfg = scheduler_cfg
        self.tokenizer = tokenizer or T.EmuTokenizer.emu1(
            instruct=emu_cfg.instruct)
        self.safety_checker = safety_checker
        self.image_placeholder = (
            T.IMG + T.IMAGE * emu_cfg.n_causal + T.IMG_END)
        self.vae_scale_factor = 2 ** (len(vae_cfg.block_out_channels) - 1)

    def quantize_unet(self) -> "EmuGenerationPipeline":
        """W8A8-quantize the UNet's Transformer2D interior in place
        (attention/FF matmuls only; the SD1.5 conv projections stay
        float). Opt-in; composes with cache_interval."""
        from emu_tpu.ops.quant import quantize_unet_params
        self.unet_params = quantize_unet_params(self.unet_params)
        return self

    @classmethod
    def from_config(cls, seed: int = 0, dtype=jnp.bfloat16, tiny: bool = False,
                    **kwargs) -> "EmuGenerationPipeline":
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        if tiny:
            emu_cfg = Emu1Config.tiny()
            unet_cfg = UNetConfig.tiny(
                cross_attention_dim=emu_cfg.llama.hidden_size)
            vae_cfg = VAEConfig.tiny()
        else:
            emu_cfg = Emu1Config()
            unet_cfg = UNetConfig.emu1_sd15()
            vae_cfg = VAEConfig.sd15()
        return cls(emu1.init(k1, emu_cfg, dtype), emu_cfg,
                   unet.init(k2, unet_cfg, dtype), unet_cfg,
                   vae.init(k3, vae_cfg, dtype), vae_cfg, **kwargs)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        tiny: bool = False,
                        **kwargs) -> "EmuGenerationPipeline":
        """Load from the reference checkpoint directory layout
        (Emu1/models/pipeline.py:236-262): `multimodal_encoder/` holding
        the Emu state dict (pytorch_model.bin / safetensors / sharded
        index) next to diffusers-style `unet/` and `vae/` weight dirs.
        feature_extractor/ and safety_checker/ are accepted and ignored
        (preprocessing is built in; safety_checker defaults to None)."""
        import os

        from emu_tpu import checkpoint as C
        if tiny:
            emu_cfg = Emu1Config.tiny()
            unet_cfg = UNetConfig.tiny(
                cross_attention_dim=emu_cfg.llama.hidden_size)
            vae_cfg = VAEConfig.tiny()
        else:
            emu_cfg = Emu1Config()
            unet_cfg = UNetConfig.emu1_sd15()
            vae_cfg = VAEConfig.sd15()
        emu_params = C.load_emu1_checkpoint(
            os.path.join(path, "multimodal_encoder"), emu_cfg, dtype)
        unet_params = C.convert_unet(
            C.load_state_dict(os.path.join(path, "unet")), unet_cfg, dtype)
        vae_params = C.convert_vae(
            C.load_state_dict(os.path.join(path, "vae")), vae_cfg, dtype)
        return cls(emu_params, emu_cfg, unet_params, unet_cfg,
                   vae_params, vae_cfg, **kwargs)

    def _encode_inputs(self, inputs, do_cfg: bool) -> jax.Array:
        text, images = "", []
        for x in inputs:
            if isinstance(x, str):
                text += x
            else:
                text += T.IMG_PLACEHOLDER
                images.append(preprocess.preprocess_image(
                    x, self.emu_cfg.vision.image_size))
        prompts = [text, ""] if do_cfg else [text]

        image_embeds = None
        if images:
            batch = jnp.asarray(np.stack(images))
            e = emu1.encode_image(self.emu_params, self.emu_cfg, batch)
            image_embeds = e.reshape(-1, e.shape[-1])

        # expand placeholders, append the regression trigger [IMG]
        prompts = [p.replace(T.IMG_PLACEHOLDER, self.image_placeholder)
                   + T.IMG for p in prompts]
        ids, mask = self.tokenizer.encode_batch(prompts, padding_side="left")
        return emu1.generate_image_embeds(
            self.emu_params, self.emu_cfg, jnp.asarray(ids),
            jnp.asarray(mask), image_embeds, self.tokenizer.image_token_id)

    def __call__(self, inputs: List, height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 rng: Optional[jax.Array] = None, cache_interval: int = 1):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0
        prompt_embeds = self._encode_inputs(inputs, do_cfg)  # [2|1, 32, d]

        h = height // self.vae_scale_factor
        w = width // self.vae_scale_factor
        latents = jax.random.normal(
            rng, (1, h, w, self.unet_cfg.in_channels), prompt_embeds.dtype)
        image = _denoise_pndm(
            self.unet_params, self.unet_cfg, self.vae_params, self.vae_cfg,
            self.scheduler_cfg, num_inference_steps, latents, prompt_embeds,
            jnp.float32(guidance_scale), do_cfg, cache_interval)
        image = np.asarray(image)
        nsfw = None
        if self.safety_checker is not None:
            image, nsfw = self.safety_checker(image)
        return _to_pil(image)[0], nsfw


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 9, 10))
def _denoise_pndm(unet_params, unet_cfg, vae_params, vae_cfg, sched_cfg,
                  steps: int, latents, prompt_embeds, guidance_scale,
                  do_cfg: bool, cache_interval: int = 1):
    """cache_interval > 1 enables UNet block caching (see
    visual_generation._denoise_euler — same DeepCache-style trade)."""
    sched = PNDMScheduler(sched_cfg, num_inference_steps=steps)
    state = sched.init_state(latents.shape)
    n_branches = prompt_embeds.shape[0] if do_cfg else 1
    n = sched.num_steps

    def substep(i, carry, cache):
        latents, state = carry
        ic = jnp.minimum(i, n - 1)              # guard group overhang
        inp = jnp.concatenate([latents] * n_branches, 0) if do_cfg else latents
        t = jnp.broadcast_to(sched.timesteps[ic].astype(jnp.float32),
                             (inp.shape[0],))
        eps = unet.forward(unet_params, unet_cfg, inp, t, prompt_embeds,
                           deep_cache=cache,
                           return_cache=cache_interval > 1)
        if cache_interval > 1:
            eps, cache = eps
        if do_cfg:
            cond, uncond = jnp.split(eps, 2, axis=0)
            eps = uncond + guidance_scale * (cond - uncond)
        new = sched.step(eps, ic, latents, state)
        keep = i < n
        carry = jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep, a, b), new, carry)
        return carry, cache

    if cache_interval == 1:
        body = lambda i, carry: substep(i, carry, None)[0]
        latents, _ = jax.lax.fori_loop(0, n, body, (latents, state))
    else:
        def group(g, carry):
            i0 = g * cache_interval
            carry, cache = substep(i0, carry, None)
            for o in range(1, cache_interval):
                carry, _ = substep(i0 + o, carry, cache)
            return carry
        latents, _ = jax.lax.fori_loop(0, -(-n // cache_interval), group,
                                       (latents, state))
    img = vae.decode(vae_params, vae_cfg,
                     latents / jnp.asarray(vae_cfg.scaling_factor,
                                           latents.dtype))
    return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)


def _to_pil(images: np.ndarray):
    from PIL import Image
    images = (images * 255).round().astype("uint8")
    return [Image.fromarray(im) for im in images]
