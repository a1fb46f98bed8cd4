"""Emu1 image-generation demo CLI (ref Emu1/image_inference.py): image
blending, text-to-image and in-context generation at 512², guidance
7.5–10, via EmuGenerationPipeline.

Usage:
  python -m emu_tpu.cli.image_inference --ckpt-dir ... --prompt "..."
  python -m emu_tpu.cli.image_inference --tiny --prompt "a cat"  # smoke
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", default=None,
                   help="dir with multimodal_encoder/unet/vae weights")
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--prompt", default="impressionist painting of an "
                                       "astronaut in a jungle")
    p.add_argument("--image", action="append", default=[],
                   help="context image(s) for blending / in-context gen")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--output", default="generated.png")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax.numpy as jnp
    from emu_tpu.pipelines.emu1_pipeline import EmuGenerationPipeline

    if args.tiny or args.ckpt_dir is None:
        from emu_tpu import tokenization as T
        from emu_tpu.config import Emu1Config
        pipe = EmuGenerationPipeline.from_config(tiny=True,
                                                 dtype=jnp.float32)
        cfg = Emu1Config.tiny()
        pipe.tokenizer = T.EmuTokenizer(
            T.SimpleTokenizer(cfg.llama.vocab_size),
            T.emu1_special_tokens(), base_vocab=cfg.llama.vocab_size)
        if args.height > 64:
            args.height = args.width = 32
            args.steps = min(args.steps, 4)
        print("(tiny smoke mode: random weights, "
              f"{args.height}x{args.width}, {args.steps} steps)")
    else:
        import os
        from emu_tpu import checkpoint as C
        from emu_tpu import tokenization as T
        from emu_tpu.config import (Emu1Config, UNetConfig, VAEConfig)
        emu_cfg = Emu1Config()
        unet_cfg = UNetConfig.emu1_sd15()
        vae_cfg = VAEConfig.sd15()
        emu_params = C.load_emu1_checkpoint(
            os.path.join(args.ckpt_dir,
                         "multimodal_encoder/pytorch_model.bin"), emu_cfg)
        unet_params = C.convert_unet(C.load_state_dict(
            os.path.join(args.ckpt_dir, "unet/diffusion_pytorch_model.bin")),
            unet_cfg, jnp.bfloat16)
        vae_params = C.convert_vae(C.load_state_dict(
            os.path.join(args.ckpt_dir, "vae/diffusion_pytorch_model.bin")),
            vae_cfg, jnp.bfloat16)
        pipe = EmuGenerationPipeline(
            emu_params, emu_cfg, unet_params, unet_cfg, vae_params, vae_cfg,
            tokenizer=T.EmuTokenizer.emu1(args.tokenizer_path))

    from PIL import Image
    inputs = []
    for path in args.image:
        inputs.append(Image.open(path).convert("RGB"))
    inputs.append(args.prompt)

    image, nsfw = pipe(inputs, height=args.height, width=args.width,
                       num_inference_steps=args.steps,
                       guidance_scale=args.guidance)
    image.save(args.output)
    print(f"saved {args.output} (nsfw={nsfw})")


if __name__ == "__main__":
    main()
