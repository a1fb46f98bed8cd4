"""Emu1 text-side demo CLI (ref Emu1/inference.py): captioning, VQA,
interleaved-context QA and video QA with the reference's system prompts
and [USER]/[ASSISTANT] chat template.

Usage:
  python -m emu_tpu.cli.inference --ckpt-path ... --tokenizer-path ... \
      --image examples/dog.png [--instruct]
Without --ckpt-path it runs the tiny random-weight smoke configuration.
"""

from __future__ import annotations

import argparse

import numpy as np

from emu_tpu import tokenization as T
from emu_tpu.config import Emu1Config
from emu_tpu.generation import GenerationConfig
from emu_tpu.models import emu1
from emu_tpu.pipelines import preprocess

# canonical prompt constants live with the eval engine; the CLI and eval
# must stay in lock-step on prompt format
from emu_tpu.mm_eval.engine import (  # noqa: E402
    image_placeholder,
    image_system_msg,
)

video_system_msg = (
    "You are a helpful assistant and you will be presented with a video "
    "consisting of multiple chronological images: [IMG]ImageContent[/IMG]. "
    "You will be able to see the video after I provide it to you. "
    "Please answer my questions based on the given video.")


class Emu1Runner:
    def __init__(self, params, cfg: Emu1Config, tokenizer: T.EmuTokenizer):
        if "q_proj" in params["decoder"]["layers"]["self_attn"]:
            from emu_tpu.models import llama
            # fused qkv/gate_up decode layout — exact, fewer launches
            params = dict(params,
                          decoder=llama.fuse_projections(params["decoder"]))
        self.params, self.cfg, self.tokenizer = params, cfg, tokenizer
        self.placeholder = ("[IMG]" + "<image>" * cfg.n_causal + "[/IMG]")

    def generate(self, images, text_sequence: str, system: str = "",
                 instruct: bool = True, max_new_tokens: int = 128,
                 beam_size: int = 5, length_penalty: float = 0.0) -> str:
        import jax.numpy as jnp
        prompt = (f"{system} [USER]: {text_sequence} [ASSISTANT]:".strip()
                  if instruct else text_sequence)
        ids, mask = self.tokenizer.encode_batch([prompt],
                                                padding_side="left")
        image_embeds = None
        if images:
            batch = jnp.asarray(np.stack([
                preprocess.preprocess_image(im, self.cfg.vision.image_size)
                for im in images]))
            e = emu1.encode_image(self.params, self.cfg, batch)
            image_embeds = e.reshape(-1, e.shape[-1])
        gcfg = GenerationConfig(
            max_new_tokens=max_new_tokens, num_beams=beam_size,
            length_penalty=length_penalty,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id)
        out = emu1.generate(self.params, self.cfg, jnp.asarray(ids),
                            jnp.asarray(mask), image_embeds, gcfg,
                            self.tokenizer.image_token_id)
        return self.tokenizer.batch_decode(np.asarray(out))[0].strip()

    # -- the four reference demo flows (inference.py) -----------------------

    def caption(self, image) -> str:
        prompt = (f"{self.placeholder}Please provide an accurate and "
                  "concise description of the given image. "
                  "[ASSISTANT]: The image depicts a photo of")
        return self.generate([image],
                             prompt.replace(" [ASSISTANT]:", ""),
                             system=image_system_msg, max_new_tokens=512)

    def vqa(self, image, question: str) -> str:
        text = (f"{self.placeholder}{question}")
        return self.generate([image], text, system=image_system_msg,
                             max_new_tokens=64)

    def interleaved(self, images, text_with_placeholders: str) -> str:
        text = text_with_placeholders.replace("[<IMG_PLH>]",
                                              self.placeholder)
        return self.generate(images, text, system="", max_new_tokens=128)

    def video_qa(self, frames, question: str) -> str:
        # each frame becomes a full image placeholder (ref utils.py:33-44)
        text = self.placeholder * len(frames) + question
        return self.generate(frames, text, system=video_system_msg,
                             max_new_tokens=64)


def build_runner(ckpt_path=None, tokenizer_path=None, instruct=False,
                 tiny=False):
    import jax
    import jax.numpy as jnp
    if tiny or ckpt_path is None:
        import dataclasses
        base = Emu1Config.tiny()
        cfg = Emu1Config(
            vision=base.vision, t5=base.t5, n_causal=32, instruct=True,
            llama=dataclasses.replace(base.llama, extended_vocab_size=262))
        params = emu1.init(jax.random.PRNGKey(0), cfg)
        tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                             T.emu1_special_tokens(True),
                             base_vocab=cfg.llama.vocab_size)
        return Emu1Runner(params, cfg, tok)
    cfg = Emu1Config(instruct=instruct)
    from emu_tpu.checkpoint import load_emu1_checkpoint
    params = load_emu1_checkpoint(ckpt_path, cfg, jnp.bfloat16)
    tok = T.EmuTokenizer.emu1(tokenizer_path, instruct=instruct)
    return Emu1Runner(params, cfg, tok)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--instruct", action="store_true")
    p.add_argument("--ckpt-path", default=None)
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--image", default=None, help="image for captioning/VQA")
    p.add_argument("--question", default=None)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    runner = build_runner(args.ckpt_path, args.tokenizer_path,
                          args.instruct, args.tiny)
    from PIL import Image
    if args.image:
        img = Image.open(args.image).convert("RGB")
    else:
        img = Image.fromarray(np.full((224, 224, 3), 128, "uint8"))
        print("(no --image given; using a gray test image)")
    if args.question:
        print("===> vqa:", runner.vqa(img, args.question))
    else:
        print("===> caption:", runner.caption(img))


if __name__ == "__main__":
    main()
