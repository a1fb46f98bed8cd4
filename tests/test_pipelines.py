"""Pipeline-level tests: tokenizer semantics + tiny end-to-end flows.

These drive the public pipeline APIs exactly the way the reference's README
snippets drive EmuChatGeneration / EmuVisualGeneration /
EmuGenerationPipeline — on tiny random-weight configs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emu_tpu import tokenization as T
from emu_tpu.config import Emu1Config, Emu2Config


def _tiny_tokenizer(variant: str):
    cfg = Emu1Config.tiny() if variant == "emu1" else Emu2Config.tiny()
    specials = (T.emu1_special_tokens() if variant == "emu1"
                else T.emu2_special_tokens())
    return T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size), specials,
                          base_vocab=cfg.llama.vocab_size)


def test_special_token_id_assignment():
    tok = T.EmuTokenizer.emu1()
    assert tok.pad_token_id == 32000
    assert tok.img_token_id == 32001          # ref modeling_llama: [IMG]
    assert tok.img_end_token_id == 32002
    assert tok.image_token_id == 32003        # ref comment "# 32003"
    tok2 = T.EmuTokenizer.emu2(instruct=True)
    assert tok2.image_token_id == 32003
    assert tok2.token_to_id("<grounding>") == 32008
    assert tok2.token_to_id("<patch_index_0000>") == 32015
    assert tok2.token_to_id("<patch_index_0256>") == 32271
    assert tok2.token_to_id(T.USER) == 32272
    assert tok2.token_to_id(T.ASSISTANT) == 32273
    assert tok2.vocab_size == 32274


def test_tokenizer_placeholder_expansion_roundtrip():
    tok = _tiny_tokenizer("emu1")
    text = "a cat [IMG]" + "<image>" * 4 + "[/IMG] sitting"
    ids = tok.encode(text)
    image_positions = [i for i, t in enumerate(ids)
                       if t == tok.image_token_id]
    assert len(image_positions) == 4
    # contiguous run between [IMG] and [/IMG]
    assert ids[image_positions[0] - 1] == tok.img_token_id
    assert ids[image_positions[-1] + 1] == tok.img_end_token_id


def test_left_padding_batch():
    tok = _tiny_tokenizer("emu2")
    ids, mask = tok.encode_batch(["short", "a much longer prompt here"],
                                 padding_side="left")
    assert ids.shape == mask.shape
    assert mask[0, 0] == 0 and mask[0, -1] == 1
    assert (ids[0][mask[0] == 0] == tok.pad_token_id).all()


def test_chat_pipeline_end_to_end():
    from PIL import Image
    from emu_tpu.models import emu2
    from emu_tpu.pipelines.chat import EmuChatGeneration
    import jax
    cfg = Emu2Config.tiny()
    params = emu2.init(jax.random.PRNGKey(0), cfg)
    pipe = EmuChatGeneration(params, cfg, tokenizer=_tiny_tokenizer("emu2"))
    img = Image.fromarray(
        (np.random.default_rng(0).random((64, 64, 3)) * 255).astype("uint8"))
    out = pipe([img, "describe this image"], num_beams=2, max_new_tokens=4)
    assert isinstance(out, str)

    # chat format with role alternation
    out = pipe([[img, "what is this?"]], num_beams=1, max_new_tokens=3)
    assert isinstance(out, str)


def test_visual_generation_pipeline_end_to_end():
    from PIL import Image
    from emu_tpu.pipelines.visual_generation import EmuVisualGeneration
    pipe = EmuVisualGeneration.from_config(tiny=True, dtype=jnp.float32)
    pipe.tokenizer = _tiny_tokenizer("emu2")
    out = pipe("a photo of a cat", num_inference_steps=3, height=32,
               width=32)
    assert out.image.size == (32, 32)
    # autoencoding mode: single image, no text; negative cached
    img = Image.fromarray(np.zeros((56, 56, 3), "uint8"))
    out2 = pipe(img, num_inference_steps=2, height=32, width=32)
    assert "[NULL_IMAGE]" in pipe.negative_prompt
    assert out2.image.size == (32, 32)
    # generation-mode negative cached after text call
    assert "" in pipe.negative_prompt


def test_emu1_generation_pipeline_end_to_end():
    from PIL import Image
    from emu_tpu.pipelines.emu1_pipeline import EmuGenerationPipeline
    pipe = EmuGenerationPipeline.from_config(tiny=True, dtype=jnp.float32)
    pipe.tokenizer = _tiny_tokenizer("emu1")
    img = Image.fromarray(np.zeros((40, 40, 3), "uint8"))
    out, nsfw = pipe([img, "a dog"], height=32, width=32,
                     num_inference_steps=3, guidance_scale=7.5)
    assert out.size == (32, 32)
    assert nsfw is None


def test_emu1_pipeline_from_pretrained_dir(tmp_path):
    """Reference checkpoint-directory layout (Emu1/models/pipeline.py:
    236-262): multimodal_encoder/pytorch_model.bin + diffusers unet/ +
    vae/ dirs → working pipeline."""
    import torch
    from PIL import Image
    from safetensors.numpy import save_file

    from emu_tpu import synth
    from emu_tpu.config import Emu1Config, UNetConfig, VAEConfig
    from emu_tpu.diffusion import unet, vae
    from emu_tpu.models import emu1
    from emu_tpu.pipelines.emu1_pipeline import EmuGenerationPipeline

    cfg = Emu1Config.tiny()
    fill = synth.random_fill(0)
    shapes = jax.eval_shape(
        lambda: emu1.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    emu_sd = synth.invert_emu1(
        synth.materialize(shapes, fill, np.float32), cfg)
    mdir = tmp_path / "multimodal_encoder"
    mdir.mkdir()
    torch.save({k: torch.from_numpy(np.require(v, requirements=["C", "W"]))
                for k, v in emu_sd.items()}, mdir / "pytorch_model.bin")

    ucfg = UNetConfig.tiny(cross_attention_dim=cfg.llama.hidden_size)
    u_sd = synth.invert_unet(
        synth.materialize(jax.eval_shape(
            lambda: unet.init(jax.random.PRNGKey(1), ucfg)), fill,
            np.float32), ucfg, {})
    (tmp_path / "unet").mkdir()
    save_file(u_sd, str(tmp_path / "unet"
                        / "diffusion_pytorch_model.safetensors"))

    vcfg = VAEConfig.tiny()
    v_sd = synth.invert_vae(
        synth.materialize(jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(2), vcfg)), fill,
            np.float32), vcfg, {})
    (tmp_path / "vae").mkdir()
    save_file(v_sd, str(tmp_path / "vae"
                        / "diffusion_pytorch_model.safetensors"))

    pipe = EmuGenerationPipeline.from_pretrained(str(tmp_path), tiny=True,
                                                 dtype=jnp.float32)
    pipe.tokenizer = _tiny_tokenizer("emu1")
    img = Image.fromarray(np.zeros((40, 40, 3), "uint8"))
    out, nsfw = pipe([img, "a dog"], height=32, width=32,
                     num_inference_steps=2)
    assert out.size == (32, 32)


def test_visual_generation_from_pretrained_file(tmp_path):
    """Reference single-state-dict layout (Emu2/emu/diffusion.py:250-267):
    one safetensors blob with multimodal_encoder./unet./vae. prefixes →
    working pipeline (incl. autoencode mode)."""
    from PIL import Image
    from safetensors.numpy import save_file

    from emu_tpu import synth
    from emu_tpu.config import Emu2Config, UNetConfig, VAEConfig
    from emu_tpu.diffusion import unet, vae
    from emu_tpu.models import emu2
    from emu_tpu.pipelines.visual_generation import EmuVisualGeneration

    cfg = Emu2Config.tiny()
    fill = synth.random_fill(1)
    sd = synth.invert_emu2(
        synth.materialize(jax.eval_shape(
            lambda: emu2.init(jax.random.PRNGKey(0), cfg,
                              dtype=jnp.float32)), fill, np.float32), cfg)
    sd = {"multimodal_encoder." + k: v for k, v in sd.items()}
    ucfg = UNetConfig.tiny(cross_attention_dim=cfg.vision.width, sdxl=True)
    synth.invert_unet(
        synth.materialize(jax.eval_shape(
            lambda: unet.init(jax.random.PRNGKey(1), ucfg)), fill,
            np.float32), ucfg, sd, prefix="unet.")
    vcfg = VAEConfig.tiny()
    synth.invert_vae(
        synth.materialize(jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(2), vcfg)), fill,
            np.float32), vcfg, sd, prefix="vae.")
    path = str(tmp_path / "emu2_gen.safetensors")
    save_file(sd, path)

    pipe = EmuVisualGeneration.from_pretrained(path, tiny=True,
                                               dtype=jnp.float32)
    pipe.tokenizer = _tiny_tokenizer("emu2")
    img = Image.fromarray(np.zeros((56, 56, 3), "uint8"))
    out = pipe(img, num_inference_steps=2, height=32, width=32)
    assert out.image.size == (32, 32)


def test_visual_generation_multimodal_conditioning():
    """Generation mode WITH a context image (in-context generation path:
    prompt image embeds + regression, ref diffusion.py:204-210)."""
    from PIL import Image
    from emu_tpu.pipelines.visual_generation import EmuVisualGeneration
    pipe = EmuVisualGeneration.from_config(tiny=True, dtype=jnp.float32)
    pipe.tokenizer = _tiny_tokenizer("emu2")
    img = Image.fromarray(np.full((56, 56, 3), 40, "uint8"))
    out = pipe(["style of", img, "a beach"], num_inference_steps=2,
               height=32, width=32)
    assert out.image.size == (32, 32)


def test_emu2_37b_fits_v5e8_when_quantized():
    """Static deployment math: Emu2-37B per-chip memory under TP8.

    bf16 does NOT fit a single 16GB chip (the reference needed 2x38GiB
    GPUs); int8 weight-only + TP8 leaves ample room for KV cache and
    activations."""
    from emu_tpu.config import Emu2Config
    cfg = Emu2Config()
    v = cfg.vision
    lm = cfg.llama
    vit_params = (v.layers * (3 * v.width * v.num_heads * v.head_width
                              + v.num_heads * v.head_width * v.width
                              + 2 * v.width * v.mlp_hidden)
                  + 3 * v.patch_size ** 2 * v.width)
    lm_params = (lm.num_hidden_layers
                 * (4 * lm.hidden_size ** 2
                    + 3 * lm.hidden_size * lm.intermediate_size)
                 + 2 * lm.extended_vocab_size * lm.hidden_size)
    total = vit_params + lm_params
    assert 34e9 < total < 40e9                    # ≈37B ✓

    HBM = 16e9
    assert total * 2 > HBM                        # bf16 single chip: no
    # int8 LM + bf16 ViT, both TP8 (our sharding rules shard both stacks)
    per_chip = lm_params / 8 + vit_params * 2 / 8
    assert per_chip < 0.4 * HBM                   # ample headroom
    # KV cache at batch 8, 2048 ctx, heads sharded 8-way:
    kv = (lm.num_hidden_layers * 8 * 2048
          * lm.num_attention_heads * lm.head_dim * 2 * 2) / 8
    assert per_chip + kv < 0.6 * HBM


def test_pipelines_block_cache_interval():
    """cache_interval > 1 (UNet block caching) runs both pipelines'
    grouped denoise loops end-to-end, including a steps % interval != 0
    overhang, and produces finite images of the right size."""
    from PIL import Image
    from emu_tpu.pipelines.emu1_pipeline import EmuGenerationPipeline
    from emu_tpu.pipelines.visual_generation import EmuVisualGeneration

    pipe = EmuVisualGeneration.from_config(tiny=True, dtype=jnp.float32)
    pipe.tokenizer = _tiny_tokenizer("emu2")
    out = pipe("a photo of a cat", num_inference_steps=3, height=32,
               width=32, cache_interval=2)        # 3 steps → 2 groups
    assert out.image.size == (32, 32)

    pipe1 = EmuGenerationPipeline.from_config(tiny=True, dtype=jnp.float32)
    pipe1.tokenizer = _tiny_tokenizer("emu1")
    img = Image.fromarray(np.zeros((40, 40, 3), "uint8"))
    out1, _ = pipe1([img, "a dog"], height=32, width=32,
                    num_inference_steps=4, guidance_scale=7.5,
                    cache_interval=3)
    assert out1.size == (32, 32)
    assert np.asarray(out1).shape == (32, 32, 3)
