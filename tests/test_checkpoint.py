"""Checkpoint converter validation against live HF torch models.

The converter's LLaMA/T5 mappings are checked by converting real HF state
dicts and matching logits/hidden states (the same oracles as the parity
tests); UNet/VAE mappings are checked by shape-compatibility with our init
trees (synthetic state dicts with diffusers names).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from emu_tpu import checkpoint as C  # noqa: E402
from emu_tpu.config import T5Config  # noqa: E402
from emu_tpu.models import llama, t5  # noqa: E402
from tests.test_llama_parity import CFG as LLAMA_CFG, _hf_model  # noqa: E402


def test_convert_llama_matches_hf_logits():
    hf = _hf_model()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = C.convert_llama(C._SD(sd), LLAMA_CFG)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, LLAMA_CFG.vocab_size, size=(2, 7))
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    embeds = llama.embed(params, jnp.asarray(ids))
    hidden = llama.forward_hidden(params, LLAMA_CFG, embeds,
                                  jnp.asarray(mask))
    ours = np.asarray(llama.logits(params, hidden))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_convert_t5_decoder_matches_hf():
    from tests.test_t5_parity import _hf_decoder, CFG as T5_CFG
    hf = _hf_decoder()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = C.convert_t5_decoder(C._SD(sd), T5_CFG)
    rng = np.random.default_rng(1)
    tokens = rng.standard_normal((2, 6, T5_CFG.d_model)).astype(np.float32)
    enc = rng.standard_normal((2, 9, T5_CFG.d_model)).astype(np.float32)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(tokens),
                 encoder_hidden_states=torch.tensor(enc),
                 ).last_hidden_state.numpy()
    ours = np.asarray(t5.decoder_forward(params, T5_CFG,
                                         jnp.asarray(tokens),
                                         jnp.asarray(enc)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_convert_unet_shapes_roundtrip():
    """Synthetic diffusers-named state dict converts to a tree with the same
    treedef+shapes as our init (tiny SDXL config)."""
    from emu_tpu.config import UNetConfig
    from emu_tpu.diffusion import unet
    cfg = UNetConfig.tiny(cross_attention_dim=16, sdxl=True)
    target = unet.init(jax.random.PRNGKey(0), cfg)

    sd = _synthesize_diffusers_unet_sd(target, cfg)
    converted = C.convert_unet(sd, cfg)
    t1 = jax.tree_util.tree_structure(target)
    t2 = jax.tree_util.tree_structure(converted)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(target),
                    jax.tree_util.tree_leaves(converted)):
        assert a.shape == b.shape


def _synthesize_diffusers_unet_sd(target, cfg):
    """Invert our param tree into diffusers-style names/layouts."""
    sd = {}

    def put_linear(name, p):
        sd[name + ".weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[name + ".bias"] = np.asarray(p["bias"])

    def put_conv(name, p):
        sd[name + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[name + ".bias"] = np.asarray(p["bias"])

    def put_ln(name, p):
        sd[name + ".weight"] = np.asarray(p["scale"])
        sd[name + ".bias"] = np.asarray(p["bias"])

    def put_resnet(name, p):
        put_ln(name + ".norm1", p["norm1"])
        put_conv(name + ".conv1", p["conv1"])
        put_ln(name + ".norm2", p["norm2"])
        put_conv(name + ".conv2", p["conv2"])
        if "time_emb_proj" in p:
            put_linear(name + ".time_emb_proj", p["time_emb_proj"])
        if "conv_shortcut" in p:
            put_conv(name + ".conv_shortcut", p["conv_shortcut"])

    def put_attnblock(name, p):
        for an in ("attn1", "attn2"):
            for l in ("to_q", "to_k", "to_v"):
                put_linear(f"{name}.{an}.{l}", p[an][l])
            put_linear(f"{name}.{an}.to_out.0", p[an]["to_out"])
        for ln_name in ("norm1", "norm2", "norm3"):
            put_ln(f"{name}.{ln_name}", p[ln_name])
        put_linear(name + ".ff.net.0.proj", p["ff"]["proj_in"])
        put_linear(name + ".ff.net.2", p["ff"]["proj_out"])

    def put_tf2d(name, p):
        put_ln(name + ".norm", p["norm"])
        if cfg.use_linear_projection:
            put_linear(name + ".proj_in", p["proj_in"])
            put_linear(name + ".proj_out", p["proj_out"])
        else:
            put_conv(name + ".proj_in", p["proj_in"])
            put_conv(name + ".proj_out", p["proj_out"])
        for j, blk in enumerate(p["blocks"]):
            put_attnblock(f"{name}.transformer_blocks.{j}", blk)

    put_conv("conv_in", target["conv_in"])
    put_linear("time_embedding.linear_1",
               target["time_embedding"]["linear_1"])
    put_linear("time_embedding.linear_2",
               target["time_embedding"]["linear_2"])
    if "add_embedding" in target:
        put_linear("add_embedding.linear_1",
                   target["add_embedding"]["linear_1"])
        put_linear("add_embedding.linear_2",
                   target["add_embedding"]["linear_2"])
    for i, blk in enumerate(target["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            put_tf2d(f"down_blocks.{i}.attentions.{j}", a)
        if "downsamplers" in blk:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv",
                     blk["downsamplers"])
    for j, r in enumerate(target["mid_block"]["resnets"]):
        put_resnet(f"mid_block.resnets.{j}", r)
    put_tf2d("mid_block.attentions.0", target["mid_block"]["attentions"][0])
    for i, blk in enumerate(target["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            put_tf2d(f"up_blocks.{i}.attentions.{j}", a)
        if "upsamplers" in blk:
            put_conv(f"up_blocks.{i}.upsamplers.0.conv", blk["upsamplers"])
    put_ln("conv_norm_out", target["conv_norm_out"])
    put_conv("conv_out", target["conv_out"])
    return sd


def test_synth_invert_roundtrips_exactly():
    """emu_tpu.synth inverts our trees into reference-named state dicts;
    convert(invert(params)) must round-trip leaf-for-leaf (pins the
    converter layouts for ViT/VAE/composites, which have no live HF
    oracle)."""
    from emu_tpu import synth
    from emu_tpu.config import Emu1Config, Emu2Config, VAEConfig
    from emu_tpu.diffusion import vae
    from emu_tpu.models import emu1, emu2

    def roundtrip(params, sd, convert):
        back = convert(sd)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(back))
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(pa))

    cfg1 = Emu1Config.tiny()
    p1 = emu1.init(jax.random.PRNGKey(0), cfg1)
    roundtrip(p1, synth.invert_emu1(p1, cfg1),
              lambda sd: C.convert_emu1(sd, cfg1))

    cfg2 = Emu2Config.tiny()
    p2 = emu2.init(jax.random.PRNGKey(1), cfg2)
    roundtrip(p2, synth.invert_emu2(p2, cfg2),
              lambda sd: C.convert_emu2(sd, cfg2))

    vcfg = VAEConfig.tiny()
    pv = vae.init(jax.random.PRNGKey(2), vcfg)
    roundtrip(pv, synth.invert_vae(pv, vcfg, {}),
              lambda sd: C.convert_vae(sd, vcfg))


def test_sharded_rehearsal_to_caption(tmp_path):
    """The full checkpoint rehearsal at tiny scale (the bench runs the
    same flow at real Emu-14B shapes): synthesize an HF sharded-index
    state dict on disk, load_emu1_checkpoint from the directory, int8-
    quantize the decoder, caption a synthetic image, and check the
    quantized path tracks the full-precision one."""
    from emu_tpu import synth
    from emu_tpu.config import Emu1Config
    from emu_tpu.generation import GenerationConfig
    from emu_tpu.models import emu1
    from emu_tpu.ops.quant import quantize_tree

    cfg = Emu1Config.tiny()
    params0 = emu1.init(jax.random.PRNGKey(0), cfg)
    sd = synth.invert_emu1(params0, cfg)
    index = synth.save_sharded(sd, str(tmp_path / "ckpt"),
                               max_shard_bytes=200_000, dtype=np.float32)
    assert index.endswith("pytorch_model.bin.index.json")
    import glob
    assert len(glob.glob(str(tmp_path / "ckpt" / "*.bin"))) > 1, \
        "rehearsal should exercise a genuinely sharded layout"

    params = C.load_emu1_checkpoint(str(tmp_path / "ckpt"), cfg,
                                    dtype=jnp.float32)
    params = dict(params, decoder=quantize_tree(params["decoder"]))

    img = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.float32)
    tok_img = cfg.llama.vocab_size + 3          # tiny <image> slot id
    ids = np.full((1, 4 + cfg.n_causal), 7, np.int32)
    ids[:, 2:2 + cfg.n_causal] = tok_img
    mask = jnp.ones_like(jnp.asarray(ids))
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                            pad_token_id=0)
    vis = emu1.encode_image(params, cfg, img)
    out = emu1.generate(params, cfg, jnp.asarray(ids), mask,
                        vis.reshape(-1, vis.shape[-1]), gcfg, tok_img)
    assert out.shape == (1, 4)
    # the from-disk load is lossless: quantized decode from the loaded
    # params equals quantizing the in-memory params directly
    params_mem = dict(params0, decoder=quantize_tree(params0["decoder"]))
    vis0 = emu1.encode_image(params_mem, cfg, img)
    out0 = emu1.generate(params_mem, cfg, jnp.asarray(ids), mask,
                         vis0.reshape(-1, vis0.shape[-1]), gcfg, tok_img)
    assert np.array_equal(np.asarray(out), np.asarray(out0))


def test_orbax_native_roundtrip(tmp_path):
    from emu_tpu.checkpoint import restore_params, save_params
    from emu_tpu.models import llama
    from emu_tpu.config import LlamaConfig
    cfg = LlamaConfig(hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      vocab_size=64, extended_vocab_size=64)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = restore_params(path, like=params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # sharded restore onto a mesh
    from emu_tpu.parallel import make_mesh
    mesh = make_mesh((2, 4))
    sharded = restore_params(path, like=params, mesh=mesh,
                             rules=llama.sharding_rules)
    from emu_tpu.models.llama import forward_hidden
    ids = np.array([[5, 9, 3]], np.int32)
    h1 = forward_hidden(params, cfg, llama.embed(params, jnp.asarray(ids)),
                        jnp.ones_like(ids))
    h2 = forward_hidden(sharded, cfg, llama.embed(sharded, jnp.asarray(ids)),
                        jnp.ones_like(ids))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5,
                               atol=1e-5)


def test_sharded_index_loading(tmp_path):
    """HF-style sharded checkpoint: *.index.json + shard .bin files."""
    import json
    import torch as _torch
    sd1 = {"a.weight": _torch.ones(3), "b.weight": _torch.zeros(2)}
    sd2 = {"c.weight": _torch.full((2, 2), 7.0)}
    _torch.save(sd1, tmp_path / "model-00001.bin")
    _torch.save(sd2, tmp_path / "model-00002.bin")
    index = {"weight_map": {"a.weight": "model-00001.bin",
                            "b.weight": "model-00001.bin",
                            "c.weight": "model-00002.bin"}}
    with open(tmp_path / "pytorch_model.bin.index.json", "w") as f:
        json.dump(index, f)
    sd = C.load_state_dict(str(tmp_path))
    assert set(sd) == {"a.weight", "b.weight", "c.weight"}
    np.testing.assert_array_equal(sd["c.weight"], np.full((2, 2), 7.0))


def test_diffusers_dir_blob_loading(tmp_path):
    import torch as _torch
    sd = {"x.weight": _torch.ones(2)}
    # single .bin → loads
    d1 = tmp_path / "unet_bin"
    d1.mkdir()
    _torch.save(sd, d1 / "diffusion_pytorch_model.bin")
    assert set(C.load_state_dict(str(d1))) == {"x.weight"}
    # both formats present → safetensors preferred
    from safetensors.numpy import save_file
    save_file({"y.weight": np.zeros(3, np.float32)},
              str(d1 / "diffusion_pytorch_model.safetensors"))
    assert set(C.load_state_dict(str(d1))) == {"y.weight"}
    # two ambiguous safetensors blobs → explicit error
    save_file({"z.weight": np.zeros(1, np.float32)},
              str(d1 / "another.safetensors"))
    with pytest.raises(ValueError):
        C.load_state_dict(str(d1))
    # empty dir → FileNotFoundError
    d2 = tmp_path / "empty"
    d2.mkdir()
    with pytest.raises(FileNotFoundError):
        C.load_state_dict(str(d2))
