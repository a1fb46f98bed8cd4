"""Checkpoint conversion: reference torch/safetensors weights → our pytrees.

Replaces the reference's load paths (survey §5 "Checkpoint / resume"):
`torch.load` + optional `ckpt['module']` unwrap (Emu1/inference.py:54-57),
strict state-dict load (Emu2/emu/chat.py:197-213), safetensors
(Emu2/emu/diffusion.py:262-267). Name mapping covers `visual.* /
ln_visual.* / cformer.* / decoder.lm.* / project_up / project_down` and
the diffusers `unet.* / vae.*` trees.

Layout conventions converted here:
- torch nn.Linear weight [out, in] → our dense kernel [in, out] (transpose);
- torch Conv2d [O, I, kh, kw] → HWIO [kh, kw, I, O];
- patch-embed conv [w, 3, p, p] → patchify-matmul kernel [(p p 3), w] in
  (h, w, c) pixel order;
- per-layer torch modules → stacked [L, ...] tensors (lax.scan layout).

Sharded restore: pass `mesh` + rules to place each converted tensor
directly onto the TPU mesh (no host-side full-model copy beyond one
tensor at a time).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emu_tpu.config import (Emu1Config, Emu2Config, LlamaConfig, T5Config,
                            UNetConfig, VAEConfig, VisionConfig)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load torch .bin/.pt (with optional 'module' wrapper), .safetensors,
    or an HF sharded checkpoint (directory with *.index.json, as in the
    reference's hf_model demo backend / Emu2 conf) into numpy arrays."""
    import os
    if os.path.isdir(path):
        import glob
        import json as _json
        # HF dual-format repos may carry both .safetensors and .bin
        # (index or blob); prefer safetensors deterministically.
        indexes = sorted(glob.glob(os.path.join(path, "*.index.json")),
                         key=lambda p: (".safetensors" not in p, p))
        if indexes:
            with open(indexes[0]) as f:
                weight_map = _json.load(f)["weight_map"]
            out: Dict[str, np.ndarray] = {}
            for shard in sorted(set(weight_map.values())):
                out.update(load_state_dict(os.path.join(path, shard)))
            return out
        # diffusers-style component dir: one weights blob per format
        for pattern in ("*.safetensors", "*.bin"):
            blobs = sorted(glob.glob(os.path.join(path, pattern)))
            if len(blobs) == 1:
                return load_state_dict(blobs[0])
            if len(blobs) > 1:
                raise ValueError(
                    f"{path}: ambiguous weights blobs {sorted(os.path.basename(b) for b in blobs)}; "
                    "pass the file path explicitly")
        raise FileNotFoundError(
            f"{path}: no *.index.json or weights blob found")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if "module" in ckpt and isinstance(ckpt["module"], dict):
        ckpt = ckpt["module"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16
            else v.numpy() for k, v in ckpt.items()}


class _SD:
    """Prefixed view over a flat state dict with conversion helpers."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = "",
                 dtype=jnp.float32):
        self.sd, self.prefix, self.dtype = sd, prefix, dtype

    def sub(self, p: str) -> "_SD":
        return _SD(self.sd, self.prefix + p + ".", self.dtype)

    def has(self, name: str) -> bool:
        return self.prefix + name in self.sd

    def raw(self, name: str) -> jnp.ndarray:
        return jnp.asarray(self.sd[self.prefix + name], self.dtype)

    def linear(self, name: str, bias: bool = True) -> dict:
        p = {"kernel": jnp.asarray(self.sd[self.prefix + name + ".weight"].T,
                                   self.dtype)}
        if bias and self.has(name + ".bias"):
            p["bias"] = self.raw(name + ".bias")
        return p

    def conv(self, name: str) -> dict:
        w = self.sd[self.prefix + name + ".weight"]
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), self.dtype),
                "bias": self.raw(name + ".bias")}

    def ln(self, name: str) -> dict:
        return {"scale": self.raw(name + ".weight"),
                "bias": self.raw(name + ".bias")}

    def stack(self, n: int, fn: Callable[["_SD"], dict], fmt: str) -> dict:
        trees = [fn(self.sub(fmt.format(i))) for i in range(n)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


# ---------------------------------------------------------------------------
# Model-family converters
# ---------------------------------------------------------------------------


def convert_vit(sd: _SD, cfg: VisionConfig) -> dict:
    w = sd.sd[sd.prefix + "patch_embed.proj.weight"]   # [w, 3, p, p]
    p_sz = cfg.patch_size
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(
                w.transpose(2, 3, 1, 0).reshape(p_sz * p_sz * 3, -1),
                sd.dtype),
            "bias": sd.raw("patch_embed.proj.bias"),
        },
        "cls_token": sd.raw("cls_token"),
    }
    if sd.has("pos_embed"):
        params["pos_embed"] = sd.raw("pos_embed")
    if sd.has("rel_pos_bias.relative_position_bias_table"):
        params["rel_pos_bias"] = sd.raw(
            "rel_pos_bias.relative_position_bias_table")

    def block(b: _SD) -> dict:
        p = {
            "norm1": b.ln("norm1"),
            "norm2": b.ln("norm2"),
            "attn": {
                "qkv": {"kernel": jnp.asarray(
                    b.sd[b.prefix + "attn.qkv.weight"].T, b.dtype)},
                "q_bias": b.raw("attn.q_bias"),
                "v_bias": b.raw("attn.v_bias"),
                "proj": b.linear("attn.proj"),
            },
        }
        if b.has("attn.inner_attn_ln.weight"):
            p["attn"]["inner_ln"] = b.ln("attn.inner_attn_ln")
        if b.has("mlp.w1.weight"):
            p["mlp"] = {"w1": b.linear("mlp.w1"), "w2": b.linear("mlp.w2"),
                        "w3": b.linear("mlp.w3")}
            if b.has("mlp.ffn_ln.weight"):
                p["mlp"]["ffn_ln"] = b.ln("mlp.ffn_ln")
        else:
            p["mlp"] = {"fc1": b.linear("mlp.fc1"),
                        "fc2": b.linear("mlp.fc2")}
        if b.has("gamma_1"):
            p["gamma_1"] = b.raw("gamma_1")
            p["gamma_2"] = b.raw("gamma_2")
        return p

    params["blocks"] = sd.stack(cfg.layers, block, "blocks.{}")
    if sd.has("norm.weight"):
        params["norm"] = sd.ln("norm")
        params["head"] = sd.linear("head")
    return params


def convert_llama(sd: _SD, cfg: LlamaConfig,
                  regress_head: bool = False) -> dict:
    """`sd` prefixed at the HF LlamaForCausalLM root (e.g. `decoder.lm.`)."""

    def layer(l: _SD) -> dict:
        return {
            "input_layernorm": l.raw("input_layernorm.weight"),
            "post_attention_layernorm": l.raw(
                "post_attention_layernorm.weight"),
            "self_attn": {f"{n}_proj": l.linear(f"self_attn.{n}_proj",
                                                bias=False)
                          for n in ("q", "k", "v", "o")},
            "mlp": {"gate": l.linear("mlp.gate_proj", bias=False),
                    "up": l.linear("mlp.up_proj", bias=False),
                    "down": l.linear("mlp.down_proj", bias=False)},
        }

    params = {
        "embed_tokens": sd.raw("model.embed_tokens.weight"),
        "layers": sd.sub("model").stack(cfg.num_hidden_layers, layer,
                                        "layers.{}"),
        "norm": sd.raw("model.norm.weight"),
        "lm_head": sd.linear("lm_head", bias=False),
    }
    if regress_head and sd.has("stu_regress_head.weight"):
        params["stu_regress_head"] = sd.linear("stu_regress_head",
                                               bias=False)
    return params


def convert_t5_decoder(sd: _SD, cfg: T5Config) -> dict:
    """`sd` prefixed at the T5 decoder stack root (`cformer.cformer.`)."""

    def block(b: _SD) -> dict:
        def attn(idx, name):
            a = b.sub(f"layer.{idx}")
            return {
                "ln": a.raw("layer_norm.weight"),
                "q": a.linear(f"{name}.q", bias=False),
                "k": a.linear(f"{name}.k", bias=False),
                "v": a.linear(f"{name}.v", bias=False),
                "o": a.linear(f"{name}.o", bias=False),
            }
        ff = b.sub("layer.2")
        return {
            "self_attn": attn(0, "SelfAttention"),
            "cross_attn": attn(1, "EncDecAttention"),
            "ff": {"ln": ff.raw("layer_norm.weight"),
                   "wi": ff.linear("DenseReluDense.wi", bias=False),
                   "wo": ff.linear("DenseReluDense.wo", bias=False)},
        }

    return {
        "layers": sd.stack(cfg.num_layers, block, "block.{}"),
        "rel_bias": sd.raw(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight"),
        "final_ln": sd.raw("final_layer_norm.weight"),
    }


def convert_emu1(sd_flat: Dict[str, np.ndarray], cfg: Emu1Config,
                 dtype=jnp.float32) -> dict:
    sd = _SD(sd_flat, dtype=dtype)
    return {
        "visual": convert_vit(sd.sub("visual"), cfg.vision),
        "ln_visual": sd.ln("ln_visual"),
        "cformer": {
            "cformer": convert_t5_decoder(sd.sub("cformer.cformer"), cfg.t5),
            "causal_tokens": sd.raw("cformer.causal_tokens"),
            "projection": sd.linear("cformer.projection"),
        },
        "decoder": convert_llama(sd.sub("decoder.lm"), cfg.llama,
                                 regress_head=True),
    }


def convert_emu2(sd_flat: Dict[str, np.ndarray], cfg: Emu2Config,
                 dtype=jnp.float32) -> dict:
    sd = _SD(sd_flat, dtype=dtype)
    return {
        "visual": convert_vit(sd.sub("visual"), cfg.vision),
        "decoder": convert_llama(sd.sub("decoder.lm"), cfg.llama),
        "project_up": sd.linear("project_up", bias=False),
        "project_down": sd.linear("project_down", bias=False),
    }


# ---------------------------------------------------------------------------
# Diffusers UNet / VAE
# ---------------------------------------------------------------------------


def _tf2d(a: _SD, n_layers: int, use_linear: bool) -> dict:
    def tfb(t: _SD) -> dict:
        return {
            "norm1": t.ln("norm1"), "norm2": t.ln("norm2"),
            "norm3": t.ln("norm3"),
            "attn1": {"to_q": t.linear("attn1.to_q", bias=False),
                      "to_k": t.linear("attn1.to_k", bias=False),
                      "to_v": t.linear("attn1.to_v", bias=False),
                      "to_out": t.linear("attn1.to_out.0")},
            "attn2": {"to_q": t.linear("attn2.to_q", bias=False),
                      "to_k": t.linear("attn2.to_k", bias=False),
                      "to_v": t.linear("attn2.to_v", bias=False),
                      "to_out": t.linear("attn2.to_out.0")},
            "ff": {"proj_in": t.linear("ff.net.0.proj"),
                   "proj_out": t.linear("ff.net.2")},
        }

    p = {"norm": a.ln("norm"),
         "blocks": [tfb(a.sub(f"transformer_blocks.{j}"))
                    for j in range(n_layers)]}
    if use_linear:
        p["proj_in"] = a.linear("proj_in")
        p["proj_out"] = a.linear("proj_out")
    else:
        p["proj_in"] = a.conv("proj_in")
        p["proj_out"] = a.conv("proj_out")
    return p


def _resnet(r: _SD) -> dict:
    p = {"norm1": r.ln("norm1"), "conv1": r.conv("conv1"),
         "norm2": r.ln("norm2"), "conv2": r.conv("conv2")}
    if r.has("time_emb_proj.weight"):
        p["time_emb_proj"] = r.linear("time_emb_proj")
    if r.has("conv_shortcut.weight"):
        p["conv_shortcut"] = r.conv("conv_shortcut")
    return p


def convert_unet(sd_flat: Dict[str, np.ndarray], cfg: UNetConfig,
                 dtype=jnp.float32) -> dict:
    sd = _SD(sd_flat, dtype=dtype)
    params = {
        "conv_in": sd.conv("conv_in"),
        "time_embedding": {
            "linear_1": sd.linear("time_embedding.linear_1"),
            "linear_2": sd.linear("time_embedding.linear_2")},
        "conv_norm_out": sd.ln("conv_norm_out"),
        "conv_out": sd.conv("conv_out"),
    }
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": sd.linear("add_embedding.linear_1"),
            "linear_2": sd.linear("add_embedding.linear_2")}

    def block(b: _SD, n_res: int, tf_layers: int, cross: bool,
              sampler: str) -> dict:
        p = {"resnets": [_resnet(b.sub(f"resnets.{j}"))
                         for j in range(n_res)],
             "attentions": [_tf2d(b.sub(f"attentions.{j}"), tf_layers,
                                  cfg.use_linear_projection)
                            for j in range(n_res)] if cross else []}
        if b.has(f"{sampler}.0.conv.weight"):
            p[sampler] = b.conv(f"{sampler}.0.conv")
        return p

    n = cfg.layers_per_block
    params["down_blocks"] = [
        block(sd.sub(f"down_blocks.{i}"), n,
              cfg.transformer_layers_per_block[i],
              t == "CrossAttnDownBlock2D", "downsamplers")
        for i, t in enumerate(cfg.down_block_types)]
    params["mid_block"] = {
        "resnets": [_resnet(sd.sub("mid_block.resnets.0")),
                    _resnet(sd.sub("mid_block.resnets.1"))],
        "attentions": [_tf2d(sd.sub("mid_block.attentions.0"),
                             cfg.transformer_layers_per_block[-1],
                             cfg.use_linear_projection)],
    }
    rev_tf = list(reversed(cfg.transformer_layers_per_block))
    params["up_blocks"] = [
        block(sd.sub(f"up_blocks.{i}"), n + 1, rev_tf[i],
              t == "CrossAttnUpBlock2D", "upsamplers")
        for i, t in enumerate(cfg.up_block_types)]
    return params


def convert_vae(sd_flat: Dict[str, np.ndarray], cfg: VAEConfig,
                dtype=jnp.float32) -> dict:
    sd = _SD(sd_flat, dtype=dtype)

    def attn(a: _SD) -> dict:
        return {"group_norm": a.ln("group_norm"),
                "to_q": a.linear("to_q"), "to_k": a.linear("to_k"),
                "to_v": a.linear("to_v"), "to_out": a.linear("to_out.0")}

    def mid(m: _SD) -> dict:
        return {"resnets": [_resnet(m.sub("resnets.0")),
                            _resnet(m.sub("resnets.1"))],
                "attention": attn(m.sub("attentions.0"))}

    n = len(cfg.block_out_channels)
    enc = sd.sub("encoder")
    dec = sd.sub("decoder")
    encoder = {
        "conv_in": enc.conv("conv_in"),
        "down_blocks": [],
        "mid_block": mid(enc.sub("mid_block")),
        "conv_norm_out": enc.ln("conv_norm_out"),
        "conv_out": enc.conv("conv_out"),
    }
    for i in range(n):
        b = enc.sub(f"down_blocks.{i}")
        blk = {"resnets": [_resnet(b.sub(f"resnets.{j}"))
                           for j in range(cfg.layers_per_block)]}
        if b.has("downsamplers.0.conv.weight"):
            blk["downsamplers"] = b.conv("downsamplers.0.conv")
        encoder["down_blocks"].append(blk)
    decoder = {
        "conv_in": dec.conv("conv_in"),
        "mid_block": mid(dec.sub("mid_block")),
        "up_blocks": [],
        "conv_norm_out": dec.ln("conv_norm_out"),
        "conv_out": dec.conv("conv_out"),
    }
    for i in range(n):
        b = dec.sub(f"up_blocks.{i}")
        blk = {"resnets": [_resnet(b.sub(f"resnets.{j}"))
                           for j in range(cfg.layers_per_block + 1)]}
        if b.has("upsamplers.0.conv.weight"):
            blk["upsamplers"] = b.conv("upsamplers.0.conv")
        decoder["up_blocks"].append(blk)
    return {"encoder": encoder, "decoder": decoder,
            "quant_conv": sd.conv("quant_conv"),
            "post_quant_conv": sd.conv("post_quant_conv")}


# ---------------------------------------------------------------------------
# High-level entry points
# ---------------------------------------------------------------------------


def load_emu1_checkpoint(path: str, cfg: Emu1Config, dtype=jnp.bfloat16,
                         mesh=None) -> dict:
    sd = load_state_dict(path)
    if any(".lora_A." in k for k in sd):
        # Emu-I ships peft LoRA adapters (r=16 α=16 on q/k/v/o_proj,
        # ref Emu1/inference.py:41-51); merge them into the base weights
        from emu_tpu.ops.lora import merge_lora_state_dict
        sd = merge_lora_state_dict(sd)
    params = convert_emu1(sd, cfg, dtype)
    if mesh is not None:
        from emu_tpu.models import emu1 as emu1_mod
        from emu_tpu.parallel import shard_params
        params = shard_params(params, mesh, emu1_mod.sharding_rules)
    return params


def load_emu2_checkpoint(path: str, cfg: Emu2Config, dtype=jnp.bfloat16,
                         mesh=None) -> dict:
    params = convert_emu2(load_state_dict(path), cfg, dtype)
    if mesh is not None:
        from emu_tpu.models import emu2 as emu2_mod
        from emu_tpu.parallel import shard_params
        params = shard_params(params, mesh, emu2_mod.sharding_rules)
    return params


# ---------------------------------------------------------------------------
# Native checkpoint format (orbax) — save/restore our own pytrees, so the
# one-time torch conversion isn't repeated at every model load, and sharded
# multi-host restore lands tensors directly on the mesh.
# ---------------------------------------------------------------------------


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def restore_params(path: str, like=None, mesh=None, rules=None):
    """Restore a params pytree. With `like` (a matching abstract/concrete
    tree) dtypes/shapes are enforced; with mesh+rules the restore is
    sharded in place."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    target = None
    if like is not None:
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
        if mesh is not None and rules is not None:
            from emu_tpu.parallel.mesh import sharding_tree
            shardings = sharding_tree(like, mesh, rules)
            target = jax.tree_util.tree_map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                                   sharding=sh),
                target, shardings)
    params = ckptr.restore(path, target)
    if target is None and mesh is not None and rules is not None:
        from emu_tpu.parallel import shard_params
        params = shard_params(params, mesh, rules)
    return params
