"""Synthetic reference-layout checkpoints (loader rehearsal without weights).

No Emu weights ship in this image, so the checkpoint converters
(`emu_tpu.checkpoint`) are exercised against state dicts synthesized
here: each `invert_*` walks OUR param tree and emits the reference's
key names/layouts (torch [out,in] linears, OIHW convs, per-layer module
names — the exact inverses of `convert_*`), so
`convert(invert(params)) == params` leaf-for-leaf. `materialize` turns a
`jax.eval_shape` tree into numpy arrays, which lets a REAL-SHAPE Emu-14B
state dict be synthesized without ever instantiating the model, and
`save_sharded` writes it in the HF sharded layout
(pytorch_model-0000k-of-0000N.bin + pytorch_model.bin.index.json, the
`conf/llama_config/pytorch_model.bin.index.json` style the reference
loads through accelerate dispatch).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np


def materialize(shape_tree, fill: Optional[Callable] = None,
                dtype=np.float32):
    """ShapeDtypeStruct tree (from jax.eval_shape) → numpy arrays."""
    if fill is None:
        fill = np.zeros
    return jax.tree_util.tree_map(
        lambda s: np.asarray(fill(s.shape), dtype), shape_tree)


def random_fill(seed: int = 0, scale: float = 0.02) -> Callable:
    rng = np.random.default_rng(seed)
    return lambda shape: (rng.standard_normal(shape) * scale)


# -- leaf inverters (exact inverses of checkpoint._SD helpers) ---------------


def _np(x):
    return np.asarray(x)


def _put_linear(out, name, p):
    out[name + ".weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[name + ".bias"] = _np(p["bias"])


def _put_conv(out, name, p):
    out[name + ".weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    out[name + ".bias"] = _np(p["bias"])


def _put_ln(out, name, p):
    out[name + ".weight"] = _np(p["scale"])
    out[name + ".bias"] = _np(p["bias"])


def _layer(tree, i):
    """Slice layer i out of a stacked [L, ...] subtree."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


# -- model families ----------------------------------------------------------


def invert_vit(params: dict, cfg, out: Dict[str, np.ndarray],
               prefix: str = "visual.") -> Dict[str, np.ndarray]:
    """Our ViT tree → EVA ViT names (inverse of checkpoint.convert_vit)."""
    p_sz = cfg.patch_size
    k = _np(params["patch_embed"]["kernel"])          # [(p p 3), w]
    out[prefix + "patch_embed.proj.weight"] = (
        k.reshape(p_sz, p_sz, 3, -1).transpose(3, 2, 0, 1))
    out[prefix + "patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    out[prefix + "cls_token"] = _np(params["cls_token"])
    if "pos_embed" in params:
        out[prefix + "pos_embed"] = _np(params["pos_embed"])
    if "rel_pos_bias" in params:
        out[prefix + "rel_pos_bias.relative_position_bias_table"] = _np(
            params["rel_pos_bias"])
    for i in range(cfg.layers):
        b = _layer(params["blocks"], i)
        pre = f"{prefix}blocks.{i}."
        _put_ln(out, pre + "norm1", b["norm1"])
        _put_ln(out, pre + "norm2", b["norm2"])
        out[pre + "attn.qkv.weight"] = _np(b["attn"]["qkv"]["kernel"]).T
        out[pre + "attn.q_bias"] = _np(b["attn"]["q_bias"])
        out[pre + "attn.v_bias"] = _np(b["attn"]["v_bias"])
        _put_linear(out, pre + "attn.proj", b["attn"]["proj"])
        if "inner_ln" in b["attn"]:
            _put_ln(out, pre + "attn.inner_attn_ln", b["attn"]["inner_ln"])
        if "w1" in b["mlp"]:
            for n in ("w1", "w2", "w3"):
                _put_linear(out, pre + f"mlp.{n}", b["mlp"][n])
            if "ffn_ln" in b["mlp"]:
                _put_ln(out, pre + "mlp.ffn_ln", b["mlp"]["ffn_ln"])
        else:
            _put_linear(out, pre + "mlp.fc1", b["mlp"]["fc1"])
            _put_linear(out, pre + "mlp.fc2", b["mlp"]["fc2"])
        if "gamma_1" in b:
            out[pre + "gamma_1"] = _np(b["gamma_1"])
            out[pre + "gamma_2"] = _np(b["gamma_2"])
    if "norm" in params:
        _put_ln(out, prefix + "norm", params["norm"])
        _put_linear(out, prefix + "head", params["head"])
    return out


def invert_llama(params: dict, cfg, out: Dict[str, np.ndarray],
                 prefix: str = "decoder.lm.") -> Dict[str, np.ndarray]:
    """Our LLaMA tree → HF LlamaForCausalLM names (inverse of
    checkpoint.convert_llama)."""
    out[prefix + "model.embed_tokens.weight"] = _np(params["embed_tokens"])
    out[prefix + "model.norm.weight"] = _np(params["norm"])
    _put_linear(out, prefix + "lm_head", params["lm_head"])
    if "stu_regress_head" in params:
        _put_linear(out, prefix + "stu_regress_head",
                    params["stu_regress_head"])
    for i in range(cfg.num_hidden_layers):
        l = _layer(params["layers"], i)
        pre = f"{prefix}model.layers.{i}."
        out[pre + "input_layernorm.weight"] = _np(l["input_layernorm"])
        out[pre + "post_attention_layernorm.weight"] = _np(
            l["post_attention_layernorm"])
        for n in ("q", "k", "v", "o"):
            _put_linear(out, pre + f"self_attn.{n}_proj",
                        l["self_attn"][f"{n}_proj"])
        _put_linear(out, pre + "mlp.gate_proj", l["mlp"]["gate"])
        _put_linear(out, pre + "mlp.up_proj", l["mlp"]["up"])
        _put_linear(out, pre + "mlp.down_proj", l["mlp"]["down"])
    return out


def invert_t5_decoder(params: dict, cfg, out: Dict[str, np.ndarray],
                      prefix: str = "cformer.cformer."
                      ) -> Dict[str, np.ndarray]:
    """Our T5 decoder tree → HF T5Stack names (inverse of
    checkpoint.convert_t5_decoder)."""
    out[prefix + "final_layer_norm.weight"] = _np(params["final_ln"])
    out[prefix
        + "block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ] = _np(params["rel_bias"])
    for i in range(cfg.num_layers):
        b = _layer(params["layers"], i)
        pre = f"{prefix}block.{i}."
        for idx, name, key in ((0, "SelfAttention", "self_attn"),
                               (1, "EncDecAttention", "cross_attn")):
            a = b[key]
            out[pre + f"layer.{idx}.layer_norm.weight"] = _np(a["ln"])
            for n in ("q", "k", "v", "o"):
                _put_linear(out, pre + f"layer.{idx}.{name}.{n}", a[n])
        out[pre + "layer.2.layer_norm.weight"] = _np(b["ff"]["ln"])
        _put_linear(out, pre + "layer.2.DenseReluDense.wi", b["ff"]["wi"])
        _put_linear(out, pre + "layer.2.DenseReluDense.wo", b["ff"]["wo"])
    return out


def _put_resnet(out, name, p):
    _put_ln(out, name + ".norm1", p["norm1"])
    _put_conv(out, name + ".conv1", p["conv1"])
    _put_ln(out, name + ".norm2", p["norm2"])
    _put_conv(out, name + ".conv2", p["conv2"])
    if "time_emb_proj" in p:
        _put_linear(out, name + ".time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        _put_conv(out, name + ".conv_shortcut", p["conv_shortcut"])


def invert_unet(params: dict, cfg, out: Dict[str, np.ndarray],
                prefix: str = "") -> Dict[str, np.ndarray]:
    """Our UNet tree → diffusers UNet2DConditionModel names (inverse of
    checkpoint.convert_unet)."""

    def put_attnblock(name, p):
        for an in ("attn1", "attn2"):
            for ln in ("to_q", "to_k", "to_v"):
                _put_linear(out, f"{name}.{an}.{ln}", p[an][ln])
            _put_linear(out, f"{name}.{an}.to_out.0", p[an]["to_out"])
        for ln_name in ("norm1", "norm2", "norm3"):
            _put_ln(out, f"{name}.{ln_name}", p[ln_name])
        _put_linear(out, name + ".ff.net.0.proj", p["ff"]["proj_in"])
        _put_linear(out, name + ".ff.net.2", p["ff"]["proj_out"])

    def put_tf2d(name, p):
        _put_ln(out, name + ".norm", p["norm"])
        put = _put_linear if cfg.use_linear_projection else _put_conv
        put(out, name + ".proj_in", p["proj_in"])
        put(out, name + ".proj_out", p["proj_out"])
        for j, blk in enumerate(p["blocks"]):
            put_attnblock(f"{name}.transformer_blocks.{j}", blk)

    _put_conv(out, prefix + "conv_in", params["conv_in"])
    for n in ("linear_1", "linear_2"):
        _put_linear(out, prefix + f"time_embedding.{n}",
                    params["time_embedding"][n])
    if "add_embedding" in params:
        for n in ("linear_1", "linear_2"):
            _put_linear(out, prefix + f"add_embedding.{n}",
                        params["add_embedding"][n])
    for kind in ("down_blocks", "up_blocks"):
        for i, blk in enumerate(params[kind]):
            pre = f"{prefix}{kind}.{i}"
            for j, r in enumerate(blk["resnets"]):
                _put_resnet(out, f"{pre}.resnets.{j}", r)
            for j, a in enumerate(blk["attentions"]):
                put_tf2d(f"{pre}.attentions.{j}", a)
            sampler = ("downsamplers" if kind == "down_blocks"
                       else "upsamplers")
            if sampler in blk:
                _put_conv(out, f"{pre}.{sampler}.0.conv", blk[sampler])
    for j, r in enumerate(params["mid_block"]["resnets"]):
        _put_resnet(out, f"{prefix}mid_block.resnets.{j}", r)
    put_tf2d(prefix + "mid_block.attentions.0",
             params["mid_block"]["attentions"][0])
    _put_ln(out, prefix + "conv_norm_out", params["conv_norm_out"])
    _put_conv(out, prefix + "conv_out", params["conv_out"])
    return out


def invert_vae(params: dict, cfg, out: Dict[str, np.ndarray],
               prefix: str = "") -> Dict[str, np.ndarray]:
    """Our VAE tree → diffusers AutoencoderKL names (inverse of
    checkpoint.convert_vae)."""

    def put_attn(name, p):
        _put_ln(out, name + ".group_norm", p["group_norm"])
        for n in ("to_q", "to_k", "to_v"):
            _put_linear(out, f"{name}.{n}", p[n])
        _put_linear(out, name + ".to_out.0", p["to_out"])

    def put_mid(name, p):
        _put_resnet(out, name + ".resnets.0", p["resnets"][0])
        _put_resnet(out, name + ".resnets.1", p["resnets"][1])
        put_attn(name + ".attentions.0", p["attention"])

    for side, blocks, sampler in (
            ("encoder", "down_blocks", "downsamplers"),
            ("decoder", "up_blocks", "upsamplers")):
        t = params[side]
        pre = prefix + side + "."
        _put_conv(out, pre + "conv_in", t["conv_in"])
        put_mid(pre + "mid_block", t["mid_block"])
        _put_ln(out, pre + "conv_norm_out", t["conv_norm_out"])
        _put_conv(out, pre + "conv_out", t["conv_out"])
        for i, blk in enumerate(t[blocks]):
            for j, r in enumerate(blk["resnets"]):
                _put_resnet(out, f"{pre}{blocks}.{i}.resnets.{j}", r)
            if sampler in blk:
                _put_conv(out, f"{pre}{blocks}.{i}.{sampler}.0.conv",
                          blk[sampler])
    _put_conv(out, prefix + "quant_conv", params["quant_conv"])
    _put_conv(out, prefix + "post_quant_conv", params["post_quant_conv"])
    return out


# -- composite models --------------------------------------------------------


def invert_emu1(params: dict, cfg) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    invert_vit(params["visual"], cfg.vision, out, "visual.")
    _put_ln(out, "ln_visual", params["ln_visual"])
    out["cformer.causal_tokens"] = _np(params["cformer"]["causal_tokens"])
    _put_linear(out, "cformer.projection", params["cformer"]["projection"])
    invert_t5_decoder(params["cformer"]["cformer"], cfg.t5, out)
    invert_llama(params["decoder"], cfg.llama, out, "decoder.lm.")
    return out


def invert_emu2(params: dict, cfg) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    invert_vit(params["visual"], cfg.vision, out, "visual.")
    invert_llama(params["decoder"], cfg.llama, out, "decoder.lm.")
    _put_linear(out, "project_up", params["project_up"])
    _put_linear(out, "project_down", params["project_down"])
    return out


# -- HF sharded writer -------------------------------------------------------


def save_sharded(sd: Dict[str, np.ndarray], path: str,
                 max_shard_bytes: int = 8 * 1024 ** 3,
                 dtype=np.float16) -> str:
    """Write a flat state dict as HF sharded torch .bin files + index json
    (pytorch_model.bin.index.json layout). Returns the index path."""
    import torch
    os.makedirs(path, exist_ok=True)
    keys = list(sd)
    shards, cur, cur_bytes = [], [], 0
    for k in keys:
        nbytes = sd[k].size * np.dtype(dtype).itemsize
        if cur and cur_bytes + nbytes > max_shard_bytes:
            shards.append(cur)
            cur, cur_bytes = [], 0
        cur.append(k)
        cur_bytes += nbytes
    if cur:
        shards.append(cur)
    n = len(shards)
    weight_map, total = {}, 0
    for i, shard_keys in enumerate(shards, 1):
        fname = f"pytorch_model-{i:05d}-of-{n:05d}.bin"
        blob = {}
        for k in shard_keys:
            arr = np.require(sd[k].astype(dtype, copy=False),
                             requirements=["C", "W"])
            blob[k] = torch.from_numpy(arr)
            weight_map[k] = fname
            total += arr.nbytes
        torch.save(blob, os.path.join(path, fname))
    index = os.path.join(path, "pytorch_model.bin.index.json")
    with open(index, "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)
    return index
