"""Typed configuration tree for every emu-tpu model family.

One config system replaces the reference's heterogeneous mix of JSON files,
dataclasses and argparse flags (survey §5 "Config / flag system"):
`Emu1/models/Emu-14B.json`, `Emu1/models/llama_config/config.json`,
`Emu2/emu/conf/emu_conf.py`, `Emu2/emu/conf/llama_config/config.json` and the
diffusers config dirs all map onto the dataclasses below, and
`from_emu1_json` / `from_hf_llama_json` ingest the original files directly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


def _from_dict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})


# ---------------------------------------------------------------------------
# Vision encoder (EVA ViT) — ref: Emu1/models/model.py:16-74 (CLIPVisionCfg)
# and Emu2/emu/conf/emu_conf.py:7-33.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    layers: int = 40
    head_width: int = 88
    mlp_ratio: float = 4.3637
    qkv_bias: bool = True
    # Block options (ref: Emu1/models/eva_vit_model.py:367-426)
    postnorm: bool = False          # Emu2 EVA-4B uses postnorm=True
    subln: bool = False             # sub-LayerNorm (inner attn/ffn LN)
    naiveswiglu: bool = False       # SwiGLU MLP instead of GELU MLP
    rope: bool = False              # 2D vision rotary embeddings
    use_shared_rel_pos_bias: bool = False  # shared 2D relative bias table
    pt_hw_seq_len: int = 16
    intp_freq: bool = False
    ls_init_value: Optional[float] = None  # layerscale gamma init
    patch_dropout: float = 0.0
    use_abs_pos_emb: bool = True
    ln_eps: float = 1e-6
    # Head (unused by Emu composites, kept for checkpoint parity; the
    # composite consumes `forward_features`, ref Emu1/models/modeling_emu.py:92)
    num_classes: int = 1024

    @property
    def num_heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # cls token

    @property
    def mlp_hidden(self) -> int:
        # int(dim * mlp_ratio), ref eva_vit_model.py:389
        return int(self.width * self.mlp_ratio)

    @classmethod
    def emu1_g(cls) -> "VisionConfig":
        """EVA-CLIP-g, ref Emu1/models/Emu-14B.json vision_cfg."""
        return cls(image_size=224, patch_size=14, width=1408, layers=40,
                   head_width=88, mlp_ratio=4.3637, num_classes=1024)

    @classmethod
    def emu2_4b(cls) -> "VisionConfig":
        """EVA-CLIP-4B, ref Emu2/emu/conf/emu_conf.py:7-33 (postnorm)."""
        return cls(image_size=448, patch_size=14, width=1792, layers=64,
                   head_width=112, mlp_ratio=8.571428571428571, postnorm=True,
                   num_classes=0)


# ---------------------------------------------------------------------------
# LLaMA decoder — ref: Emu1/models/llama_config/config.json and
# Emu2/emu/conf/llama_config/config.json.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LlamaConfig:
    hidden_size: int = 5120
    intermediate_size: int = 13824
    num_hidden_layers: int = 40
    num_attention_heads: int = 40
    # GQA (LLaMA-2/3-class checkpoints): kv heads < query heads. None =
    # MHA (the Emu1/Emu2 LLaMA-1-era decoders).
    num_key_value_heads: Optional[int] = None
    vocab_size: int = 32000          # base vocab before special tokens
    extended_vocab_size: int = 32000  # after special-token resize
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @classmethod
    def emu1_13b(cls, extended_vocab: int = 32004) -> "LlamaConfig":
        return cls(hidden_size=5120, intermediate_size=13824,
                   num_hidden_layers=40, num_attention_heads=40,
                   extended_vocab_size=extended_vocab)

    @classmethod
    def emu2_33b(cls, extended_vocab: int = 32272) -> "LlamaConfig":
        return cls(hidden_size=6656, intermediate_size=17920,
                   num_hidden_layers=60, num_attention_heads=52,
                   extended_vocab_size=extended_vocab)

    @classmethod
    def from_hf_llama_json(cls, path: str, extended_vocab: Optional[int] = None
                           ) -> "LlamaConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d.get("num_key_value_heads"),
            vocab_size=d["vocab_size"],
            extended_vocab_size=extended_vocab or d["vocab_size"],
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 10000.0),
            bos_token_id=d.get("bos_token_id", 1),
            eos_token_id=d.get("eos_token_id", 2),
            pad_token_id=d.get("pad_token_id", 0),
        )


# ---------------------------------------------------------------------------
# T5 decoder stack for the Causal Former — ref: Emu1/models/causal_former.py:26-31
# (T5Config.from_pretrained("t5-base") with encoder_width override).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class T5Config:
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    encoder_width: int = 1408  # cross-attn K/V input width (vision width),
    # ref Emu1/models/modeling_t5.py:423-424

    @classmethod
    def t5_base(cls, encoder_width: int = 1408) -> "T5Config":
        return cls(encoder_width=encoder_width)


# ---------------------------------------------------------------------------
# Composite model configs.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Emu1Config:
    """Emu1-14B: ViT-g + CausalFormer + LLaMA-13B w/ regression head.

    Ref: Emu1/models/Emu-14B.json + modeling_emu.py:22-84.
    """
    vision: VisionConfig = field(default_factory=VisionConfig.emu1_g)
    llama: LlamaConfig = field(default_factory=LlamaConfig.emu1_13b)
    t5: T5Config = field(default_factory=T5Config.t5_base)
    n_causal: int = 32
    instruct: bool = False

    @classmethod
    def from_emu1_json(cls, path: str, instruct: bool = False) -> "Emu1Config":
        """Ingest the reference's Emu-14B.json."""
        with open(path) as f:
            d = json.load(f)
        v = d["vision_cfg"]
        vision = VisionConfig(
            image_size=v["image_size"], patch_size=v["patch_size"],
            width=v["width"], layers=v["layers"], head_width=v["head_width"],
            mlp_ratio=v["mlp_ratio"], num_classes=d.get("embed_dim", 1024))
        n_causal = d.get("vladapter_cfg", {}).get("n_causal", 32)
        extended = 32006 if instruct else 32004
        return cls(vision=vision,
                   llama=LlamaConfig.emu1_13b(extended_vocab=extended),
                   t5=T5Config.t5_base(encoder_width=v["width"]),
                   n_causal=n_causal, instruct=instruct)

    @classmethod
    def tiny(cls) -> "Emu1Config":
        """Small config for tests."""
        return cls(
            vision=VisionConfig(image_size=28, patch_size=14, width=32,
                                layers=2, head_width=16, mlp_ratio=4.0,
                                num_classes=8),
            llama=LlamaConfig(hidden_size=64, intermediate_size=128,
                              num_hidden_layers=2, num_attention_heads=4,
                              vocab_size=256, extended_vocab_size=260),
            t5=T5Config(d_model=48, d_kv=12, d_ff=96, num_layers=2,
                        num_heads=4, encoder_width=32),
            n_causal=4)


@dataclass(frozen=True)
class Emu2Config:
    """Emu2-37B: EVA-4B ViT + avgpool/linear adapter + LLaMA-33B.

    Ref: Emu2/emu/emu.py:19-65, conf/emu_conf.py.
    """
    vision: VisionConfig = field(default_factory=VisionConfig.emu2_4b)
    llama: LlamaConfig = field(default_factory=LlamaConfig.emu2_33b)
    n_query: int = 64    # 256 for -Chat (ref Emu2/emu/chat.py:215-232)
    v_query: int = 64
    instruct: bool = False

    @classmethod
    def chat(cls) -> "Emu2Config":
        return cls(n_query=256, v_query=64, instruct=True,
                   llama=LlamaConfig.emu2_33b(extended_vocab=32274))

    @classmethod
    def tiny(cls) -> "Emu2Config":
        return cls(
            vision=VisionConfig(image_size=56, patch_size=14, width=32,
                                layers=2, head_width=16, mlp_ratio=4.0,
                                postnorm=True, num_classes=0),
            llama=LlamaConfig(hidden_size=64, intermediate_size=128,
                              num_hidden_layers=2, num_attention_heads=4,
                              vocab_size=256, extended_vocab_size=528),
            n_query=4, v_query=4)


# ---------------------------------------------------------------------------
# Diffusion decoder configs — ref: Emu2/emu/conf/diffusion_config/* and the
# SD-v1.5-class components loaded by Emu1/models/pipeline.py:236-262.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 128
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D")
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    attention_head_dim: Tuple[int, ...] = (5, 10, 20)
    cross_attention_dim: int = 1792
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_linear_projection: bool = True
    addition_embed_type: Optional[str] = "text_time"  # SDXL-style
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 3328
    flip_sin_to_cos: bool = True
    freq_shift: int = 0

    @classmethod
    def emu2_sdxl(cls) -> "UNetConfig":
        """Ref: Emu2/emu/conf/diffusion_config/unet/config.json."""
        return cls()

    @classmethod
    def emu1_sd15(cls) -> "UNetConfig":
        """SD-v1.5-class UNet conditioned on Emu1 visual embeds (5120-d).

        Ref: Emu1/models/pipeline.py:246-249 loads a modified SD1.5 UNet whose
        cross_attention_dim equals the LLM width.
        """
        return cls(
            sample_size=64,
            block_out_channels=(320, 640, 1280, 1280),
            down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                              "CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                            "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
            transformer_layers_per_block=(1, 1, 1, 1),
            attention_head_dim=(8, 8, 8, 8),
            cross_attention_dim=5120,
            use_linear_projection=False,
            addition_embed_type=None,
        )

    @classmethod
    def tiny(cls, cross_attention_dim: int = 32, sdxl: bool = False
             ) -> "UNetConfig":
        return cls(
            sample_size=8,
            block_out_channels=(32, 64),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1,
            transformer_layers_per_block=(1, 1),
            attention_head_dim=(2, 4),
            cross_attention_dim=cross_attention_dim,
            norm_num_groups=8,
            addition_embed_type="text_time" if sdxl else None,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=(
                cross_attention_dim + 6 * 8) if sdxl else 0,
        )


@dataclass(frozen=True)
class VAEConfig:
    """Ref: Emu2/emu/conf/diffusion_config/vae/config.json (SDXL VAE)."""
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025
    sample_size: int = 1024

    @classmethod
    def sd15(cls) -> "VAEConfig":
        return cls(scaling_factor=0.18215, sample_size=512)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1,
                   norm_num_groups=8, sample_size=32)


@dataclass(frozen=True)
class SchedulerConfig:
    """Shared noise-schedule config for PNDM (Emu1) and Euler (Emu2).

    Ref: Emu2/emu/conf/diffusion_config/scheduler/scheduler_config.json and
    the PNDM defaults used by Emu1/models/pipeline.py.
    """
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    timestep_spacing: str = "leading"
    steps_offset: int = 1
    skip_prk_steps: bool = True
    set_alpha_to_one: bool = False


# ---------------------------------------------------------------------------
# Runtime / parallelism.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RuntimeConfig:
    """Mesh + precision policy for a deployment."""
    mesh_shape: Tuple[int, ...] = (1, 1)       # (data, model)
    mesh_axis_names: Tuple[str, ...] = ("data", "model")
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"
    remat: bool = False
