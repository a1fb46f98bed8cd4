"""emu-tpu: a TPU-native (JAX/XLA/Pallas/pjit) generative multimodal framework.

Re-implements the full capability surface of baaivision/Emu (Emu1 + Emu2):
EVA-CLIP vision encoders, Causal-Former / pooling adapters, LLaMA-family
multimodal decoders with visual-embedding regression, SD/SDXL-class diffusion
decoders, chat/visual-generation pipelines, a distributed eval harness,
an HTTP serving stack and the YT-Storyboard-1B data pipeline — designed
TPU-first: SPMD over a `jax.sharding.Mesh`, jit-compiled static-shape
forward passes with explicit KV-cache state, and Pallas kernels on the hot
attention paths.

See SURVEY.md for the structural map of the reference this framework mirrors.
"""

__version__ = "0.1.0"

from emu_tpu import config  # noqa: F401
from emu_tpu.config import (  # noqa: F401
    Emu1Config,
    Emu2Config,
    LlamaConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
    VisionConfig,
)


def __getattr__(name):
    # heavy submodules load lazily so `import emu_tpu` stays light
    if name in ("EmuChatGeneration", "EmuVisualGeneration",
                "EmuGenerationPipeline"):
        from emu_tpu import pipelines
        return getattr(pipelines, name)
    if name == "GenerationConfig":
        from emu_tpu.generation import GenerationConfig
        return GenerationConfig
    if name == "EmuTokenizer":
        from emu_tpu.tokenization import EmuTokenizer
        return EmuTokenizer
    raise AttributeError(name)
