from emu_tpu.generation.engine import (  # noqa: F401
    GenerationConfig,
    generate,
    llama_generate,
)
from emu_tpu.generation.continuous import ContinuousEngine  # noqa: F401
