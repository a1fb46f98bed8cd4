from emu_tpu.pipelines.chat import EmuChatGeneration  # noqa: F401
from emu_tpu.pipelines.visual_generation import EmuVisualGeneration  # noqa: F401
from emu_tpu.pipelines.emu1_pipeline import EmuGenerationPipeline  # noqa: F401
