from emu_tpu.generation.engine import (  # noqa: F401
    GenerationConfig,
    generate,
    llama_generate,
)
from emu_tpu.generation.continuous import ContinuousEngine  # noqa: F401
from emu_tpu.generation.speculative import speculative_generate  # noqa: F401
from emu_tpu.generation.paged_kv import (  # noqa: F401
    PageAllocator,
    init_paged_cache,
    paged_decode_step,
    paged_prefill_insert,
)
