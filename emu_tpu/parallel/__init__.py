from emu_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    sharding_tree,
    replicate,
    data_sharding,
    DEFAULT_AXES,
)
from emu_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention,
    ring_attention_sharded,
)
from emu_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_forward,
    pipeline_llama_hidden,
)
