from emu_tpu.ops.layers import (  # noqa: F401
    dense,
    dense_init,
    layer_norm,
    layer_norm_init,
    rms_norm,
    gelu_mlp,
    swiglu_mlp,
    patch_embed,
    patch_embed_init,
    avg_pool_tokens,
)
from emu_tpu.ops.attention import dot_product_attention  # noqa: F401
from emu_tpu.ops.rope import (  # noqa: F401
    llama_rope_tables,
    apply_llama_rope,
    vision_rope_tables,
    apply_vision_rope,
)
