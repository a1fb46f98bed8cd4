from emu_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    sharding_tree,
    replicate,
    data_sharding,
    DEFAULT_AXES,
)
