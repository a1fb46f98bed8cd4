from emu_tpu.diffusion.schedulers import (  # noqa: F401
    EulerDiscreteScheduler,
    PNDMScheduler,
)
