from emu_tpu.data.main import video2dataset  # noqa: F401
