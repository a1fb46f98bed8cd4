from emu_tpu.serving.helper import Helper  # noqa: F401
from emu_tpu.serving.backend import EmuHTTPServer, make_server  # noqa: F401
