"""Test harness: force an 8-device virtual CPU mesh.

This is the TPU-world "fake backend" the reference never had (survey §4) —
multi-chip sharding paths are validated on virtual CPU devices so the suite
runs anywhere; the driver separately dry-runs the multichip path and benches
on real TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# fp32 parity tests need exact fp32 matmuls (TPU/CPU defaults may downcast)
jax.config.update("jax_default_matmul_precision", "highest")
