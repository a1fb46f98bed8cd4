"""Test harness: force an 8-device virtual CPU mesh.

This is the TPU-world "fake backend" the reference never had (survey §4) —
multi-chip sharding paths are validated on virtual CPU devices so the suite
runs anywhere; the driver separately dry-runs the multichip path and benches
on real TPU hardware.

Environment note: sitecustomize may import jax before this file runs (the
axon TPU-pool registration hook), so env-var tricks (XLA_FLAGS /
JAX_PLATFORMS) are not reliable here. jax.config updates work as long as
no backend has been initialized yet, which registration does not do.
"""

import os

# keep the env-var path too for subprocesses spawned by tests
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# fp32 parity tests need exact fp32 matmuls (TPU/CPU defaults may downcast)
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) >= 8, (
    "test harness requires 8 virtual CPU devices; got "
    f"{jax.devices()} — was a backend initialized before conftest?")
