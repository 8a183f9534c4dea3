"""Test configuration: emulate an 8-device TPU mesh on CPU.

jax may already be imported by sitecustomize before this file runs, so the
platform must be switched via jax.config (still possible before the backend
is initialized) rather than via environment variables alone.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
