"""Test configuration: run everything on CPU with 8 virtual devices.

Real TPU hardware is single-chip in this environment; the multi-stream
sharding path is validated on a virtual host-platform mesh instead
(same XLA partitioner, same collectives).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU platform plugin ("axon") can win platform
# selection even with JAX_PLATFORMS set pre-import; force it here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
