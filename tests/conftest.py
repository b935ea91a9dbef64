"""Test environment: run on CPU with 8 virtual devices.

Pallas kernels detect the CPU backend and run in interpret mode
(tpu_renderer.kernels.common.use_interpret). Multi-chip sharding tests use
the 8 virtual host devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
