"""Test environment: run on CPU with 8 virtual devices.

The container's sitecustomize registers and initializes the TPU ("axon")
backend before pytest starts, so setting JAX_PLATFORMS alone is too late —
we also reset the initialized backend list.

Pallas kernels detect the CPU backend and run in interpret mode
(tpu_renderer.kernels.common.use_interpret). Multi-chip sharding tests use
the 8 virtual host devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()
except Exception:  # already uninitialized, or private API moved
    pass

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
