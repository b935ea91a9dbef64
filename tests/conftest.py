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
# Interpret-mode cost scales with the raster chunk unroll: the production
# CHUNK=32 default makes the suite ~8x slower on CPU (39 min vs 5). The
# kernels are chunk-size-generic, so the suite runs the same code paths at
# CHUNK=8; the TPU-side CHUNK=32 build is exercised by the CLI drives,
# bench.py, and `RASTER_CHUNK=32 pytest` when explicitly requested.
os.environ.setdefault("RASTER_CHUNK", "8")
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
