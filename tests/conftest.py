"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by asking XLA's host
platform for 8 virtual devices (the TPU-world analogue of a fake backend;
see SURVEY.md section 4).

Note: this environment ships an `axon` TPU PJRT plugin registered through
sitecustomize which overrides the JAX_PLATFORMS env var, so we must force
the platform through jax.config *before any backend is initialized* — env
vars alone are not sufficient here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# float64 available in tests so oracle comparisons can run the same code
# paths in both precisions (device code is dtype-polymorphic; fp32 tests
# pass explicit fp32 arrays).
jax.config.update("jax_enable_x64", True)
