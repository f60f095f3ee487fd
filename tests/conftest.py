"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests without hardware) and enable x64 so covariance accumulation matches the
C++ reference's float64 (align_icp.cpp:37,125).

Note: this container pre-registers a TPU backend via sitecustomize, so
JAX_PLATFORMS must be overridden through jax.config, not just the env.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
