"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must run deterministically without TPU hardware; multi-chip sharding
tests use the virtual-device mesh (SURVEY.md §4: CPU backend as the 'fake
backend' + --xla_force_host_platform_device_count device simulation).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon sitecustomize registers the TPU plugin and re-points
# jax_platforms at "axon,cpu" before conftest runs — force it back
jax.config.update("jax_platforms", "cpu")
