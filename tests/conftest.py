"""Test configuration: force the CPU backend (fast, has complex128) and a
virtual 8-device mesh for sharding tests.

The container's sitecustomize registers the `axon` TPU plugin and pins
JAX_PLATFORMS=axon; we override to CPU before any backend initializes.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
