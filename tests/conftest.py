"""Test env: force an 8-device virtual CPU mesh so sharding paths compile
without TPU hardware (mirrors the driver's multi-chip dry-run).

NOTE: this image force-registers the tunneled TPU backend via
sitecustomize (JAX_PLATFORMS=axon); the TPU is a single-claim resource,
so tests MUST run on CPU — override both the env var and the live
config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
