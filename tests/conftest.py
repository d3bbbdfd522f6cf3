"""Test env: force an 8-device virtual CPU mesh so sharding paths compile
without TPU hardware (mirrors the driver's multi-chip dry-run)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
