"""Persistent XLA compilation cache for the real entry points.

The detector train/eval graphs take minutes to compile on this host;
they are identical across tasks of an incremental run (same canvas
buckets, same capacities), across `tools/train.py` → `tools/test.py`
invocations, and across bench reruns.  The cache is keyed on
(HLO, platform, compiler flags), so enabling it is always safe.

Tests use their own cache dir (tests/conftest.py) because they run on
the virtual-CPU backend with different device counts.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "/root/.cache/nsgp_jax_compile_cache"


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Idempotently turn on jax's persistent compilation cache."""
    import jax

    d = cache_dir or os.environ.get("NSGP_COMPILE_CACHE", _DEFAULT_DIR)
    if d in ("0", "off", "none"):
        return
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
