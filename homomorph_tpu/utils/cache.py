"""Persistent XLA compilation cache helper.

Wide homomorphic circuits (u16/u32 multiplication) trace to large XLA
programs whose compilation dominates wall time on first use (minutes; the
compute itself is fast on TPU).  The compile is deterministic per shape
set, so a persistent cache amortizes it to once per machine.  The test
suite enables this via ``tests/conftest.py``; production entry points
(bench.py) and users call :func:`enable_compilation_cache`.

(An early Wallace-tree sketch with largest-first compressor inputs was
rejected for noise growth; the shipped carry-save tree - models/
csaplan.py, smallest-degree-first inputs - beats the reference
accumulation on both noise and work at width >= 8.  The cache still
matters: wide trees trace to large XLA programs either way.)
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable jax's persistent compilation cache (idempotent).

    ``path`` defaults to ``$HOMOMORPH_TPU_CACHE_DIR`` or ``~/.cache/
    homomorph_tpu/xla``.  Returns the cache directory in use.
    """
    import jax

    path = path or os.environ.get(
        "HOMOMORPH_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "homomorph_tpu", "xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # knob not present on this jax version
    return path
