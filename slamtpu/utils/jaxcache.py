"""Persistent XLA compilation cache.

First-time compiles over the tunnel cost 10-60 s each; the persistent cache
amortizes them across processes/runs.
"""
from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.environ.get(
        "SLAMTPU_JAX_CACHE", os.path.expanduser("~/.cache/slamtpu-jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - best effort
        pass
    # NOTE: do NOT set jax_default_matmul_precision here. Three independent
    # experiments (BA lookups, BA reductions, global f32) showed that
    # raising matmul precision above the TPU default consistently lands the
    # pipeline in much worse trajectory basins on the synthetic benchmark
    # (ATE 0.12 -> 1.6-1.7 m). Root cause under investigation (see PERF.md);
    # the shipped configuration is the extensively-validated default.
    _enabled = True
