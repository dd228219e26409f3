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
    # Matmul precision (SLAMTPU_MM_PRECISION: "float32" default | "default"
    # keeps the backend's bf16 passes | any jax precision name).
    # History: round-1 experiments (BA lookups, BA reductions, global f32)
    # landed the then-pipeline in much worse trajectory basins (ATE 0.12 ->
    # 1.6-1.7 m) and the default stayed bf16 through round 3. Round 4 re-ran
    # the experiment on the rewritten pipeline and flipped the default: the
    # bf16 matmuls were root-caused as the driver of the 2x TPU-vs-CPU
    # keyframe-cadence gap (bf16 projection/PnP/P3P chains add ~1 px
    # reprojection noise against the 3 px outlier gate, decaying 3D tracks
    # ~2x faster). Measured on the 60-frame city bench: bf16 21 KFs /
    # ATE 0.0375 vs f32 12 KFs / ATE 0.0331, matching CPU exec's 12 KFs /
    # 0.0401 (see PERF.md round 4; scripts/diag_cadence.py reproduces).
    prec = os.environ.get("SLAMTPU_MM_PRECISION", "float32")
    if prec and prec != "default":
        try:
            jax.config.update("jax_default_matmul_precision", prec)
        except Exception:  # pragma: no cover - best effort
            pass
    _enabled = True
