"""Tiny serialized-loop Pallas kernels.

Some in-program scalar recurrences are a handful of vector ops per
iteration but tens of iterations deep — as XLA ops each iteration pays the
backend's per-op overhead, so a 24-step bisection costs milliseconds while
doing microseconds of arithmetic. These kernels run the identical loop
VMEM-resident in one launch.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _median_kernel(v_ref, m_ref, out_ref, *, iters):
    """Bisection median over masked entries — op-for-op the same algorithm
    as ops/frontend_step.py::_masked_median."""
    values = v_ref[...]
    mask = m_ref[...] > 0
    n = jnp.sum(mask.astype(jnp.float32))
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    lo = jnp.min(jnp.where(mask, values, big))
    hi = jnp.max(jnp.where(mask, values, -big))
    half = jnp.floor((n + 1.0) * 0.5)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        below = jnp.sum((mask & (values <= mid)).astype(jnp.float32))
        take = below < half
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, mid)
    out_ref[...] = jnp.where(
        n > 0, 0.5 * (lo + hi), 0.0
    ).reshape(1, 1)


def masked_median_pallas(values, mask, iters: int = 24,
                         interpret: bool | None = None):
    """values (N,) f32, mask (N,) bool -> scalar masked median (bisection,
    same contract as _masked_median)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = values.shape[0]
    out = pl.pallas_call(
        functools.partial(_median_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(values.astype(jnp.float32).reshape(1, n),
      mask.astype(jnp.float32).reshape(1, n))
    return out[0, 0]


def use_scalar_pallas() -> bool:
    """Trace-time switch (SLAMTPU_PALLAS_SCALAR=1, TPU backend only)."""
    if os.environ.get("SLAMTPU_PALLAS_SCALAR") != "1":
        return False
    return jax.default_backend() == "tpu"
