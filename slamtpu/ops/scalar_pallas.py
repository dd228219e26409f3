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
    """Trace-time switch (SLAMTPU_PALLAS_SCALAR=1; TPU, or interpreter under SLAMTPU_PALLAS_INTERPRET=1)."""
    if os.environ.get("SLAMTPU_PALLAS_SCALAR") != "1":
        return False
    if os.environ.get("SLAMTPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu"


def _solve_kernel(a_ref, b_ref, out_ref, *, k):
    """Single-system Cholesky solve (A + 1e-9 I unnecessary — caller damps)
    with the same masked-column algorithm as smallalg.solve_psd, VMEM-
    resident: k column steps of whole-matrix vector ops instead of k
    serialized XLA ops."""
    A = a_ref[...]
    b = b_ref[...]  # (1, k)
    idx = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def dot(u, v, dims):
        return jax.lax.dot_general(
            u, v, (dims, ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    # Mosaic TC has no dynamic_slice (and single-sublane static slices hit
    # tiling limits), so every row/column extraction is a one-hot contraction.
    L = jnp.zeros_like(A)
    for j in range(k):
        oh_row = (lane == j).astype(jnp.float32)           # (1, k)
        oh_col = (idx == j).astype(jnp.float32)            # (k, 1)
        Lj = dot(oh_row, L, (((1,), (0,))))                # row j of L
        # s = A[:, j] - L @ L[j, :]^T  (columns >= j of L still zero).
        s = dot(A, oh_col, (((1,), (0,)))) - dot(L, Lj, (((1,), (1,))))
        sjj = jnp.sum(s * oh_col)
        d = jnp.sqrt(jnp.maximum(sjj, 1e-12))
        col = jnp.where(idx >= j, s / d, 0.0)              # (k, 1)
        L = L + col * oh_row
    # Forward substitution L y = b.
    y = jnp.zeros((k, 1), jnp.float32)
    for i in range(k):
        oh_row = (lane == i).astype(jnp.float32)
        oh_col = (idx == i).astype(jnp.float32)
        Li = dot(oh_row, L, (((1,), (0,))))                # row i of L
        Lii = jnp.sum(Li * oh_row)
        s = jnp.sum(b * oh_row) - jnp.sum(dot(Li, y, (((1,), (0,)))))
        y = y + (s / Lii) * oh_col
    # Back substitution L^T x = y.
    x = jnp.zeros((k, 1), jnp.float32)
    for i in reversed(range(k)):
        oh_row = (lane == i).astype(jnp.float32)
        oh_col = (idx == i).astype(jnp.float32)
        Lc = dot(L, oh_col, (((1,), (0,))))                # column i of L
        Lii = jnp.sum(Lc * oh_col)
        s = jnp.sum(y * oh_col) - jnp.sum(dot(Lc, x, (((0,), (0,)))))
        x = x + (s / Lii) * oh_col
    out_ref[...] = x.reshape(1, k)


def solve_psd_pallas(A, b, *, interpret: bool | None = None):
    """Single (k, k) PSD solve as one VMEM launch — the BA pose system's
    unrolled Cholesky is ~4k serialized XLA ops per LM iteration
    (smallalg.solve_psd at k = 6 * FREE_CAP)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = A.shape[-1]
    out = pl.pallas_call(
        functools.partial(_solve_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        interpret=interpret,
    )(A.astype(jnp.float32), b.astype(jnp.float32).reshape(1, k))
    return out[0]


def use_pallas_solve() -> bool:
    """Trace-time switch (SLAMTPU_PALLAS_SOLVE=1; TPU, or interpreter under SLAMTPU_PALLAS_INTERPRET=1)."""
    if os.environ.get("SLAMTPU_PALLAS_SOLVE") != "1":
        return False
    if os.environ.get("SLAMTPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu"
