"""Fused Pallas DLT triangulation kernel.

ops/mvg.py::triangulate_points builds the 4x4 DLT system per point and
extracts its null vector with smallalg.smallest_eigvec_psd — 8 inverse
iterations whose batched 4x4 Cholesky unrolls to ~200 serialized XLA ops.
The keyframe program runs it twice (stereo DLT + temporal DLT,
mapper.jl:142-263). This kernel runs the identical arithmetic lane-major
(one lane per point) in a single VMEM-resident launch.

Gate: SLAMTPU_PALLAS_DLT=1 (ops/mvg.py::triangulate_points). Parity:
tests/test_dlt_pallas.py (CPU interpreter) + tests/test_tpu_smoke.py.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _dlt_kernel(px_ref, p1_ref, p2_ref, out_ref):
    """px (4, N): x1, y1, x2, y2; p1 (1, 16) row-major P1;
    p2 (16, N) per-point row-major P2; out (4, N) homogeneous points."""
    x1 = px_ref[0:1, :]
    y1 = px_ref[1:2, :]
    x2 = px_ref[2:3, :]
    y2 = px_ref[3:4, :]

    def p1(i, j):
        return p1_ref[0, 4 * i + j]

    def p2(i, j):
        return p2_ref[4 * i + j:4 * i + j + 1, :]

    # DLT rows (mvg.py:62-67): a0 = x1 P1[2] - P1[0], a1 = y1 P1[2] - P1[1],
    # a2 = x2 P2[2] - P2[0], a3 = y2 P2[2] - P2[1]; each (4,) per lane.
    rows = []
    for j in range(4):
        rows.append([
            x1 * p1(2, j) - p1(0, j),
            y1 * p1(2, j) - p1(1, j),
            x2 * p2(2, j) - p2(0, j),
            y2 * p2(2, j) - p2(1, j),
        ])
    # rows[j][i] = A[i, j] as a (1, N) vector. Row-normalize A.
    a = [[rows[j][i] for j in range(4)] for i in range(4)]
    for i in range(4):
        nrm = jnp.sqrt(
            a[i][0] * a[i][0] + a[i][1] * a[i][1]
            + a[i][2] * a[i][2] + a[i][3] * a[i][3]
        )
        nrm = jnp.maximum(nrm, 1e-12)
        a[i] = [t / nrm for t in a[i]]

    # M = A^T A (10 unique entries), then inverse iteration with the same
    # scaling/regularization as smallalg.smallest_eigvec_psd.
    m = {}
    for j in range(4):
        for k in range(j, 4):
            s = a[0][j] * a[0][k]
            for i in range(1, 4):
                s = s + a[i][j] * a[i][k]
            m[(j, k)] = s
    scale = jnp.maximum(
        (m[(0, 0)] + m[(1, 1)] + m[(2, 2)] + m[(3, 3)]) * 0.25, 1e-30
    )
    ms = {}
    for j in range(4):
        for k in range(j, 4):
            v = m[(j, k)] / scale
            if j == k:
                v = v + 1e-5
            ms[(j, k)] = v

    def getm(i, j):
        return ms[(i, j)] if i <= j else ms[(j, i)]

    # Cholesky of the (lane-batched) 4x4 (smallalg.solve_psd, eps 1e-12).
    L = {}
    for j in range(4):
        s = getm(j, j)
        for t in range(j):
            s = s - L[(j, t)] * L[(j, t)]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[(j, j)] = d
        for i in range(j + 1, 4):
            s = getm(i, j)
            for t in range(j):
                s = s - L[(i, t)] * L[(j, t)]
            L[(i, j)] = s / d

    v0 = 1.0 + 0.1 * np.arange(4, dtype=np.float32)
    v0 = v0 / np.sqrt(np.sum(v0 * v0))
    v = [jnp.full_like(x1, float(v0[k])) for k in range(4)]
    for _ in range(8):
        # Solve L L^T w = v, then renormalize (inverse iteration).
        y = []
        for i in range(4):
            s = v[i]
            for t in range(i):
                s = s - L[(i, t)] * y[t]
            y.append(s / L[(i, i)])
        w = [None] * 4
        for i in reversed(range(4)):
            s = y[i]
            for t in range(i + 1, 4):
                s = s - L[(t, i)] * w[t]
            w[i] = s / L[(i, i)]
        nrm = jnp.sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2] + w[3] * w[3])
        nrm = jnp.maximum(nrm, 1e-30)
        v = [t / nrm for t in w]

    out_ref[...] = jnp.concatenate(v, axis=0)


def triangulate_points_pallas(px1, px2, P1, P2, *,
                              interpret: bool | None = None):
    """Drop-in for ops/mvg.py::triangulate_points (same shapes/semantics)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = px1.shape[0]
    px = jnp.concatenate(
        [px1.astype(jnp.float32).T, px2.astype(jnp.float32).T], axis=0
    )  # (4, N)
    if P1.ndim != 2:
        raise ValueError("pallas DLT expects a shared P1")
    p1 = P1.astype(jnp.float32).reshape(1, 16)
    if P2.ndim == 2:
        P2 = jnp.broadcast_to(P2, (n, 4, 4))
    p2 = P2.astype(jnp.float32).reshape(n, 16).T  # (16, N)
    out = pl.pallas_call(
        _dlt_kernel,
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        interpret=interpret,
    )(px, p1, p2)
    return out.T


def use_pallas_dlt() -> bool:
    """Trace-time switch (SLAMTPU_PALLAS_DLT=1; TPU, or interpreter under SLAMTPU_PALLAS_INTERPRET=1)."""
    if os.environ.get("SLAMTPU_PALLAS_DLT") != "1":
        return False
    # TPU only — except under the explicit SLAMTPU_PALLAS_INTERPRET test
    # override, which runs the kernels in interpreter mode so CPU e2e
    # tests can exercise the full gated configuration.
    if os.environ.get("SLAMTPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu"
