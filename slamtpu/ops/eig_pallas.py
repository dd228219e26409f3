"""Batched smallest-eigenvector (inverse iteration) as one Pallas launch.

smallalg.smallest_eigvec_psd unrolls 8 inverse iterations of a k x k
Cholesky solve into ~30 * k serialized XLA ops — at k=9 (the 8-point
essential systems, 128-hypothesis batches) that is ~240 ops of per-op
backend overhead per call, several times per tracked frame
(ops/mvg.py::essential_ransac). This kernel runs the identical arithmetic
lane-major (one lane per batch element) in a single VMEM-resident launch,
factoring the constant shifted system once.

Gate: SLAMTPU_PALLAS_EIG=1, applied inside smallalg.smallest_eigvec_psd for
batched k <= 12 systems. Parity: tests/test_pnp_pallas.py +
tests/test_tpu_smoke.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _eig_kernel(m_ref, out_ref, *, k, iters):
    def getm(i, j):
        a, b = (i, j) if i <= j else (j, i)
        r = a * k + b
        return m_ref[r:r + 1, :]

    # Scale + regularize exactly like smallalg.smallest_eigvec_psd.
    tr = getm(0, 0)
    for i in range(1, k):
        tr = tr + getm(i, i)
    scale = jnp.maximum(tr / k, 1e-30)

    ms = {}
    for i in range(k):
        for j in range(i, k):
            v = getm(i, j) / scale
            if i == j:
                v = v + 1e-5
            ms[(i, j)] = v

    def gets(i, j):
        return ms[(i, j)] if i <= j else ms[(j, i)]

    # Lane-batched Cholesky (smallalg.solve_psd arithmetic, factored ONCE —
    # the shifted system is constant across iterations).
    L = {}
    for j in range(k):
        s = gets(j, j)
        for t in range(j):
            s = s - L[(j, t)] * L[(j, t)]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[(j, j)] = d
        for i in range(j + 1, k):
            s = gets(i, j)
            for t in range(j):
                s = s - L[(i, t)] * L[(j, t)]
            L[(i, j)] = s / d

    v0 = 1.0 + 0.1 * np.arange(k, dtype=np.float32)
    v0 = v0 / np.sqrt(np.sum(v0 * v0))
    v = [jnp.full_like(scale, float(v0[i])) for i in range(k)]
    for _ in range(iters):
        y = []
        for i in range(k):
            s = v[i]
            for t in range(i):
                s = s - L[(i, t)] * y[t]
            y.append(s / L[(i, i)])
        w = [None] * k
        for i in reversed(range(k)):
            s = y[i]
            for t in range(i + 1, k):
                s = s - L[(t, i)] * w[t]
            w[i] = s / L[(i, i)]
        nrm = w[0] * w[0]
        for i in range(1, k):
            nrm = nrm + w[i] * w[i]
        nrm = jnp.maximum(jnp.sqrt(nrm), 1e-30)
        v = [t / nrm for t in w]

    out_ref[...] = jnp.concatenate(v, axis=0)


def smallest_eigvec_pallas(M, iters: int = 8, *,
                           interpret: bool | None = None):
    """M (N, k, k) symmetric PSD -> (N, k) unit near-null vectors; same
    contract as smallalg.smallest_eigvec_psd (batched form)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, k, _ = M.shape
    m = M.astype(jnp.float32).reshape(n, k * k).T       # (k*k, N)
    out = pl.pallas_call(
        functools.partial(_eig_kernel, k=k, iters=iters),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32),
        interpret=interpret,
    )(m)
    return out.T


def use_pallas_eig() -> bool:
    """Trace-time switch (SLAMTPU_PALLAS_EIG=1; TPU, or interpreter under SLAMTPU_PALLAS_INTERPRET=1)."""
    if os.environ.get("SLAMTPU_PALLAS_EIG") != "1":
        return False
    # TPU only — except under the explicit SLAMTPU_PALLAS_INTERPRET test
    # override, which runs the kernels in interpreter mode so CPU e2e
    # tests can exercise the full gated configuration.
    if os.environ.get("SLAMTPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu"
