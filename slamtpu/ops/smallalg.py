"""Batched small-matrix linear algebra as pure elementwise/VPU arithmetic.

XLA's LAPACK-style primitives (`jnp.linalg.svd/eigh/inv/solve`) lower to
iterative decompositions that serialize badly on TPU for large batches of
tiny matrices (measured 3-6 ms per call at (1024, 4, 4) on a v5e, ~100x the
roofline). Every routine here is closed-form or a fixed-iteration scheme
built from elementwise ops and tiny matmuls, so XLA fuses the whole batch
into a handful of VPU passes.

Used by the RANSAC solvers (ops/mvg.py, ops/pnp.py) and the BA Schur steps
(ops/ba.py) that replace the reference's LAPACK/LSMR calls
(RecoverPose.jl GEEV4x4Cache, LeastSquaresOptim LM+LSMR).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def smallest_eigvec_psd(M, iters: int = 8):
    """Unit eigenvector of the smallest eigenvalue of symmetric PSD M.

    M: (..., k, k). Inverse iteration on (M + eps*scale*I) with the solve as
    an unrolled batched Cholesky — pure elementwise arithmetic, no LAPACK
    primitives. The target eigenvalue of the null-vector systems this serves
    (DLT A^T A, 8-point A^T A) is ~0, so convergence is
    (lambda_min + eps) / (lambda_2 + eps) per step: a handful of iterations
    reach f32 precision. Ill-conditioned gaps (near-equal smallest
    eigenvalues) return a vector in the near-null subspace, which downstream
    RANSAC scoring / triangulation gates treat the same way the reference
    treats a noisy eigenvector.
    """
    # A batched Pallas kernel (k <= 12) existed behind SLAMTPU_PALLAS_EIG
    # but measured neutral on device (round-4 A/B) and was deleted.
    k = M.shape[-1]
    scale = jnp.maximum(
        jnp.einsum("...ii->...", M) / k, 1e-30
    )  # mean diagonal
    Ms = M / scale[..., None, None] + 1e-5 * jnp.eye(k, dtype=M.dtype)
    v0 = 1.0 + 0.1 * jnp.arange(k, dtype=M.dtype)
    v = jnp.broadcast_to(v0, M.shape[:-1])
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def body(_, v):
        v = solve_psd(Ms, v)
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
        )

    return jax.lax.fori_loop(0, iters, body, v)


def inv3x3(A, eps: float = 1e-30):
    """Closed-form adjugate inverse of (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = -(d * i - f * g)
    co02 = d * h - e * g
    det = a * co00 + b * co01 + c * co02
    safe = jnp.where(jnp.abs(det) < eps, eps, det)
    adj = jnp.stack(
        [
            jnp.stack([co00, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([co01, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([co02, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / safe[..., None, None], det


def det3x3(A):
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def polar_rotation3x3(H, iters: int = 12):
    """Orthogonal polar factor of (..., 3, 3) via the Newton iteration
    X <- (X + X^-T) / 2 (Higham), batched with the adjugate inverse.

    For det(H) > 0 this is the rotation nearest H (the Kabsch solution when
    H is the correlation matrix). Returns (R, det_H); callers must treat
    det_H <= 0 (reflection / degenerate sample) as invalid.
    """
    det = det3x3(H)
    # Scale toward unit spectral radius for fast Newton convergence.
    n1 = jnp.max(jnp.sum(jnp.abs(H), axis=-2), axis=-1)
    ninf = jnp.max(jnp.sum(jnp.abs(H), axis=-1), axis=-1)
    s = jnp.sqrt(jnp.maximum(n1 * ninf, 1e-30))
    X = H / s[..., None, None]

    def body(_, X):
        Xi, d = inv3x3(X)
        # Guard singular iterates (degenerate H): freeze instead of NaN.
        ok = (jnp.abs(d) > 1e-20)[..., None, None]
        return jnp.where(ok, 0.5 * (X + jnp.swapaxes(Xi, -1, -2)), X)

    R = jax.lax.fori_loop(0, iters, body, X)
    return R, det


def solve_psd(A, b, eps: float = 1e-12):
    """Solve A x = b for symmetric positive-definite A via batched Cholesky
    built from static-k loops of masked VECTOR ops (k unrolled steps, not
    k^2 scalar ops — a fully scalar unroll at k=48 emits ~30k HLO ops and
    stalls the compiler). A: (..., k, k), b: (..., k)."""
    k = A.shape[-1]
    idx = jnp.arange(k)
    L = jnp.zeros_like(A)
    for j in range(k):
        # s_i = A[i, j] - sum_m L[i, m] L[j, m]  (columns >= j still zero).
        s = A[..., :, j] - jnp.einsum("...im,...m->...i", L, L[..., j, :])
        d = jnp.sqrt(jnp.maximum(s[..., j], eps))
        col = jnp.where(idx >= j, s / d[..., None], 0.0)
        L = L.at[..., :, j].set(col)
    # Forward substitution L y = b.
    y = jnp.zeros_like(b)
    for i in range(k):
        yi = (b[..., i] - jnp.einsum("...m,...m->...", L[..., i, :], y)) \
            / L[..., i, i]
        y = y.at[..., i].set(yi)
    # Back substitution L^T x = y.
    x = jnp.zeros_like(b)
    for i in reversed(range(k)):
        xi = (y[..., i] - jnp.einsum("...m,...m->...", L[..., :, i], x)) \
            / L[..., i, i]
        x = x.at[..., i].set(xi)
    return x


