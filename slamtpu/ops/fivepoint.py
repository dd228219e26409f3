"""Nister five-point essential-matrix minimal solver, batched for TPU.

Replaces the 8-point minimal solver inside the essential RANSAC for the
reference's `five_point_ransac` call sites (front_end.jl:305): the 8-point
system is degenerate when the scene is planar (the dominant-ground-plane
regime of KITTI's mono bootstrap), while 5-point handles planes up to the
standard twofold ambiguity.

Formulation (hidden-variable / polynomial pencil, Kukelova-style):
  1. The 5 epipolar constraints give a 4-dim null space of the 5x9 design
     matrix: E = x E1 + y E2 + z E3 + E4 (scale fixed on the E4 component).
     The null basis comes from block inverse iteration on A^T A
     (ops/smallalg.py) — no LAPACK.
  2. The 10 cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
     are expanded over the 20 monomials of degree <= 3 in (x, y, z) with a
     precomputed multiplication table — pure batched arithmetic.
  3. Hiding z: the equations become M(z) v = 0 with v the 10 monomials of
     (x, y) and M(z) = M0 + z M1 + z^2 M2 + z^3 M3. Roots are found by
     Gauss-Newton on the 10 constraints from EVERY start of a
     tan-substituted z grid covering all of R (root basins attract nearby
     starts, so even-multiplicity roots need no det-sign bracketing); each
     start's (x, y) is initialized from the null vector of M(z).
  4. Starts whose polished residuals vanish are accepted; every
     (hypothesis, root) pair yields an E candidate that the caller scores
     like any other RANSAC hypothesis.

Everything is f32, fixed-shape, and free of data-dependent control flow.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .smallalg import smallest_eigvec_psd

# ---------------------------------------------------------------------------
# Monomial bookkeeping (built once at import, host-side).
# Degree-1 basis: [x, y, z, 1]; degree <= 3 basis: all (a, b, c) exponent
# triples with a + b + c <= 3, ordered deterministically.
# ---------------------------------------------------------------------------

_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_DEG3 = [
    (a, b, c)
    for a in range(4)
    for b in range(4 - a)
    for c in range(4 - a - b)
]
_DEG3_INDEX = {m: i for i, m in enumerate(_DEG3)}
N3 = len(_DEG3)  # 20

# Multiplication tables: product index of basis monomials.
_MUL11 = np.zeros((4, 4), np.int32)          # deg1 x deg1 -> deg<=2 in deg3
for i, mi in enumerate(_DEG1):
    for j, mj in enumerate(_DEG1):
        s = tuple(np.add(mi, mj))
        _MUL11[i, j] = _DEG3_INDEX[s]
_MUL31 = np.full((N3, 4), -1, np.int32)      # deg<=2 x deg1 -> deg<=3
for i, mi in enumerate(_DEG3):
    if sum(mi) > 2:
        continue
    for j, mj in enumerate(_DEG1):
        s = tuple(np.add(mi, mj))
        _MUL31[i, j] = _DEG3_INDEX[s]

# Hidden-variable layout: v = monomials of (x, y) with degree <= 3
# [x^3, x^2 y, x y^2, y^3, x^2, x y, y^2, x, y, 1]; each deg3 monomial
# (a, b, c) maps to column index of x^a y^b and z-power c.
_XY = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
       (1, 0), (0, 1), (0, 0)]
_XY_INDEX = {m: i for i, m in enumerate(_XY)}
_COL = np.array([_XY_INDEX[(a, b)] for (a, b, c) in _DEG3], np.int32)
_ZPOW = np.array([c for (a, b, c) in _DEG3], np.int32)

# Monomial exponents as arrays (for evaluation and derivatives).
_EXP = np.array(_DEG3, np.int64)  # (N3, 3)

# Derivative tables: d(x^a y^b z^c)/dvar = coef * monomial(index).
def _deriv_table(var: int):
    idx = np.zeros(N3, np.int64)
    coef = np.zeros(N3, np.float32)
    for t, m in enumerate(_DEG3):
        if m[var] > 0:
            lower = list(m)
            lower[var] -= 1
            idx[t] = _DEG3_INDEX[tuple(lower)]
            coef[t] = m[var]
    return idx, coef


_DIDX = [_deriv_table(v)[0] for v in range(3)]
_DCOEF = [_deriv_table(v)[1] for v in range(3)]


# Scatter matrices: outer-product coefficient pairs -> monomial bins, so a
# polynomial product is ONE reshape + ONE matmul (the at[].add loop version
# emitted ~100 scatter ops per product and blew the trace up to multi-minute
# remote compiles).
_S11 = np.zeros((16, N3), np.float32)
for i in range(4):
    for j in range(4):
        _S11[i * 4 + j, _MUL11[i, j]] = 1.0
_S31 = np.zeros((N3 * 4, N3), np.float32)
for i in range(N3):
    if _MUL31[i, 0] < 0:
        continue
    for j in range(4):
        _S31[i * 4 + j, _MUL31[i, j]] = 1.0


def _mul_d1(p, q):
    """(..., 4) x (..., 4) -> (..., N3): product of degree-1 polys."""
    outer = (p[..., :, None] * q[..., None, :]).reshape(p.shape[:-1] + (16,))
    return outer @ jnp.asarray(_S11)


def _mul_d2_d1(p, q):
    """(..., N3 deg<=2) x (..., 4) -> (..., N3)."""
    outer = (p[..., :, None] * q[..., None, :]).reshape(
        p.shape[:-1] + (N3 * 4,)
    )
    return outer @ jnp.asarray(_S31)


def _orthonormalize_rows(B):
    """Modified Gram-Schmidt over the leading axis-1 rows of (M, K, D)."""
    K = B.shape[1]
    for i in range(K):
        vi = B[:, i]
        for j in range(i):
            vj = B[:, j]
            vi = vi - jnp.sum(vi * vj, -1, keepdims=True) * vj
        vi = vi / jnp.maximum(jnp.linalg.norm(vi, axis=-1, keepdims=True),
                              1e-30)
        B = B.at[:, i].set(vi)
    return B


def _null_basis_4(A, iters: int = 4):
    """(M, 5, 9) -> (M, 4, 9) orthonormal basis of the null space of A via
    BLOCK inverse iteration on A^T A (sequential deflation loses ~1e-3 of
    the subspace on ill-conditioned samples; iterating the whole 4-block
    with re-orthonormalization recovers f32-accurate spans)."""
    from .smallalg import solve_psd

    G = jnp.einsum("mij,mik->mjk", A, A)  # (M, 9, 9) PSD, rank 5
    scale = jnp.maximum(jnp.einsum("mii->m", G) / 9.0, 1e-30)
    Gs = G / scale[:, None, None] + 1e-6 * jnp.eye(9, dtype=G.dtype)
    B = jnp.broadcast_to(
        jnp.eye(4, 9, dtype=G.dtype)[None]
        + 0.01 * jnp.arange(36, dtype=G.dtype).reshape(1, 4, 9),
        (A.shape[0], 4, 9),
    )
    B = _orthonormalize_rows(B)
    for _ in range(iters):
        # One inverse-power step per basis vector (shared factor shape).
        B = jax.vmap(lambda b: solve_psd(Gs, b), in_axes=1, out_axes=1)(B)
        B = _orthonormalize_rows(B)
    return B


def _eval_monomials(x, y, z):
    """(...,) coords -> (..., N3) monomial values x^a y^b z^c."""
    xs = jnp.stack([jnp.ones_like(x), x, x * x, x * x * x], -1)
    ys = jnp.stack([jnp.ones_like(y), y, y * y, y * y * y], -1)
    zs = jnp.stack([jnp.ones_like(z), z, z * z, z * z * z], -1)
    return (
        xs[..., _EXP[:, 0]] * ys[..., _EXP[:, 1]] * zs[..., _EXP[:, 2]]
    )


def _polish_roots(Q, x, y, z, iters: int = 4):
    """Gauss-Newton on the 10 cubic constraints r_i = Q_i . mono(x, y, z)
    (the f32 det-sign bisection localizes roots only to the noise plateau;
    a few GN steps recover minimal-solver accuracy). Q: (M, 10, N3);
    x, y, z: (M, R)."""
    from .smallalg import inv3x3

    for _ in range(iters):
        mono = _eval_monomials(x, y, z)                       # (M, R, N3)
        r = jnp.einsum("min,mrn->mri", Q, mono)               # (M, R, 10)
        dm = [
            mono[..., _DIDX[v]] * jnp.asarray(_DCOEF[v]) for v in range(3)
        ]
        Jx = jnp.einsum("min,mrn->mri", Q, dm[0])
        Jy = jnp.einsum("min,mrn->mri", Q, dm[1])
        Jz = jnp.einsum("min,mrn->mri", Q, dm[2])
        J = jnp.stack([Jx, Jy, Jz], axis=-1)                  # (M, R, 10, 3)
        H = jnp.einsum("mria,mrib->mrab", J, J)
        g = jnp.einsum("mria,mri->mra", J, r)
        Hinv, _ = inv3x3(
            H + 1e-8 * jnp.eye(3, dtype=jnp.float32)
        )
        step = jnp.einsum("mrab,mrb->mra", Hinv, g)
        step = jnp.clip(step, -0.5, 0.5)
        x = x - step[..., 0]
        y = y - step[..., 1]
        z = z - step[..., 2]
    return x, y, z


@functools.partial(jax.jit, static_argnames=("grid", "bisect_iters"))
def five_point_candidates(pd1, pd2, *, grid: int = 64,
                          bisect_iters: int = 12):
    """Minimal 5-point solve for M hypotheses.

    pd1, pd2: (M, 5, 2) normalized (x, y) correspondences.
    Returns (E (M, R, 3, 3), valid (M, R)) candidate essential matrices,
    R = grid - 1 root slots (at most 10 real roots exist; spare slots are
    marked invalid).
    """
    with jax.default_matmul_precision("float32"):
        return _five_point_impl(pd1, pd2, grid=grid,
                                bisect_iters=bisect_iters)


def _five_point_impl(pd1, pd2, *, grid, bisect_iters):
    # NOTE: all dots here run under float32 matmul precision — the default
    # bf16 MXU rounding destroys the polynomial coefficients and the GN
    # polish (the CPU tests would pass while TPU silently degraded).
    M = pd1.shape[0]
    x1, y1 = pd1[..., 0], pd1[..., 1]
    x2, y2 = pd2[..., 0], pd2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (M, 5, 9)
    B = _null_basis_4(A)                      # (M, 4, 9)
    Eb = B.reshape(M, 4, 3, 3)

    # Entries of E as degree-1 polys over [x, y, z, 1]: (M, 3, 3, 4).
    Ep = jnp.moveaxis(Eb, 1, -1)

    # det(E) = e00 (e11 e22 - e12 e21) - e01 (e10 e22 - e12 e20)
    #        + e02 (e10 e21 - e11 e20): degree-3 poly (M, N3).
    def minor(i0, i1, j0, j1):
        return _mul_d1(Ep[:, i0, j0], Ep[:, i1, j1]) - _mul_d1(
            Ep[:, i0, j1], Ep[:, i1, j0]
        )

    det_poly = (
        _mul_d2_d1(minor(1, 2, 1, 2), Ep[:, 0, 0])
        - _mul_d2_d1(minor(1, 2, 0, 2), Ep[:, 0, 1])
        + _mul_d2_d1(minor(1, 2, 0, 1), Ep[:, 0, 2])
    )

    # EE^T entries (degree 2): (M, 3, 3, N3).
    EEt = jnp.zeros((M, 3, 3, N3), jnp.float32)
    for i in range(3):
        for j in range(3):
            s = jnp.zeros((M, N3), jnp.float32)
            for k in range(3):
                s = s + _mul_d1(Ep[:, i, k], Ep[:, j, k])
            EEt = EEt.at[:, i, j].set(s)
    trace = EEt[:, 0, 0] + EEt[:, 1, 1] + EEt[:, 2, 2]

    # 2 EE^T E - tr E, entry (i, j): degree 3 -> 9 equations (M, N3).
    eqs = [det_poly]
    for i in range(3):
        for j in range(3):
            s = jnp.zeros((M, N3), jnp.float32)
            for k in range(3):
                s = s + _mul_d2_d1(2.0 * EEt[:, i, k], Ep[:, k, j])
            s = s - _mul_d2_d1(trace, Ep[:, i, j])
            eqs.append(s)
    Q = jnp.stack(eqs, axis=1)  # (M, 10, N3)
    # Normalize equation rows (scale-invariant residual tolerance below).
    Q = Q / jnp.maximum(
        jnp.linalg.norm(Q, axis=-1, keepdims=True), 1e-30
    )

    # Pencil M(z): scatter monomial coefficients by (z-power, xy-column).
    Ms = jnp.zeros((M, 4, 10, 10), jnp.float32)
    for t in range(N3):
        Ms = Ms.at[:, int(_ZPOW[t]), :, int(_COL[t])].add(Q[:, :, t])

    # Gauss-Newton from EVERY z grid start (z = tan(phi) covers all of R):
    # root basins attract nearby starts, so no sign-change bracketing is
    # needed — even-multiplicity roots (no det sign flip) are found too.
    phis = jnp.linspace(-1.5307961, 1.5307961, grid)
    z0 = jnp.broadcast_to(jnp.tan(0.5 * (phis[:-1] + phis[1:])),
                          (M, grid - 1))

    # (x, y) init per start from the null vector of M(z).
    zp = jnp.stack([jnp.ones_like(z0), z0, z0 ** 2, z0 ** 3], -1)
    Mz = jnp.einsum("mrp,mpij->mrij", zp, Ms)                 # (M, R, 10, 10)
    Mz = Mz / jnp.maximum(
        jnp.linalg.norm(Mz, axis=-1, keepdims=True), 1e-30
    )
    v = smallest_eigvec_psd(jnp.einsum("mrji,mrjk->mrik", Mz, Mz))
    w = v[..., 9]
    safe_w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    x = v[..., 7] / safe_w
    y = v[..., 8] / safe_w
    x, y, z = _polish_roots(Q, x, y, z0, iters=bisect_iters)

    # Converged roots: all 10 normalized constraints near zero.
    mono = _eval_monomials(x, y, z)
    r = jnp.einsum("min,mrn->mri", Q, mono)
    mscale = 1.0 + jnp.abs(x) ** 3 + jnp.abs(y) ** 3 + jnp.abs(z) ** 3
    res_ok = jnp.max(jnp.abs(r), axis=-1) < 1e-3 * mscale

    coef = jnp.stack([x, y, z, jnp.ones_like(x)], axis=-1)    # (M, R, 4)
    E = jnp.einsum("mrp,mpij->mrij", coef, Eb)
    valid = res_ok & jnp.all(
        jnp.isfinite(E.reshape(E.shape[:2] + (9,))), -1
    )
    nrm = jnp.linalg.norm(E.reshape(E.shape[:2] + (9,)), axis=-1)
    E = E / jnp.maximum(nrm, 1e-30)[..., None, None]
    valid = valid & (nrm > 1e-12)
    return E, valid
