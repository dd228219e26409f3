"""Perspective-n-Point: hypothesis-parallel P3P RANSAC and dense LM pose
refinement.

TPU-native replacement for RecoverPose.jl `p3p_ransac` (reference
front_end.jl:164) and `pnp_bundle_adjustment` (bundle_adjustment.jl:113-171).

P3P uses Grunert's formulation: the two elimination equations are combined
into a quartic in v = s3/s1 whose coefficients are built by POLYNOMIAL
CONVOLUTION (no hand-derived coefficient tables), solved in closed form
(Ferrari + trigonometric cubic) with Newton polish — fully batched, no
eigendecomposition (jnp.linalg.eig is unavailable on TPU). Each real root
yields camera-frame distances -> 3-point Kabsch absolute orientation. All
M x 4 candidate poses are scored against all points in parallel; the best
pose by inlier count wins (reprojection threshold in pixels, matching the
reference's max_reprojection_error semantics, front_end.jl:166).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .smallalg import solve_psd


# ---------------------------------------------------------------------------
# Closed-form polynomial roots (batched, f32 + Newton polish).
# ---------------------------------------------------------------------------

def _cubic_max_real_root(b, c, d):
    """Largest real root of x^3 + b x^2 + c x + d (batched scalars)."""
    p = c - b * b / 3.0
    q = 2.0 * b ** 3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # One real root (disc > 0): Cardano.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    root_single = u + v

    # Three real roots (disc <= 0): trigonometric method.
    pm = jnp.minimum(p, -1e-12)
    m = 2.0 * jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (pm * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    ks = jnp.arange(3, dtype=jnp.float32) * (2.0 * jnp.pi / 3.0)
    roots3 = m[..., None] * jnp.cos(theta[..., None] - ks)
    root_tri = jnp.max(roots3, axis=-1)

    t = jnp.where(disc > 0, root_single, root_tri)
    return t - b / 3.0


def solve_quartic(c4, c3, c2, c1, c0, polish_iters: int = 8):
    """Real roots of c4 x^4 + ... + c0 (batched scalars).

    Returns (roots (..., 4), valid (..., 4)). Invalid slots are masked.
    """
    lead = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
    a = c3 / lead
    b = c2 / lead
    c = c1 / lead
    d = c0 / lead
    # Depressed quartic y^4 + p y^2 + q y + r with x = y - a/4.
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a ** 3 / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a ** 4 / 256.0

    # Resolvent cubic m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0; m > 0 factors
    # the quartic into two quadratics.
    m = _cubic_max_real_root(p, p * p / 4.0 - r, -q * q / 8.0)
    m = jnp.maximum(m, 1e-10)
    s = jnp.sqrt(2.0 * m)
    qn = q / (2.0 * s)

    # Quadratics y^2 + s y + (p/2 + m - qn) and y^2 - s y + (p/2 + m + qn).
    def quad_roots(B, C):
        disc = B * B - 4.0 * C
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (-B + sq) / 2.0, (-B - sq) / 2.0, ok

    y1, y2, ok_a = quad_roots(s, p / 2.0 + m - qn)
    y3, y4, ok_b = quad_roots(-s, p / 2.0 + m + qn)
    roots = jnp.stack([y1, y2, y3, y4], axis=-1) - (a / 4.0)[..., None]
    valid = jnp.stack([ok_a, ok_a, ok_b, ok_b], axis=-1)

    # Newton polish on the original quartic (fixes f32 closed-form error).
    def poly(x):
        return (((c4[..., None] * x + c3[..., None]) * x + c2[..., None]) * x
                + c1[..., None]) * x + c0[..., None]

    def dpoly(x):
        return ((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x
                + 2.0 * c2[..., None]) * x + c1[..., None]

    for _ in range(polish_iters):
        f = poly(roots)
        df = dpoly(roots)
        step = f / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        roots = roots - jnp.clip(step, -1.0, 1.0)

    return roots, valid


# ---------------------------------------------------------------------------
# Grunert P3P minimal solver (batched over hypotheses).
# ---------------------------------------------------------------------------

def _p3p_grunert(X, f):
    """X: (M, 3, 3) world points; f: (M, 3, 3) unit bearing vectors.

    Returns candidate poses R (M, 4, 3, 3), t (M, 4, 3), valid (M, 4),
    mapping world -> camera (Y = R X + t).
    """
    X1, X2, X3 = X[:, 0], X[:, 1], X[:, 2]
    f1, f2, f3 = f[:, 0], f[:, 1], f[:, 2]

    a2 = jnp.sum((X2 - X3) ** 2, axis=-1)
    b2 = jnp.sum((X1 - X3) ** 2, axis=-1)
    c2 = jnp.sum((X1 - X2) ** 2, axis=-1)
    b2s = jnp.where(b2 < 1e-12, 1e-12, b2)
    A = a2 / b2s
    C = c2 / b2s
    ca = jnp.sum(f2 * f3, axis=-1)  # cos(alpha), opposite side a
    cb = jnp.sum(f1 * f3, axis=-1)  # cos(beta),  opposite side b
    cg = jnp.sum(f1 * f2, axis=-1)  # cos(gamma), opposite side c

    # Elimination:  u = N(v) / D(v) with
    #   N(v) = (A - C - 1) v^2 - 2 cb (A - C) v + (A - C + 1)
    #   D(v) = 2 (cg - v ca)
    # substituted into  u^2 + 1 - 2 u cg - C (1 + v^2 - 2 v cb) = 0
    # multiplied by D^2:  N^2 - 2 cg N D + (1 - C - C v^2 + 2 C cb v) D^2 = 0.
    n2 = A - C - 1.0
    n1 = -2.0 * cb * (A - C)
    n0 = A - C + 1.0
    d1 = -2.0 * ca
    d0 = 2.0 * cg

    # N^2 (degree 4).
    q4 = n2 * n2
    q3 = 2.0 * n2 * n1
    q2 = n1 * n1 + 2.0 * n2 * n0
    q1 = 2.0 * n1 * n0
    q0 = n0 * n0
    # -2 cg N D (degree 3): N * D = convolution.
    nd3 = n2 * d1
    nd2 = n2 * d0 + n1 * d1
    nd1 = n1 * d0 + n0 * d1
    nd0 = n0 * d0
    q3 = q3 - 2.0 * cg * nd3
    q2 = q2 - 2.0 * cg * nd2
    q1 = q1 - 2.0 * cg * nd1
    q0 = q0 - 2.0 * cg * nd0
    # (e2 v^2 + e1 v + e0) * D^2 with e2 = -C, e1 = 2 C cb, e0 = 1 - C.
    e2, e1, e0 = -C, 2.0 * C * cb, 1.0 - C
    dd2 = d1 * d1
    dd1 = 2.0 * d1 * d0
    dd0 = d0 * d0
    q4 = q4 + e2 * dd2
    q3 = q3 + e2 * dd1 + e1 * dd2
    q2 = q2 + e2 * dd0 + e1 * dd1 + e0 * dd2
    q1 = q1 + e1 * dd0 + e0 * dd1
    q0 = q0 + e0 * dd0

    v_roots, v_ok = solve_quartic(q4, q3, q2, q1, q0)  # (M, 4)

    v = v_roots
    Dv = d0[..., None] + d1[..., None] * v
    Nv = (n2[..., None] * v + n1[..., None]) * v + n0[..., None]
    u = Nv / jnp.where(jnp.abs(Dv) < 1e-9, 1e-9, Dv)

    denom = 1.0 + v * v - 2.0 * v * cb[..., None]
    s1 = jnp.sqrt(b2s[..., None] / jnp.maximum(denom, 1e-12))
    s2 = u * s1
    s3 = v * s1
    valid = (
        v_ok & (v > 1e-6) & (u > 1e-6)
        & (denom > 1e-9) & jnp.isfinite(s1) & (s1 > 1e-9)
    )

    # Camera-frame points -> absolute orientation by TRIAD alignment: P3P
    # distances make the 3-point correspondence exact (up to quartic-root
    # noise), so aligning the orthonormal frames built from each point
    # triangle is the exact rotation — closed form, fully batched (the
    # SVD-Kabsch this replaces serialized ~100x off the roofline on TPU;
    # note a 3-point centered correlation is rank-2, so a polar/Newton
    # orthogonalization cannot be used here).
    Y = (
        jnp.stack([s1, s2, s3], axis=-1)[..., None]  # (M, 4, 3, 1)
        * f[:, None, :, :]                           # (M, 1, 3, 3)
    )  # (M, 4, 3pts, 3)
    Xb = jnp.broadcast_to(X[:, None], Y.shape)

    def triad(Pts):
        a = Pts[..., 1, :] - Pts[..., 0, :]
        b = Pts[..., 2, :] - Pts[..., 0, :]
        na = jnp.linalg.norm(a, axis=-1, keepdims=True)
        e1 = a / jnp.maximum(na, 1e-12)
        b_perp = b - jnp.sum(b * e1, axis=-1, keepdims=True) * e1
        nb = jnp.linalg.norm(b_perp, axis=-1, keepdims=True)
        e2 = b_perp / jnp.maximum(nb, 1e-12)
        e3 = jnp.cross(e1, e2)
        ok = (na[..., 0] > 1e-9) & (nb[..., 0] > 1e-9)
        return jnp.stack([e1, e2, e3], axis=-1), ok  # (..., 3, 3) columns

    Ex, okx = triad(Xb)
    Fy, oky = triad(Y)
    R = jnp.einsum("mkij,mklj->mkil", Fy, Ex)  # F E^T
    valid = valid & okx & oky
    t = jnp.mean(Y, axis=-2) - jnp.einsum(
        "mkij,mkj->mki", R, jnp.mean(Xb, axis=-2)
    )
    return R, t, valid


@functools.partial(jax.jit, static_argnames=("hypotheses", "threshold"))
def p3p_ransac(points3d, pixels_xy, bearings, valid, n, intrinsics, key, *,
               hypotheses: int = 256, threshold: float = 3.0):
    """P3P RANSAC (reference front_end.jl:164 p3p_ransac call contract).

    points3d: (N, 3) world points; pixels_xy: (N, 2) undistorted pixels
    (x, y); bearings: (N, 3) unit camera rays; valid/n: mask + count;
    intrinsics: (4,) (fx, fy, cx, cy).

    Returns dict: cw (4, 4) world->camera, inliers (N,), n_inliers,
    avg_error (mean inlier reprojection error).
    """
    del n  # sampling is mask-driven (no argsort compaction needed)
    from .mvg import sample_valid_indices

    M = hypotheses
    idx = sample_valid_indices(key, valid, (M, 3))
    # A Pallas kernel for the hypothesis algebra existed behind
    # SLAMTPU_PALLAS_P3P but measured neutral on device (round-4 A/B)
    # and was deleted.
    R, t, ok = _p3p_grunert(points3d[idx], bearings[idx])  # (M,4,...)

    Rf = R.reshape(-1, 3, 3)
    tf = t.reshape(-1, 3)
    okf = ok.reshape(-1)

    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]

    def score(Rc, tc, okc):
        pc = points3d @ Rc.T + tc
        z = pc[:, 2]
        px = jnp.stack(
            [fx * pc[:, 0] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + cx,
             fy * pc[:, 1] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + cy],
            axis=-1,
        )
        err = jnp.linalg.norm(px - pixels_xy, axis=-1)
        inl = (err < threshold) & (z > 0) & valid
        cnt = jnp.where(okc, jnp.sum(inl), -1)
        return cnt, inl, err

    counts, inls, errs = jax.vmap(score)(Rf, tf, okf)
    best = jnp.argmax(counts)
    inliers = inls[best]
    n_inl = jnp.maximum(counts[best], 0)
    avg_error = jnp.sum(jnp.where(inliers, errs[best], 0.0)) / jnp.maximum(
        n_inl, 1
    )
    cw = jnp.eye(4, dtype=jnp.float32)
    cw = cw.at[:3, :3].set(Rf[best]).at[:3, 3].set(tf[best])
    return {
        "cw": cw,
        "inliers": inliers,
        "n_inliers": n_inl,
        "avg_error": avg_error,
    }


# ---------------------------------------------------------------------------
# Dense 6-DoF LM refinement (reference pnp_bundle_adjustment,
# bundle_adjustment.jl:113-171): Euler-ZYX pose, two-phase outlier scheme.
# ---------------------------------------------------------------------------

from .se3 import rot_zyx  # noqa: E402


def _pnp_residuals(theta, points, pixels_yx, intrinsics):
    """(N, 2) residuals pixel_yx - project(R(theta) X + t), (y, x) order."""
    R = rot_zyx(theta[:3])
    pc = points @ R.T + theta[3:]
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-12, 1e-12, pc[:, 2])
    fy_, fx_ = intrinsics[1], intrinsics[0]
    cy_, cx_ = intrinsics[3], intrinsics[2]
    proj = jnp.stack(
        [fy_ * pc[:, 1] / z + cy_, fx_ * pc[:, 0] / z + cx_], axis=-1
    )
    return pixels_yx - proj, pc[:, 2]


def _pnp_jacobian(theta, points, weights, intrinsics):
    """Analytic (N, 2, 6) Jacobian of the weighted residuals wrt theta.

    Replaces the jacfwd in the LM loop (a 6-tangent JVP re-evaluation of
    the whole residual chain per iteration, ~3x the op count). With
    R = Rz(a) Ry(b) Rx(c):
      dR/da = skew(ez) R          (so d(pc)/da = ez x v, v = R X)
      dR/db = skew(Rz ey) R       (Rz Sy Rz^T = skew(Rz ey))
      dR/dc = R skew(ex)          (so d(pc)/dc = R (ex x X))
    and d(pc)/dt = I; the projection rows are the standard pinhole
    derivatives. Verified against jax.jacfwd in tests/test_mvg.py.
    """
    a = theta[0]
    ca, sa = jnp.cos(a), jnp.sin(a)
    R = rot_zyx(theta[:3])
    v = points @ R.T                        # (N, 3) = R X
    pc = v + theta[3:]
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-12, 1e-12, pc[:, 2])

    # d(pc)/dtheta_k, k = a, b, c: (N, 3) each.
    da = jnp.stack([-v[:, 1], v[:, 0], jnp.zeros_like(z)], axis=-1)
    db = jnp.stack(
        [ca * v[:, 2], sa * v[:, 2], -sa * v[:, 1] - ca * v[:, 0]], axis=-1
    )
    exX = jnp.stack(
        [jnp.zeros_like(z), -points[:, 2], points[:, 1]], axis=-1
    )
    dc = exX @ R.T
    # (N, 3, 6): columns a, b, c, tx, ty, tz.
    n = points.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), (n, 3, 3))
    dpc = jnp.concatenate(
        [da[:, :, None], db[:, :, None], dc[:, :, None], eye], axis=-1
    )

    # Projection rows (residual = pixel - proj -> negate).
    fy_, fx_ = intrinsics[1], intrinsics[0]
    iz = 1.0 / z
    iz2_y = pc[:, 1] * iz * iz
    iz2_x = pc[:, 0] * iz * iz
    # row y: -fy * ( dpc_y/z - pc_y dpc_z / z^2 )
    Jy = -fy_ * (dpc[:, 1, :] * iz[:, None] - iz2_y[:, None] * dpc[:, 2, :])
    Jx = -fx_ * (dpc[:, 0, :] * iz[:, None] - iz2_x[:, None] * dpc[:, 2, :])
    return jnp.stack([Jy, Jx], axis=1) * weights[:, None, None]


def _lm_loop(theta0, points, pixels_yx, weights, intrinsics, iters):
    """Fixed-iteration damped LM on the 6-DoF pose."""

    def cost_fn(theta):
        r, _ = _pnp_residuals(theta, points, pixels_yx, intrinsics)
        r = r * weights[:, None]
        return jnp.sum(r * r), r

    def body(_, carry):
        theta, lam, cost = carry
        r, _ = _pnp_residuals(theta, points, pixels_yx, intrinsics)
        r = r * weights[:, None]
        J = _pnp_jacobian(theta, points, weights, intrinsics)
        H = jnp.einsum("nij,nik->jk", J, J)
        g = jnp.einsum("nij,ni->j", J, r)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        step = -solve_psd(Hd, g)
        cand = theta + step
        new_cost, _ = cost_fn(cand)
        accept = new_cost < cost
        theta = jnp.where(accept, cand, theta)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        lam = jnp.clip(lam, 1e-8, 1e8)
        return theta, lam, cost

    cost0, _ = cost_fn(theta0)
    theta, _, cost = jax.lax.fori_loop(
        0, iters, body, (theta0, jnp.float32(1e-3), cost0)
    )
    return theta, cost


@functools.partial(
    jax.jit, static_argnames=("iters1", "iters2", "repr_eps", "depth_eps")
)
def pnp_refine(theta0, points, pixels_yx, valid, intrinsics, *,
               iters1: int = 5, iters2: int = 10, repr_eps: float = 3.0,
               depth_eps: float = 1e-6):
    """Two-phase LM PnP refinement (bundle_adjustment.jl:113-171).

    Phase 1 (iters1) -> outlier detection (depth < depth_eps or SQUARED
    pixel error > repr_eps — the reference compares the squared norm,
    bundle_adjustment.jl:152) -> phase 2 (iters2) with outliers zeroed.

    Returns dict: theta (6,), initial_error, final_error, outliers (N,),
    n_outliers.
    """
    # A whole-LM Pallas kernel existed behind SLAMTPU_PALLAS_PNP but
    # measured neutral on device (round-4 A/B) and was deleted.
    w = valid.astype(jnp.float32)
    r0, _ = _pnp_residuals(theta0, points, pixels_yx, intrinsics)
    initial_error = jnp.sum((r0 * w[:, None]) ** 2)

    theta1, _ = _lm_loop(theta0, points, pixels_yx, w, intrinsics, iters1)

    r1, z1 = _pnp_residuals(theta1, points, pixels_yx, intrinsics)
    sq = jnp.sum(r1 * r1, axis=-1)
    outliers = ((z1 < depth_eps) | (sq > repr_eps)) & valid
    w2 = w * (~outliers).astype(jnp.float32)

    theta2, final_cost = _lm_loop(
        theta1, points, pixels_yx, w2, intrinsics, iters2
    )
    return {
        "theta": theta2,
        "initial_error": initial_error,
        "final_error": final_cost,
        "outliers": outliers,
        "n_outliers": jnp.sum(outliers),
    }
