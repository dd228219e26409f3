"""Pallas Grunert P3P minimal solver (hypothesis algebra in one launch).

ops/pnp.py::_p3p_grunert + solve_quartic run ~160 serialized XLA ops of
(M,)-wide batched scalar algebra per tracked frame (M = 128 RANSAC
hypotheses) — per-op backend overhead, microseconds of arithmetic. This
kernel runs the identical formulas lane-major (hypotheses on lanes) in one
VMEM launch: quartic resolvent + Newton polish, side ratios, and the TRIAD
absolute orientation, emitting the (M, 4) candidate poses. The candidate
SCORING stays in XLA (a batched MXU matmul over all points — already one
fused op chain).

Gate: SLAMTPU_PALLAS_P3P=1 (ops/pnp.py::p3p_ransac). Parity:
tests/test_pnp_pallas.py; reference contract: front_end.jl:164.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _acos(x):
    """acos on [-1, 1] via Abramowitz-Stegun 4.4.46 (|err| <= 2e-8):
    acos(y) = sqrt(1 - y) * P7(y) for y in [0, 1], reflected for y < 0."""
    y = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * y + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - y, 0.0)) * p
    return jnp.where(x < 0, jnp.float32(np.pi) - r, r)


def _cbrt(x):
    ax = jnp.maximum(jnp.abs(x), 1e-30)
    return jnp.sign(x) * jnp.exp(jnp.log(ax) / 3.0)


def _cubic_max_real_root(b, c, d):
    """Largest real root of x^3 + b x^2 + c x + d (ops/pnp.py:31-53,
    lane-major)."""
    p = c - b * b / 3.0
    q = 2.0 * b * b * b / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    root_single = _cbrt(-q / 2.0 + sq) + _cbrt(-q / 2.0 - sq)

    pm = jnp.minimum(p, -1e-12)
    m = 2.0 * jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (pm * m), -1.0, 1.0)
    # Mosaic lowers neither acos nor atan2; use the Abramowitz-Stegun
    # 4.4.46 polynomial (|err| <= 2e-8 < f32 eps; the quartic roots are
    # Newton-polished downstream, which absorbs it entirely).
    theta = _acos(arg) / 3.0
    root_tri = None
    for k in range(3):
        r = m * jnp.cos(theta - k * (2.0 * jnp.pi / 3.0))
        root_tri = r if root_tri is None else jnp.maximum(root_tri, r)

    t = jnp.where(disc > 0, root_single, root_tri)
    return t - b / 3.0


def _solve_quartic_rows(c4, c3, c2, c1, c0, polish_iters=8):
    """Real roots of the lane-batched quartic (ops/pnp.py:56-105): returns
    4 (root, ok) pairs of (1, M) rows."""
    lead = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
    a = c3 / lead
    b = c2 / lead
    c = c1 / lead
    d = c0 / lead
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a * a * a / 8.0
    r = (d - a * c / 4.0 + a * a * b / 16.0
         - 3.0 * (a * a) * (a * a) / 256.0)

    m = _cubic_max_real_root(p, p * p / 4.0 - r, -q * q / 8.0)
    m = jnp.maximum(m, 1e-10)
    s = jnp.sqrt(2.0 * m)
    qn = q / (2.0 * s)

    def quad_roots(B, C):
        disc = B * B - 4.0 * C
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (-B + sq) / 2.0, (-B - sq) / 2.0, ok

    y1, y2, ok_a = quad_roots(s, p / 2.0 + m - qn)
    y3, y4, ok_b = quad_roots(-s, p / 2.0 + m + qn)
    roots = [y1 - a / 4.0, y2 - a / 4.0, y3 - a / 4.0, y4 - a / 4.0]
    valid = [ok_a, ok_a, ok_b, ok_b]

    for i in range(4):
        x = roots[i]
        for _ in range(polish_iters):
            f = (((c4 * x + c3) * x + c2) * x + c1) * x + c0
            df = ((4.0 * c4 * x + 3.0 * c3) * x + 2.0 * c2) * x + c1
            step = f / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
            x = x - jnp.clip(step, -1.0, 1.0)
        roots[i] = x
    return roots, valid


def _triad_rows(P):
    """P: dict (point, coord) -> (1, M) rows for 3 points. Returns the
    orthonormal frame columns e1, e2, e3 (each a 3-list of rows) and an ok
    row (ops/pnp.py::triad)."""
    a = [P[(1, c)] - P[(0, c)] for c in range(3)]
    b = [P[(2, c)] - P[(0, c)] for c in range(3)]
    na = jnp.sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2])
    e1 = [t / jnp.maximum(na, 1e-12) for t in a]
    dot = b[0] * e1[0] + b[1] * e1[1] + b[2] * e1[2]
    bp = [b[c] - dot * e1[c] for c in range(3)]
    nb = jnp.sqrt(bp[0] * bp[0] + bp[1] * bp[1] + bp[2] * bp[2])
    e2 = [t / jnp.maximum(nb, 1e-12) for t in bp]
    e3 = [
        e1[1] * e2[2] - e1[2] * e2[1],
        e1[2] * e2[0] - e1[0] * e2[2],
        e1[0] * e2[1] - e1[1] * e2[0],
    ]
    ok = (na > 1e-9) & (nb > 1e-9)
    return e1, e2, e3, ok


def _p3p_kernel(x_ref, f_ref, r_out, t_out, ok_out):
    """x, f: (9, M) — rows 3*i + c = world point / bearing i coord c.
    r_out (36, M): root k rows [9k, 9k+9) row-major R; t_out (12, M);
    ok_out (4, M) f32."""
    X = {(i, c): x_ref[3 * i + c:3 * i + c + 1, :]
         for i in range(3) for c in range(3)}
    F = {(i, c): f_ref[3 * i + c:3 * i + c + 1, :]
         for i in range(3) for c in range(3)}

    def sq3(d):
        return d[0] * d[0] + d[1] * d[1] + d[2] * d[2]

    d23 = [X[(1, c)] - X[(2, c)] for c in range(3)]
    d13 = [X[(0, c)] - X[(2, c)] for c in range(3)]
    d12 = [X[(0, c)] - X[(1, c)] for c in range(3)]
    a2 = sq3(d23)
    b2 = sq3(d13)
    c2 = sq3(d12)
    b2s = jnp.where(b2 < 1e-12, 1e-12, b2)
    A = a2 / b2s
    C = c2 / b2s
    ca = F[(1, 0)] * F[(2, 0)] + F[(1, 1)] * F[(2, 1)] + F[(1, 2)] * F[(2, 2)]
    cb = F[(0, 0)] * F[(2, 0)] + F[(0, 1)] * F[(2, 1)] + F[(0, 2)] * F[(2, 2)]
    cg = F[(0, 0)] * F[(1, 0)] + F[(0, 1)] * F[(1, 1)] + F[(0, 2)] * F[(1, 2)]

    # Elimination polynomial (ops/pnp.py:131-166, identical algebra).
    n2 = A - C - 1.0
    n1 = -2.0 * cb * (A - C)
    n0 = A - C + 1.0
    d1 = -2.0 * ca
    d0 = 2.0 * cg
    q4 = n2 * n2
    q3 = 2.0 * n2 * n1
    q2 = n1 * n1 + 2.0 * n2 * n0
    q1 = 2.0 * n1 * n0
    q0 = n0 * n0
    nd3 = n2 * d1
    nd2 = n2 * d0 + n1 * d1
    nd1 = n1 * d0 + n0 * d1
    nd0 = n0 * d0
    q3 = q3 - 2.0 * cg * nd3
    q2 = q2 - 2.0 * cg * nd2
    q1 = q1 - 2.0 * cg * nd1
    q0 = q0 - 2.0 * cg * nd0
    e2, e1_, e0 = -C, 2.0 * C * cb, 1.0 - C
    dd2 = d1 * d1
    dd1 = 2.0 * d1 * d0
    dd0 = d0 * d0
    q4 = q4 + e2 * dd2
    q3 = q3 + e2 * dd1 + e1_ * dd2
    q2 = q2 + e2 * dd0 + e1_ * dd1 + e0 * dd2
    q1 = q1 + e1_ * dd0 + e0 * dd1
    q0 = q0 + e0 * dd0

    roots, valids = _solve_quartic_rows(q4, q3, q2, q1, q0)

    # World-frame triad: shared by all roots.
    ex1, ex2, ex3, okx = _triad_rows(X)
    mx = [(X[(0, c)] + X[(1, c)] + X[(2, c)]) / 3.0 for c in range(3)]

    for k in range(4):
        v = roots[k]
        v_ok = valids[k]
        Dv = d0 + d1 * v
        Nv = (n2 * v + n1) * v + n0
        u = Nv / jnp.where(jnp.abs(Dv) < 1e-9, 1e-9, Dv)
        denom = 1.0 + v * v - 2.0 * v * cb
        s1 = jnp.sqrt(b2s / jnp.maximum(denom, 1e-12))
        s2 = u * s1
        s3 = v * s1
        valid = (
            v_ok & (v > 1e-6) & (u > 1e-6)
            & (denom > 1e-9) & jnp.isfinite(s1) & (s1 > 1e-9)
        )

        s = (s1, s2, s3)
        Y = {(i, c): s[i] * F[(i, c)] for i in range(3) for c in range(3)}
        fy1, fy2, fy3, oky = _triad_rows(Y)
        valid = valid & okx & oky

        # R = Fy Ex^T: R[r][c] = sum_j fy_j[r] * ex_j[c].
        fy = (fy1, fy2, fy3)
        ex = (ex1, ex2, ex3)
        my = [(Y[(0, c)] + Y[(1, c)] + Y[(2, c)]) / 3.0 for c in range(3)]
        for rr in range(3):
            trow = my[rr]
            for cc in range(3):
                Rrc = (fy[0][rr] * ex[0][cc] + fy[1][rr] * ex[1][cc]
                       + fy[2][rr] * ex[2][cc])
                r_out[9 * k + 3 * rr + cc, :] = Rrc[0]
                trow = trow - Rrc * mx[cc]
            t_out[3 * k + rr, :] = trow[0]
        ok_out[k, :] = valid[0].astype(jnp.float32)


def p3p_grunert_pallas(X, f, *, interpret: bool | None = None):
    """Drop-in for ops/pnp.py::_p3p_grunert: X, f (M, 3, 3) ->
    R (M, 4, 3, 3), t (M, 4, 3), valid (M, 4)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = X.shape[0]
    xr = X.astype(jnp.float32).reshape(m, 9).T
    fr = f.astype(jnp.float32).reshape(m, 9).T
    r, t, ok = pl.pallas_call(
        _p3p_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((36, m), jnp.float32),
            jax.ShapeDtypeStruct((12, m), jnp.float32),
            jax.ShapeDtypeStruct((4, m), jnp.float32),
        ],
        interpret=interpret,
    )(xr, fr)
    R = r.T.reshape(m, 4, 3, 3)
    tt = t.T.reshape(m, 4, 3)
    return R, tt, ok.T > 0


def use_pallas_p3p() -> bool:
    """Trace-time switch (SLAMTPU_PALLAS_P3P=1)."""
    return os.environ.get("SLAMTPU_PALLAS_P3P") == "1"
