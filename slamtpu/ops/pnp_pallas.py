"""Fused Pallas PnP refinement: the whole two-phase LM loop in one launch.

ops/pnp.py::pnp_refine runs 5 + 10 damped-LM iterations as a fori_loop whose
body is ~25 XLA ops (analytic Jacobian + a 6x6 Cholesky solve built from 18
unrolled masked-vector steps). On the tunnel backend in-program op overhead
makes that chain ~10+ ms of every tracked frame (front_end.jl:168-218 runs
it per frame). This kernel runs the identical algorithm VMEM-resident in a
single launch: residuals/Jacobian as lane-major (1, N) vector ops, the
normal equations as one (6, 2N) @ (2N, 6) MXU dot at HIGHEST precision, and
the damped 6x6 solve as fully scalar unrolled Cholesky + substitution
(~120 scalar ops — free inside a kernel, poison as separate XLA ops).

Same contract as pnp_refine (reference bundle_adjustment.jl:113-171):
phase 1 -> depth/squared-reprojection outlier gate -> phase 2 with outliers
zeroed. Not bit-exact with the XLA path (dot/reduction orders differ), so
LM accept decisions can flip on exact cost ties; parity tests bound the
final pose instead (tests/test_pnp_pallas.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve6(h, g, lam):
    """Solve (H + lam diag(H) + 1e-9 I) x = g for the 6x6 normal equations,
    fully scalar (h: dict (i, j) -> scalar for i >= j, g: list of 6
    scalars). Returns the 6 solution scalars. Mirrors
    ops/smallalg.py::solve_psd's Cholesky up to summation order."""
    hd = {}
    for i in range(6):
        for j in range(i + 1):
            v = h[(i, j)]
            if i == j:
                v = v + lam * h[(i, i)] + 1e-9
            hd[(i, j)] = v
    L = {}
    for j in range(6):
        s = hd[(j, j)]
        for m in range(j):
            s = s - L[(j, m)] * L[(j, m)]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[(j, j)] = d
        for i in range(j + 1, 6):
            s = hd[(i, j)]
            for m in range(j):
                s = s - L[(i, m)] * L[(j, m)]
            L[(i, j)] = s / d
    y = []
    for i in range(6):
        s = g[i]
        for m in range(i):
            s = s - L[(i, m)] * y[m]
        y.append(s / L[(i, i)])
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for m in range(i + 1, 6):
            s = s - L[(m, i)] * x[m]
        x[i] = s / L[(i, i)]
    return x


def _pnp_kernel(pts_ref, pix_ref, w_ref, th_ref, intr_ref,
                theta_out, scal_out, outl_out, *,
                iters1, iters2, repr_eps, depth_eps):
    X0 = pts_ref[0:1, :]
    X1 = pts_ref[1:2, :]
    X2 = pts_ref[2:3, :]
    py = pix_ref[0:1, :]
    px = pix_ref[1:2, :]
    w0 = w_ref[0:1, :]
    fy = intr_ref[0, 1]
    fx = intr_ref[0, 0]
    cy = intr_ref[0, 3]
    cx = intr_ref[0, 2]

    def rot(th):
        a, b, c = th[0], th[1], th[2]
        ca, sa = jnp.cos(a), jnp.sin(a)
        cb, sb = jnp.cos(b), jnp.sin(b)
        cc, sc = jnp.cos(c), jnp.sin(c)
        # R = Rz(a) Ry(b) Rx(c)  (ops/se3.py::rot_zyx)
        return (
            (ca * cb, ca * sb * sc - sa * cc, ca * sb * cc + sa * sc),
            (sa * cb, sa * sb * sc + ca * cc, sa * sb * cc - ca * sc),
            (-sb, cb * sc, cb * cc),
        )

    def forward(th):
        """Returns (pc0, pc1, z, ry, rx) as (1, N) rows, residuals
        UNweighted (pixel - projection), plus R and v rows for the
        Jacobian."""
        R = rot(th)
        v0 = R[0][0] * X0 + R[0][1] * X1 + R[0][2] * X2
        v1 = R[1][0] * X0 + R[1][1] * X1 + R[1][2] * X2
        v2 = R[2][0] * X0 + R[2][1] * X1 + R[2][2] * X2
        pc0 = v0 + th[3]
        pc1 = v1 + th[4]
        pc2 = v2 + th[5]
        z = jnp.where(jnp.abs(pc2) < 1e-12, 1e-12, pc2)
        ry = py - (fy * pc1 / z + cy)
        rx = px - (fx * pc0 / z + cx)
        return R, (v0, v1, v2), (pc0, pc1, pc2), z, ry, rx

    def cost_of(th, w):
        _, _, _, _, ry, rx = forward(th)
        return jnp.sum(jnp.square(ry * w)) + jnp.sum(jnp.square(rx * w))

    def lm_phase(th, w, iters):
        lam = jnp.float32(1e-3)
        cost = cost_of(th, w)
        for _ in range(iters):
            R, v, pc, z, ry, rx = forward(th)
            iz = 1.0 / z
            izy = pc[1] * iz * iz
            izx = pc[0] * iz * iz
            a = th[0]
            ca, sa = jnp.cos(a), jnp.sin(a)
            # d(pc)/dtheta_k columns (ops/pnp.py::_pnp_jacobian).
            zero = jnp.zeros_like(z)
            one = jnp.ones_like(z)
            cols = (
                (-v[1], v[0], zero),
                (ca * v[2], sa * v[2], -sa * v[1] - ca * v[0]),
                (R[0][1] * (-X2) + R[0][2] * X1,
                 R[1][1] * (-X2) + R[1][2] * X1,
                 R[2][1] * (-X2) + R[2][2] * X1),
                (one, zero, zero),
                (zero, one, zero),
                (zero, zero, one),
            )
            Jy = [(-fy) * (d1 * iz - izy * d2) * w for (d0, d1, d2) in cols]
            Jx = [(-fx) * (d0 * iz - izx * d2) * w for (d0, d1, d2) in cols]
            # Normal equations on the MXU: (6, 2N) @ (2N, 6) and (6, 2N) r.
            Ja = jnp.concatenate(
                [jnp.concatenate([Jy[k], Jx[k]], axis=1) for k in range(6)],
                axis=0,
            )
            rw = jnp.concatenate([ry * w, rx * w], axis=1)  # (1, 2N)
            H = jax.lax.dot_general(
                Ja, Ja, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            gv = jax.lax.dot_general(
                Ja, rw, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            h = {(i, j): H[i, j] for i in range(6) for j in range(i + 1)}
            g = [gv[k, 0] for k in range(6)]
            step = _chol_solve6(h, g, lam)
            cand = tuple(th[k] - step[k] for k in range(6))
            new_cost = cost_of(cand, w)
            accept = new_cost < cost
            th = tuple(jnp.where(accept, cand[k], th[k]) for k in range(6))
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.clip(
                jnp.where(accept, lam * 0.1, lam * 10.0), 1e-8, 1e8
            )
        return th, cost

    th0 = tuple(th_ref[0, k] for k in range(6))
    initial_error = cost_of(th0, w0)

    th1, _ = lm_phase(th0, w0, iters1)

    # Outlier gate between phases (bundle_adjustment.jl:152: SQUARED norm).
    _, _, pc, _, ry, rx = forward(th1)
    sq = ry * ry + rx * rx
    outl = ((pc[2] < depth_eps) | (sq > repr_eps)) & (w0 > 0)
    w2 = w0 * (1.0 - outl.astype(jnp.float32))

    th2, final_cost = lm_phase(th1, w2, iters2)

    theta_out[...] = jnp.concatenate(
        [jnp.stack([th2[k] for k in range(6)]), jnp.zeros(2, jnp.float32)]
    ).reshape(1, 8)
    scal_out[...] = jnp.stack(
        [initial_error, final_cost, jnp.sum(outl.astype(jnp.float32)),
         0.0, 0.0, 0.0, 0.0, 0.0]
    ).reshape(1, 8)
    outl_out[...] = outl.astype(jnp.float32)


def pnp_refine_pallas(theta0, points, pixels_yx, valid, intrinsics, *,
                      iters1: int = 5, iters2: int = 10,
                      repr_eps: float = 3.0, depth_eps: float = 1e-6,
                      interpret: bool | None = None):
    """Drop-in for ops/pnp.py::pnp_refine (same arguments/return dict)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = points.shape[0]
    pts = points.astype(jnp.float32).T                      # (3, N)
    pix = pixels_yx.astype(jnp.float32).T                   # (2, N)
    w = valid.astype(jnp.float32).reshape(1, n)
    th = jnp.concatenate(
        [theta0.astype(jnp.float32), jnp.zeros(2, jnp.float32)]
    ).reshape(1, 8)
    intr = jnp.concatenate(
        [intrinsics.astype(jnp.float32), jnp.zeros(4, jnp.float32)]
    ).reshape(1, 8)

    kernel = functools.partial(
        _pnp_kernel, iters1=iters1, iters2=iters2,
        repr_eps=float(repr_eps), depth_eps=float(depth_eps),
    )
    theta8, scal, outl = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(pts, pix, w, th, intr)
    return {
        "theta": theta8[0, :6],
        "initial_error": scal[0, 0],
        "final_error": scal[0, 1],
        "outliers": (outl[0] > 0) & valid,
        "n_outliers": scal[0, 2].astype(jnp.int32),
    }


def use_pallas_pnp() -> bool:
    """Trace-time switch (SLAMTPU_PALLAS_PNP=1; TPU, or interpreter under SLAMTPU_PALLAS_INTERPRET=1)."""
    if os.environ.get("SLAMTPU_PALLAS_PNP") != "1":
        return False
    # TPU only — except under the explicit SLAMTPU_PALLAS_INTERPRET test
    # override, which runs the kernels in interpreter mode so CPU e2e
    # tests can exercise the full gated configuration.
    if os.environ.get("SLAMTPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu"
