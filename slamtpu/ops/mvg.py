"""Multiview geometry: batched DLT triangulation and hypothesis-parallel
essential-matrix RANSAC with pose recovery.

TPU-native replacement for RecoverPose.jl (`five_point_ransac`, `triangulate`
call sites: reference front_end.jl:305, mapper.jl:162,242). Design:
  - RANSAC evaluates ALL hypotheses in parallel (hypothesis axis x point
    axis) instead of sequential sampling — accuracy parity with the
    reference, not bitwise (SURVEY.md section 7 "hard parts").
  - The minimal solver is the normalized 8-point algorithm (batched SVD on
    the MXU) rather than Nister's 5-point; with the dense tracked
    correspondences this pipeline feeds (hundreds of inliers) the essential
    estimate is equivalent at trajectory level. Scoring uses the Sampson
    distance in pixels with the same threshold (max_reprojection_error).
  - Cheirality resolution triangulates every candidate inlier against the 4
    (R, t) decompositions as one batched DLT solve.

Conventions: correspondence arrays are (x, y) ordered (like the reference's
RecoverPose inputs, front_end.jl:271-274); poses are 4x4 `prev -> cur`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def triangulate_points(px1, px2, P1, P2):
    """Batched 2-view DLT triangulation.

    px1, px2: (N, 2) (x, y) image/normalized coordinates.
    P1, P2: (4, 4) or (N, 4, 4) projection matrices (rows 0..2 used).
    Returns (N, 4) homogeneous points (the unit null vectors of A).
    """
    if P1.ndim == 2:
        P1 = jnp.broadcast_to(P1, (px1.shape[0], 4, 4))
    if P2.ndim == 2:
        P2 = jnp.broadcast_to(P2, (px2.shape[0], 4, 4))
    x1, y1 = px1[:, 0:1], px1[:, 1:2]
    x2, y2 = px2[:, 0:1], px2[:, 1:2]
    rows = [
        x1 * P1[:, 2] - P1[:, 0],
        y1 * P1[:, 2] - P1[:, 1],
        x2 * P2[:, 2] - P2[:, 0],
        y2 * P2[:, 2] - P2[:, 1],
    ]
    A = jnp.stack(rows, axis=1)  # (N, 4, 4)
    _, _, vh = jnp.linalg.svd(A)
    return vh[:, -1, :]


def _sampson_px(F, px1, px2):
    """Sampson distance in pixels. px: (N, 2) (x, y)."""
    ones = jnp.ones_like(px1[:, :1])
    x1 = jnp.concatenate([px1, ones], axis=-1)  # (N, 3)
    x2 = jnp.concatenate([px2, ones], axis=-1)
    Fx1 = x1 @ F.T        # (N, 3)
    Ftx2 = x2 @ F         # (N, 3)
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return jnp.sqrt(num / jnp.maximum(den, 1e-12))


def _essential_from_8pt(pd1, pd2):
    """(M, 8, 2) normalized correspondences -> (M, 3, 3) essential matrices."""
    x1, y1 = pd1[..., 0], pd1[..., 1]
    x2, y2 = pd2[..., 0], pd2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (M, 8, 9)
    _, _, vh = jnp.linalg.svd(A)
    E0 = vh[:, -1, :].reshape(-1, 3, 3)
    # Project onto the essential manifold: singular values (1, 1, 0).
    u, _, vt = jnp.linalg.svd(E0)
    d = jnp.zeros_like(E0).at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    return u @ d @ vt


@functools.partial(jax.jit, static_argnames=("hypotheses", "threshold"))
def essential_ransac(pd_prev, pd_cur, px_prev, px_cur, valid, n, intrinsics,
                     key, *, hypotheses: int = 256, threshold: float = 3.0):
    """Essential-matrix RANSAC + relative pose recovery.

    pd_prev/pd_cur: (N, 2) normalized (x, y) correspondences (prev/cur).
    px_prev/px_cur: (N, 2) undistorted pixel (x, y) coordinates for scoring.
    valid: (N,) bool; n: scalar int (number of valid entries, compacted at
        the front); intrinsics: (4,) (fx, fy, cx, cy); key: PRNG key.

    Returns dict with E (3, 3), pose (4, 4) prev->cur ([R|t], unit t),
    inliers (N,) bool, n_inliers scalar.
    """
    N = pd_prev.shape[0]
    M = hypotheses
    idx = jax.random.randint(key, (M, 8), 0, jnp.maximum(n, 1))
    E = _essential_from_8pt(pd_prev[idx], pd_cur[idx])  # (M, 3, 3)

    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    iK = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    iK = iK.at[0, 0].set(1.0 / fx).at[1, 1].set(1.0 / fy)
    iK = iK.at[0, 2].set(-cx / fx).at[1, 2].set(-cy / fy)
    F = jnp.einsum("ji,mjk,kl->mil", iK, E, iK)  # iK^T E iK per hypothesis

    err = jax.vmap(lambda f: _sampson_px(f, px_prev, px_cur))(F)  # (M, N)
    inl = (err < threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    E_best = E[best]
    inliers = inl[best]
    n_inliers = counts[best]

    # Pose recovery: 4 decompositions, cheirality vote over inliers.
    u, _, vt = jnp.linalg.svd(E_best)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  jnp.float32)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    cand_R = jnp.stack([R1, R1, R2, R2])          # (4, 3, 3)
    cand_t = jnp.stack([t, -t, t, -t])            # (4, 3)

    eye34 = jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                             jnp.zeros((3, 1), jnp.float32)], axis=1)
    P1 = jnp.concatenate([eye34, jnp.array([[0, 0, 0, 1]], jnp.float32)], 0)

    def cheirality(Rt):
        R, tt = Rt
        P2 = jnp.concatenate(
            [jnp.concatenate([R, tt[:, None]], axis=1),
             jnp.array([[0, 0, 0, 1]], jnp.float32)], 0)
        X = triangulate_points(pd_prev, pd_cur, P1, P2)  # (N, 4)
        Xc = X[:, :3] / jnp.where(jnp.abs(X[:, 3:]) < 1e-12, 1e-12, X[:, 3:])
        z1 = Xc[:, 2]
        z2 = (Xc @ R.T + tt)[:, 2]
        good = (z1 > 0) & (z2 > 0) & inliers
        return jnp.sum(good)

    votes = jax.vmap(cheirality)((cand_R, cand_t))
    k = jnp.argmax(votes)
    R, tt = cand_R[k], cand_t[k]
    pose = jnp.eye(4, dtype=jnp.float32)
    pose = pose.at[:3, :3].set(R).at[:3, 3].set(tt)
    return {
        "E": E_best,
        "pose": pose,
        "inliers": inliers,
        "n_inliers": n_inliers,
    }


@jax.jit
def triangulate_batch(px1, px2, P1, P2):
    """Jitted wrapper used by the mapper (P1/P2 (4, 4), px (N, 2) (x, y))."""
    return triangulate_points(px1, px2, P1, P2)
