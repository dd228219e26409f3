"""Multiview geometry: batched DLT triangulation and hypothesis-parallel
essential-matrix RANSAC with pose recovery.

TPU-native replacement for RecoverPose.jl (`five_point_ransac`, `triangulate`
call sites: reference front_end.jl:305, mapper.jl:162,242). Design:
  - RANSAC evaluates ALL hypotheses in parallel (hypothesis axis x point
    axis) instead of sequential sampling — accuracy parity with the
    reference, not bitwise (SURVEY.md section 7 "hard parts").
  - The minimal solver is the normalized 8-point algorithm; with the dense
    tracked correspondences this pipeline feeds (hundreds of inliers) the
    essential estimate is equivalent at trajectory level. Scoring uses the
    Sampson distance in pixels with the same threshold
    (max_reprojection_error).
  - Hypothesis sampling draws directly from the valid mask via Gumbel-max
    (no argsort compaction — device sorts cost ~3-4 ms each).
  - All small-matrix decompositions (the reference reaches LAPACK GEEV via
    RecoverPose's GEEV4x4Cache) run as fixed-iteration batched arithmetic
    (ops/smallalg.py) — jnp.linalg.svd on tiny batched systems serializes
    ~100x off the roofline on TPU.
  - Cheirality resolution triangulates every candidate inlier against the 4
    (R, t) decompositions as one batched DLT solve.

Conventions: correspondence arrays are (x, y) ordered (like the reference's
RecoverPose inputs, front_end.jl:271-274); poses are 4x4 `prev -> cur`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .smallalg import polar_rotation3x3, smallest_eigvec_psd


def sample_valid_indices(key, valid, shape):
    """Uniform samples from the True entries of `valid` via Gumbel-max.

    valid: (N,) bool. Returns int32 indices of the requested shape. Each
    draw is an independent argmax over perturbed logits, so duplicates
    within a hypothesis are possible — matching `randint`-over-compacted
    sampling, which the degenerate-hypothesis scoring already tolerates.
    """
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, shape + valid.shape, dtype=jnp.float32)
    return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)


def triangulate_points(px1, px2, P1, P2):
    """Batched 2-view DLT triangulation.

    px1, px2: (N, 2) (x, y) image/normalized coordinates.
    P1, P2: (4, 4) or (N, 4, 4) projection matrices (rows 0..2 used).
    Returns (N, 4) homogeneous points (the unit null vectors of A).
    """
    # A Pallas null-vector kernel existed behind SLAMTPU_PALLAS_DLT but
    # measured neutral on device (round-4 A/B) and was deleted.
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
    # Row-normalize for conditioning, then take the least-squares null
    # vector of A^T A (the unit singular vector the reference obtains via
    # its 4x4 eigendecomposition).
    A = A / jnp.maximum(
        jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12
    )
    M = jnp.einsum("nij,nik->njk", A, A)
    return smallest_eigvec_psd(M)


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
    M9 = jnp.einsum("mij,mik->mjk", A, A)
    e = smallest_eigvec_psd(M9)           # (M, 9)
    E0 = e.reshape(-1, 3, 3)
    # Rank-2 projection: E - s3 u3 v3^T = E (I - v3 v3^T), with v3 the
    # smallest right singular vector (null direction of E^T E). Scoring is
    # scale-invariant, so the (1, 1, 0) singular-value normalization is
    # deferred to pose recovery of the winning hypothesis.
    S = jnp.einsum("mji,mjk->mik", E0, E0)
    v3 = smallest_eigvec_psd(S)           # (M, 3)
    return E0 - jnp.einsum(
        "mij,mj,mk->mik", E0, v3, v3
    )


@functools.partial(
    jax.jit, static_argnames=("hypotheses", "threshold", "five_point")
)
def essential_ransac(pd_prev, pd_cur, px_prev, px_cur, valid, n, intrinsics,
                     key, *, hypotheses: int = 256, threshold: float = 3.0,
                     five_point: bool = True):
    """Essential-matrix RANSAC + relative pose recovery.

    pd_prev/pd_cur: (N, 2) normalized (x, y) correspondences (prev/cur).
    px_prev/px_cur: (N, 2) undistorted pixel (x, y) coordinates for scoring.
    valid: (N,) bool; n: scalar int (number of valid entries — kept for API
        compatibility, sampling uses `valid` directly);
    intrinsics: (4,) (fx, fy, cx, cy); key: PRNG key.

    five_point=True (default): Nister 5-point minimal samples
    (ops/fivepoint.py, the reference's five_point_ransac contract,
    front_end.jl:305) — each sample contributes all its real-root E
    candidates as hypotheses. five_point=False: normalized 8-point
    (degenerate on planar scenes; kept for ablation).

    Returns dict with E (3, 3), pose (4, 4) prev->cur ([R|t], unit t),
    inliers (N,) bool, n_inliers scalar.
    """
    del n  # sampling is mask-driven
    if five_point:
        from .fivepoint import five_point_candidates

        M5 = max(hypotheses // 8, 16)
        idx = sample_valid_indices(key, valid, (M5, 5))
        Ec, ok_c = five_point_candidates(
            pd_prev[idx], pd_cur[idx], grid=32
        )
        E = Ec.reshape(-1, 3, 3)
        hyp_ok = ok_c.reshape(-1)
    else:
        M = hypotheses
        idx = sample_valid_indices(key, valid, (M, 8))
        E = _essential_from_8pt(pd_prev[idx], pd_cur[idx])  # (M, 3, 3)
        hyp_ok = jnp.ones((M,), bool)

    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    iK = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    iK = iK.at[0, 0].set(1.0 / fx).at[1, 1].set(1.0 / fy)
    iK = iK.at[0, 2].set(-cx / fx).at[1, 2].set(-cy / fy)
    F = jnp.einsum("ji,mjk,kl->mil", iK, E, iK)  # iK^T E iK per hypothesis

    err = jax.vmap(lambda f: _sampson_px(f, px_prev, px_cur))(F)  # (M, N)
    inl = (err < threshold) & valid[None, :]
    counts = jnp.where(hyp_ok, jnp.sum(inl, axis=1), -1)
    best = jnp.argmax(counts)
    inliers0 = inl[best] & hyp_ok[best]

    # Least-squares polish on the winning hypothesis's inliers (all-inlier
    # 8-point refit), then rescore — tightens the minimal-sample estimate
    # before pose recovery.
    x1c, y1c = pd_prev[:, 0], pd_prev[:, 1]
    x2c, y2c = pd_cur[:, 0], pd_cur[:, 1]
    Afull = jnp.stack(
        [x2c * x1c, x2c * y1c, x2c, y2c * x1c, y2c * y1c, y2c, x1c, y1c,
         jnp.ones_like(x1c)], axis=-1
    ) * inliers0[:, None].astype(jnp.float32)  # (N, 9)
    M9 = Afull.T @ Afull
    e = smallest_eigvec_psd(M9[None])[0]
    E_ls = e.reshape(3, 3)
    S_ls = E_ls.T @ E_ls
    v3 = smallest_eigvec_psd(S_ls[None])[0]
    E_ls = E_ls - (E_ls @ v3)[:, None] * v3[None, :]
    F_ls = iK.T @ E_ls @ iK
    err_ls = _sampson_px(F_ls, px_prev, px_cur)
    inl_ls = (err_ls < threshold) & valid
    # Keep the polished model only if it does not lose inliers (guards
    # against degenerate refits on near-planar inlier sets).
    use_ls = jnp.sum(inl_ls) >= jnp.sum(inliers0)
    E_best = jnp.where(use_ls, E_ls, E[best])
    inliers = jnp.where(use_ls, inl_ls, inliers0)
    n_inliers = jnp.sum(inliers)

    # Pose recovery: Horn's closed-form decomposition (E = [t]x R =>
    # |t|^2 R = cof(E) - [t]x E) instead of an SVD: the baseline direction
    # is the left null vector of E (inverse iteration), the two rotations
    # come from +-t, and a polar Newton polish absorbs the noise-induced
    # non-orthogonality (~1e-2 for 8-point estimates). 4 candidate
    # decompositions, cheirality vote over inliers.
    En = E_best * jnp.sqrt(2.0) / jnp.maximum(
        jnp.linalg.norm(E_best), 1e-12
    )
    t = smallest_eigvec_psd(En @ En.T)

    def skew(v):
        z = jnp.zeros_like(v[0])
        return jnp.array(
            [[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]]
        )

    # cof(E) computed directly from row cross products (E is rank-2, so an
    # adjugate-from-inverse route is invalid): cof rows are the cyclic
    # cross products of E's rows.
    r0, r1, r2 = En[0], En[1], En[2]
    cofE = jnp.stack(
        [jnp.cross(r1, r2), jnp.cross(r2, r0), jnp.cross(r0, r1)]
    )
    R1, _ = polar_rotation3x3(cofE - skew(t) @ En)
    R2, _ = polar_rotation3x3(cofE + skew(t) @ En)
    cand_R = jnp.stack([R1, R1, R2, R2])          # (4, 3, 3)
    cand_t = jnp.stack([t, -t, t, -t])            # (4, 3)

    # One batched DLT over all 4 candidate poses x N points.
    N = pd_prev.shape[0]
    eye34 = jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                             jnp.zeros((3, 1), jnp.float32)], axis=1)
    P1 = jnp.concatenate([eye34, jnp.array([[0, 0, 0, 1]], jnp.float32)], 0)
    P2c = jnp.concatenate([cand_R, cand_t[..., None]], axis=-1)  # (4, 3, 4)
    P2c = jnp.concatenate(
        [P2c, jnp.broadcast_to(jnp.array([[[0, 0, 0, 1]]], jnp.float32),
                               (4, 1, 4))], axis=1
    )  # (4, 4, 4)
    pd1_r = jnp.broadcast_to(pd_prev, (4, N, 2)).reshape(4 * N, 2)
    pd2_r = jnp.broadcast_to(pd_cur, (4, N, 2)).reshape(4 * N, 2)
    P2_r = jnp.repeat(P2c, N, axis=0)  # (4N, 4, 4)
    X = triangulate_points(pd1_r, pd2_r, P1, P2_r).reshape(4, N, 4)
    Xc = X[..., :3] / jnp.where(
        jnp.abs(X[..., 3:]) < 1e-12, 1e-12, X[..., 3:]
    )
    z1 = Xc[..., 2]
    z2 = (
        jnp.einsum("kij,knj->kni", cand_R, Xc) + cand_t[:, None, :]
    )[..., 2]
    votes = jnp.sum((z1 > 0) & (z2 > 0) & inliers[None, :], axis=1)
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
