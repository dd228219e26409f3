"""Local bundle adjustment: fixed-sparsity Levenberg-Marquardt with the
camera-point Schur complement as block-batched matmuls.

TPU-native replacement for reference src/bundle_adjustment.jl:1-111. The
reference builds a colored sparse forward-diff Jacobian and runs LSMR inside
LeastSquaresOptim; here the sparsity is STRUCTURAL (every observation touches
exactly one pose block (2x6) and one point block (2x3)):

  - per-observation analytic Jacobians via vmapped jacfwd (the natural JAX
    idiom replacing SparseDiffTools coloring, SURVEY.md section 2.2);
  - U (pose blocks), V (point blocks), W (cross terms) accumulated with
    segment_sum; the reduced camera system S = U - W V^-1 W^T is a <= 6P x 6P
    dense solve (P <= window size, reference estimator.jl:328-331 caps the
    window at 5 keyframes);
  - damped LM accept/reject loop under lax.fori_loop, all on device;
  - two-phase outlier scheme preserved: phase-1 iterations, outlier flagging
    (depth < 1e-6 or SQUARED pixel error > repr_eps — the reference compares
    the squared norm against repr_eps=5.0, bundle_adjustment.jl:90-111,
    default :3), then phase-2 ignoring outliers.

Pose parameterization: Euler ZYX + translation of `cw` (frame.jl:432-450),
constant poses contribute residuals but receive no updates (zeroed Jacobian,
mirroring bundle_adjustment.jl:76-80).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .se3 import rot_zyx
from .smallalg import inv3x3, solve_psd

# Max FREE (optimized) poses the Schur solve supports: the covisibility
# window is capped at ba_window=5 newest keyframes (reference
# estimator.jl:328-331); 8 leaves headroom. Constant observer poses beyond
# this are fine — they carry no pose Jacobian.
FREE_CAP = 8


def _residual_one(pose_theta, point, px_yx, intrinsics):
    """Single-observation reprojection residual (2,), (y, x) order."""
    R = rot_zyx(pose_theta[:3])
    pc = R @ point + pose_theta[3:]
    z = jnp.where(jnp.abs(pc[2]) < 1e-12, 1e-12, pc[2])
    fy, fx = intrinsics[1], intrinsics[0]
    cy, cx = intrinsics[3], intrinsics[2]
    proj = jnp.stack([fy * pc[1] / z + cy, fx * pc[0] / z + cx])
    return px_yx - proj, pc[2]


def _residuals_and_jacobians(poses, points, obs_pose, obs_point, obs_px,
                             weights, intrinsics):
    """All-observation residuals (O, 2), Jp (O, 2, 6), Jx (O, 2, 3)."""
    p_th = poses[obs_pose]
    x = points[obs_point]

    def rfun(theta, pt, px):
        r, _ = _residual_one(theta, pt, px, intrinsics)
        return r

    r, depth = jax.vmap(
        lambda th, pt, px: _residual_one(th, pt, px, intrinsics)
    )(p_th, x, obs_px)
    Jp = jax.vmap(jax.jacfwd(rfun, argnums=0))(p_th, x, obs_px)
    Jx = jax.vmap(jax.jacfwd(rfun, argnums=1))(p_th, x, obs_px)
    w = weights[:, None]
    return r * w, Jp * w[..., None], Jx * w[..., None], depth


def _cost(poses, points, obs_pose, obs_point, obs_px, weights, intrinsics):
    p_th = poses[obs_pose]
    x = points[obs_point]
    r, _ = jax.vmap(
        lambda th, pt, px: _residual_one(th, pt, px, intrinsics)
    )(p_th, x, obs_px)
    r = r * weights[:, None]
    return jnp.sum(r * r)


def _bucket_observations(obs_point, obs_valid, X: int, K: int):
    """(X, K) table of observation indices per point + slot validity.

    Each point is observed at most once per pose, so K = P is a hard bound.
    Built once per BA call with one device sort; replaces the per-iteration
    (X, O) @ (O, P*18) one-hot reduction for B — ~77 GFLOP and a 38 MB
    (O, P, 6, 3) intermediate per LM iteration at the production bucket
    (P=32, X=4096, O=16384) — with (X, K) gathers + a 300 MFLOP einsum.
    """
    O = obs_point.shape[0]
    # Padding rows sort to the end (point id X) and never enter a bucket.
    eff = jnp.where(obs_valid, obs_point, X).astype(jnp.int32)
    order = jnp.argsort(eff, stable=True)
    eff_sorted = eff[order]
    pts = jnp.arange(X, dtype=jnp.int32)
    starts = jnp.searchsorted(eff_sorted, pts, side="left")
    ends = jnp.searchsorted(eff_sorted, pts, side="right")
    counts = ends - starts
    k_idx = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    slot_valid = jnp.arange(K)[None, :] < counts[:, None]
    table = order[jnp.clip(k_idx, 0, O - 1)]
    return table, slot_valid


def _lm_rounds(poses, points, pose_free_mask, obs_pose, obs_point, obs_px,
               weights, intrinsics, iters, bucket):
    """Damped Schur-complement LM; returns updated (poses, points)."""
    P = poses.shape[0]
    X = points.shape[0]
    n6 = 6 * P

    free_p = pose_free_mask.astype(jnp.float32)          # (P,)
    free_flat = jnp.repeat(free_p, 6)                    # (6P,)
    # Pose reductions stay one-hot MXU matmuls ((O, P) is small); point
    # reductions go through the per-point observation buckets.
    pose_onehot = jax.nn.one_hot(obs_pose, P, dtype=jnp.float32)   # (O, P)
    table, slot_valid = bucket                           # (X, K) each
    slot_w = slot_valid.astype(jnp.float32)
    slot_pose = jax.nn.one_hot(
        obs_pose[table], P, dtype=jnp.float32
    ) * slot_w[..., None]                                # (X, K, P)

    def body(_, carry):
        poses, points, lam, cost = carry
        r, Jp, Jx, _ = _residuals_and_jacobians(
            poses, points, obs_pose, obs_point, obs_px, weights, intrinsics
        )
        # Constant poses: zero their pose Jacobian (still constrain points).
        Jp = Jp * free_p[obs_pose][:, None, None]

        JpJp = jnp.einsum("oia,oib->oab", Jp, Jp).reshape(-1, 36)
        U = (pose_onehot.T @ JpJp).reshape(P, 6, 6)
        JxJx = jnp.einsum("oia,oib->oab", Jx, Jx)        # (O, 3, 3)
        V = jnp.sum(JxJx[table] * slot_w[..., None, None], axis=1)
        A = jnp.einsum("oia,oib->oab", Jp, Jx)  # (O, 6, 3)
        # Per-point pose-block embedding from the buckets; HIGHEST keeps
        # the 0/1 placement from rounding A through bf16 (PERF.md
        # precision notes on BA one-hots).
        B = jnp.einsum(
            "xkp,xkab->xpab", slot_pose, A[table],
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(X, n6, 3)

        g_p = (
            pose_onehot.T @ jnp.einsum("oia,oi->oa", Jp, r)
        ).reshape(n6)
        Jxr = jnp.einsum("oia,oi->oa", Jx, r)            # (O, 3)
        g_x = jnp.sum(Jxr[table] * slot_w[..., None], axis=1)  # (X, 3)

        # Damping.
        eyeP = jnp.eye(6, dtype=jnp.float32)
        eyeX = jnp.eye(3, dtype=jnp.float32)
        U_d = U + lam * U * eyeP + 1e-8 * eyeP
        V_d = V + lam * V * eyeX + 1e-8 * eyeX
        V_inv, _ = inv3x3(V_d)  # batched closed form (smallalg.py)

        # Reduced camera system S dp = rhs. Constant poses have zero pose
        # Jacobians, so S genuinely lives on the FREE poses only — and the
        # caller orders free poses first (estimator.py), so the solve runs
        # on a fixed leading block of 6 * FREE_CAP rows regardless of how
        # many constant observer poses pad out P (the unrolled-Cholesky
        # cost and compile time stay constant as the map grows).
        S = jax.scipy.linalg.block_diag(*[U_d[i] for i in range(P)])
        S = S - jnp.einsum("xab,xbc,xdc->ad", B, V_inv, B)
        rhs = -(g_p - jnp.einsum("xab,xbc,xc->a", B, V_inv, g_x))
        # Constant/padded poses: identity rows/cols, zero rhs.
        S = (
            S * free_flat[:, None] * free_flat[None, :]
            + jnp.diag(1.0 - free_flat)
        )
        rhs = rhs * free_flat
        k_free = min(6 * FREE_CAP, n6)
        # A Pallas Cholesky kernel existed behind SLAMTPU_PALLAS_SOLVE but
        # measured ~neutral on device (round-4 A/B: BA 102.9 vs 108.5 ms)
        # and was deleted.
        dp_free = solve_psd(S[:k_free, :k_free], rhs[:k_free])
        dp = jnp.zeros((n6,), jnp.float32).at[:k_free].set(dp_free)

        dx = jnp.einsum(
            "xbc,xc->xb", V_inv, -g_x - jnp.einsum("xab,a->xb", B, dp)
        )

        cand_poses = poses + dp.reshape(P, 6) * free_p[:, None]
        cand_points = points + dx
        new_cost = _cost(
            cand_poses, cand_points, obs_pose, obs_point, obs_px, weights,
            intrinsics,
        )
        accept = new_cost < cost
        poses = jnp.where(accept, cand_poses, poses)
        points = jnp.where(accept, cand_points, points)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * 0.1, lam * 10.0), 1e-8, 1e8
        )
        return poses, points, lam, cost

    cost0 = _cost(poses, points, obs_pose, obs_point, obs_px, weights,
                  intrinsics)
    poses, points, _, cost = jax.lax.fori_loop(
        0, iters, body, (poses, points, jnp.float32(1e-3), cost0)
    )
    return poses, points, cost


@functools.partial(
    jax.jit, static_argnames=("P", "X", "O", "iters1", "iters2", "repr_eps",
                              "depth_eps", "gross_eps")
)
def local_bundle_adjustment_packed(buf, *, P: int, X: int, O: int,
                                   iters1: int = 5, iters2: int = 10,
                                   repr_eps: float = 5.0,
                                   depth_eps: float = 1e-6,
                                   gross_eps: float = 1e4):
    """Single-upload wrapper: the estimator packs every BA input into ONE
    flat f32 buffer so dispatch costs one H2D transfer instead of eight
    (each jnp.asarray is a separate ~5-7 ms RPC on the tunnel backend —
    BENCH r5 decomposition: es.ba 19.6 ms/KF, mostly transfers).

    Layout: [poses0 P*6 | pose_const P | points0 X*3 | obs_pose O |
             obs_point O | obs_px O*2 | obs_valid O | intrinsics 4].
    Index/bool lanes ride as f32 (exact for indices < 2^24).
    """
    i = 0

    def take(n, shape=None):
        nonlocal i
        part = jax.lax.slice_in_dim(buf, i, i + n)
        i += n
        return part.reshape(shape) if shape is not None else part

    poses0 = take(P * 6, (P, 6))
    pose_const = take(P) > 0.5
    points0 = take(X * 3, (X, 3))
    obs_pose = take(O).astype(jnp.int32)
    obs_point = take(O).astype(jnp.int32)
    obs_px = take(O * 2, (O, 2))
    obs_valid = take(O) > 0.5
    intrinsics = take(4)
    return local_bundle_adjustment(
        poses0, pose_const, points0, obs_pose, obs_point, obs_px,
        obs_valid, intrinsics, iters1=iters1, iters2=iters2,
        repr_eps=repr_eps, depth_eps=depth_eps, gross_eps=gross_eps,
    )


@functools.partial(
    jax.jit, static_argnames=("iters1", "iters2", "repr_eps", "depth_eps",
                              "gross_eps")
)
def local_bundle_adjustment(poses0, pose_const, points0, obs_pose, obs_point,
                            obs_px, obs_valid, intrinsics, *,
                            iters1: int = 5, iters2: int = 10,
                            repr_eps: float = 5.0, depth_eps: float = 1e-6,
                            gross_eps: float = 1e4):
    """Two-phase local BA (reference bundle_adjustment.jl:1-55).

    poses0: (P, 6) Euler-ZYX cw pose parameters.
    pose_const: (P,) bool — constant poses (reference estimator.jl:169-226).
    points0: (X, 3) world points.
    obs_*: (O,) observation lists (padded; obs_valid masks padding).
    intrinsics: (4,) (fx, fy, cx, cy).

    Returns dict: poses (P, 6), points (X, 3), outliers (O,), final_cost.

    Observations whose INITIAL squared error exceeds `gross_eps` (100 px at
    the default) are excluded before phase 1 and reported as outliers: a
    single garbage observation (a degenerate triangulation at ~1e5 px) makes
    phase-1 LM drag every pose toward it, after which the phase-1 outlier
    test flags the GOOD observations and phase 2 gauge-drifts. The
    reference's f64 LSMR tolerates this; a padded-batch f32 LM must not.
    """
    free = ~pose_const

    r0, depth0 = jax.vmap(
        lambda th, pt, px: _residual_one(th, pt, px, intrinsics)
    )(poses0[obs_pose], points0[obs_point], obs_px)
    sq0 = jnp.sum(r0 * r0, axis=-1)
    gross = ((depth0 < depth_eps) | (sq0 > gross_eps)) & obs_valid
    obs_valid = obs_valid & ~gross
    w1 = obs_valid.astype(jnp.float32)

    # One bucket table for both phases: gross rows are excluded from the
    # buckets outright (obs_valid already has ~gross applied); phase-2
    # outlier rows stay in their buckets with zero weight — both forms
    # contribute exact zeros.
    bucket = _bucket_observations(
        obs_point, obs_valid, points0.shape[0], poses0.shape[0]
    )

    poses1, points1, _ = _lm_rounds(
        poses0, points0, free, obs_pose, obs_point, obs_px, w1, intrinsics,
        iters1, bucket,
    )

    # Outlier detection at the phase-1 minimizer.
    r, depth = jax.vmap(
        lambda th, pt, px: _residual_one(th, pt, px, intrinsics)
    )(poses1[obs_pose], points1[obs_point], obs_px)
    sq = jnp.sum(r * r, axis=-1)
    outliers = ((depth < depth_eps) | (sq > repr_eps)) & obs_valid

    w2 = w1 * (~outliers).astype(jnp.float32)
    poses2, points2, cost = _lm_rounds(
        poses1, points1, free, obs_pose, obs_point, obs_px, w2, intrinsics,
        iters2, bucket,
    )
    return {
        "poses": poses2,
        "points": points2,
        "outliers": outliers | gross,
        "final_cost": cost,
    }
