"""Fused per-frame front-end device program.

One jitted program per tracked frame = ONE device round trip (the TPU sits
behind a ~30 ms/RPC tunnel; the unfused path costs 4-5 RPCs). Fuses the
whole post-init tracking step of reference front_end.jl:75-118:

  1. forward-backward pyramidal KLT for both tracking families
     (3D-with-projection-prior at 1 level, plain 2D at the full pyramid,
     failed-3D retry as 2D — map_manager.jl:451-564);
  2. batched undistort + backproject of the new positions (camera.jl);
  3. rotation-compensated parallax + 5-point-equivalent essential RANSAC
     epipolar filter over the previous-keyframe join set
     (front_end.jl:243-332);
  4. P3P RANSAC over the tracked 3D points excluding epipolar outliers
     (front_end.jl:132-199);
  5. two-phase LM PnP refinement seeded by the P3P pose
     (front_end.jl:202-206, bundle_adjustment.jl:113-171);
  6. the keyframe-decision median parallax under the refined rotation
     (front_end.jl:382-385).

The host applies all bookkeeping (keypoint moves, observation removals,
pose writes, motion model, keyframe decision) from the single fetched
result bundle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lucas_kanade import lk_flow
from .mvg import essential_ransac
from .pnp import p3p_ransac, pnp_refine
from .se3 import rot_to_zyx


def _undistort_backproject(px_yx, intrinsics, dist):
    """Batched reference camera.jl:98-141: pixel -> undistorted pixel ->
    normalized ray. Single polynomial application (identity when dist=0)."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    ny = (px_yx[:, 0] - cy) / fy
    nx = (px_yx[:, 1] - cx) / fx
    r2 = ny * ny + nx * nx
    rd = 1.0 + k1 * r2 + k2 * r2 * r2
    pp = ny * nx
    dtx = 2.0 * p1 * pp + p2 * (r2 + 2.0 * ny * ny)
    dty = p1 * (r2 + 2.0 * nx * nx) + 2.0 * p2 * pp
    uy = (rd * ny + dty)
    ux = (rd * nx + dtx)
    und_px = jnp.stack([uy * fy + cy, ux * fx + cx], axis=-1)
    bearings = jnp.stack([ux, uy, jnp.ones_like(ux)], axis=-1)  # (x, y, 1)
    return und_px, bearings


def _masked_median(values, mask, iters: int = 24):
    """Median over masked entries via bisection on the value range.

    A device sort costs ~3-4 ms at this batch size; `iters` halvings of the
    bracketing interval give the median to (range / 2^iters) — far below a
    pixel of parallax — with `iters` cheap counting passes.
    """
    # A Pallas bisection kernel existed behind SLAMTPU_PALLAS_SCALAR but
    # measured neutral on device (round-4 A/B) and was deleted.
    n = jnp.sum(mask)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    lo = jnp.min(jnp.where(mask, values, big))
    hi = jnp.max(jnp.where(mask, values, -big))
    half = (n + 1) // 2  # rank of the lower median

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = jnp.sum(mask & (values <= mid))
        lo = jnp.where(below < half, mid, lo)
        hi = jnp.where(below < half, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.where(n > 0, 0.5 * (lo + hi), 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "essential_hypotheses", "pnp_hypotheses",
        "threshold", "min_parallax_5pt", "min_active", "five_point",
    ),
)
def frontend_step(
    pyr_prev, pyr_cur,
    # Tracked keypoint state, padded to capacity N:
    px,             # (N, 2) f32 current pixels (y, x)
    valid,          # (N,) bool
    is3d_prior,     # (N,) bool — track with projection prior (1 level)
    disp_prior,     # (N, 2) f32 prior displacement (coarsest-level units)
    mp_pos,         # (N, 3) f32 world positions (3D keypoints; else 0)
    has_mp,         # (N,) bool — valid mp_pos entry (feeds P3P)
    # Previous-keyframe join set (indices into the N axis), padded to M:
    join_idx,       # (M,) int32
    join_valid,     # (M,) bool
    prev_und_xy,    # (M, 2) f32 prev-KF undistorted pixels (x, y)
    prev_bearing_xy,  # (M, 2) f32 prev-KF normalized coords (x, y)
    # Geometry:
    R_comp,         # (3, 3) f32 prev_kf_Rcw @ predicted_Rwc (parallax comp.)
    theta_predicted,  # (6,) f32 Euler-ZYX cw of the predicted pose
    intrinsics,     # (4,)
    dist,           # (4,) distortion
    key,
    *,
    levels: int, window: int, iters: int = 30, eps: float = 1e-2,
    eig_thresh: float = 1e-4, pad: int = 11, max_fb_distance: float = 1.0,
    essential_hypotheses: int = 256, pnp_hypotheses: int = 256,
    threshold: float = 3.0, min_parallax_5pt: float = 5.0,
    min_active: int = 0, five_point: bool = False,
):
    N = px.shape[0]

    # ---- 1. KLT. Both tracking families advance in ONE merged level
    # cascade: the plain family enters at the coarsest level, the
    # prior family is injected at level 1 with its projection prior
    # (map_manager.jl:458,466) — mask-equivalent to the reference's two
    # separate batches but half the sequential level blocks (each block
    # costs milliseconds of gather latency on the tunnel-attached device).
    # The failed-prior retry (map_manager.jl:534-537) runs as shadow lanes
    # inside the SAME cascade (fb_shadow) instead of a second one.
    from .lucas_kanade import fb_cascade

    new_px, ok, tracked_with_prior = fb_cascade(
        pyr_prev, pyr_cur, px, is3d_prior, disp_prior, valid,
        levels=levels, prior_level=1, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, max_distance=max_fb_distance,
        min_active=min_active,
    )

    # ---- 2. Batched undistort/backproject. ---------------------------------
    und_px, bearings = _undistort_backproject(new_px, intrinsics, dist)

    # ---- 3. Essential-matrix epipolar filter over the prev-KF join. --------
    cur_und = und_px[join_idx]           # (M, 2) (y, x)
    cur_bear = bearings[join_idx]        # (M, 3)
    j_ok = join_valid & ok[join_idx]

    # Rotation-compensated parallax at the predicted pose (front_end.jl:278).
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    rot_pos = cur_bear @ R_comp.T
    z = jnp.where(jnp.abs(rot_pos[:, 2]) < 1e-9, 1e-9, rot_pos[:, 2])
    rot_px = jnp.stack(
        [fy * rot_pos[:, 1] / z + cy, fx * rot_pos[:, 0] / z + cx], axis=-1
    )
    prev_und_yx = prev_und_xy[:, ::-1]
    par = jnp.linalg.norm(rot_px - prev_und_yx, axis=-1)
    n_par = jnp.sum(j_ok)
    mean_parallax = jnp.sum(jnp.where(j_ok, par, 0.0)) / jnp.maximum(n_par, 1)

    # RANSAC sampling is mask-driven (Gumbel-max in mvg.py) — no argsort
    # compaction (device sorts cost ~3-4 ms each).
    ess = essential_ransac(
        prev_bearing_xy, cur_bear[:, :2],
        prev_und_xy, cur_und[:, ::-1],
        j_ok, jnp.maximum(n_par, 1), intrinsics, key,
        hypotheses=essential_hypotheses, threshold=threshold,
        # Per-frame epipolar filtering runs on hundreds of tracked
        # correspondences where the polished 8-point is accurate and ~50 ms
        # cheaper than 5-point; the mono INIT (where planar degeneracy
        # bites, front_end.jl:343-354) goes through the host path with
        # five_point=True.
        five_point=five_point,
    )
    ess_inliers = ess["inliers"]
    ess_gate = (n_par >= 8) & (mean_parallax >= min_parallax_5pt) & (
        ess["n_inliers"] >= 5
    )
    # Outlier mask scattered back over N (front_end.jl:315-319).
    ess_outlier_m = ess_gate & j_ok & ~ess_inliers
    ess_outlier = (
        jnp.zeros((N,), jnp.int32)
        .at[join_idx]
        .max(jnp.where(join_valid, ess_outlier_m, False).astype(jnp.int32))
        .astype(bool)
    )

    # ---- 4. P3P RANSAC over tracked 3D points (front_end.jl:132-167). ------
    p3p_mask = ok & has_mp & ~ess_outlier
    n_p3p = jnp.sum(p3p_mask)
    bear_unit = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)
    key_p3p = jax.random.fold_in(key, 1)
    p3p = p3p_ransac(
        mp_pos, und_px[:, ::-1], bear_unit,
        p3p_mask, jnp.maximum(n_p3p, 1), intrinsics, key_p3p,
        hypotheses=pnp_hypotheses, threshold=threshold,
    )
    p3p_inliers = p3p["inliers"]

    # ---- 5. PnP LM refinement on the inliers (front_end.jl:202-206). -------
    theta0 = rot_to_zyx(p3p["cw"][:3, :3])
    theta0 = jnp.concatenate([theta0, p3p["cw"][:3, 3]])
    ref = pnp_refine(
        theta0, mp_pos, und_px, p3p_inliers & p3p_mask, intrinsics,
        iters1=5, iters2=10, repr_eps=threshold,
    )

    # ---- 6. Keyframe-decision median parallax (front_end.jl:382-385) -------
    # under the refined rotation: R_comp_final = prev_Rcw @ R_final_wc.
    from .se3 import rot_zyx  # local import avoids cycle at module load
    R_cw_final = rot_zyx(ref["theta"][:3])
    # R_comp = prev_Rcw @ Rwc_pred; Rwc_pred = R_cw_pred^T. Recompose with
    # the final rotation: prev_Rcw = R_comp @ R_cw_pred.
    R_cw_pred = rot_zyx(theta_predicted[:3])
    prev_Rcw = R_comp @ R_cw_pred
    R_comp_final = prev_Rcw @ R_cw_final.T
    rot_pos_f = cur_bear @ R_comp_final.T
    zf = jnp.where(jnp.abs(rot_pos_f[:, 2]) < 1e-9, 1e-9, rot_pos_f[:, 2])
    rot_px_f = jnp.stack(
        [fy * rot_pos_f[:, 1] / zf + cy, fx * rot_pos_f[:, 0] / zf + cx],
        axis=-1,
    )
    par_f = jnp.linalg.norm(rot_px_f - prev_und_yx, axis=-1)
    median_parallax = _masked_median(par_f, j_ok)

    return {
        "new_px": new_px,
        "und_px": und_px,
        "bearings": bearings,
        "ok": ok,
        "tracked_with_prior": tracked_with_prior,
        "mean_parallax": mean_parallax,
        "n_parallax": n_par,
        "ess_pose": ess["pose"],
        "ess_n_inliers": jnp.where(ess_gate, ess["n_inliers"], 0),
        "ess_gate": ess_gate,
        "ess_outlier": ess_outlier,
        "p3p_cw": p3p["cw"],
        "p3p_inliers": p3p_inliers,
        "p3p_n_inliers": p3p["n_inliers"],
        "n_p3p": n_p3p,
        "pnp_theta": ref["theta"],
        "pnp_initial_error": ref["initial_error"],
        "pnp_final_error": ref["final_error"],
        "pnp_outliers": ref["outliers"],
        "pnp_n_outliers": ref["n_outliers"],
        "median_parallax": median_parallax,
    }


# ---------------------------------------------------------------------------
# v2: single-program frame step with in-program pyramid build and packed
# host<->device payloads (each RPC on the tunnel-attached device costs
# ~26 ms of latency; v1 paid a separate pyramid dispatch plus 15 uploads
# and a 20-leaf fetch per frame).
# ---------------------------------------------------------------------------

# Column layout of the packed (cap, 11) f32 keypoint-state upload.
PK_PX = slice(0, 2)          # current pixel (y, x)
PK_DISP = slice(2, 4)        # 3D projection prior displacement
PK_MP = slice(4, 7)          # map-point world position
PK_PREV_UND = slice(7, 9)    # prev-KF undistorted pixel (x, y), join rows
PK_PREV_BEAR = slice(9, 11)  # prev-KF normalized coords (x, y), join rows
# Bit layout of the packed (cap,) int32 flags upload.
FL_VALID = 1        # tracked this frame (valid & attempted)
FL_PRIOR = 2        # track with 3D projection prior
FL_HAS_MP = 4       # has a live map point (feeds P3P)
# misc f32 vector layout: R_comp (9) | theta_pred (6) | intrinsics (4) |
# distortion (4).


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "essential_hypotheses", "pnp_hypotheses",
        "threshold", "min_parallax_5pt", "min_active", "sigma",
        "five_point",
    ),
)
def frontend_step_v2(
    image,          # (H, W) f32 current frame
    pyr_prev,       # previous frame's pyramid pytree (device-resident)
    state,          # (N + 3, 13) f32 single upload:
                    #   rows [0, N): PK_* cols | col 11 = FL_* flags |
                    #                col 12 = join_idx (-1 = invalid)
                    #   rows [N, N+3): misc (23,) f32 flattened row-major —
                    #                  R_comp | theta_pred | intrinsics |
                    #                  distortion
    key,
    *,
    levels: int, window: int, iters: int = 30, eps: float = 1e-2,
    eig_thresh: float = 1e-4, pad: int = 11, max_fb_distance: float = 1.0,
    essential_hypotheses: int = 256, pnp_hypotheses: int = 256,
    threshold: float = 3.0, min_parallax_5pt: float = 5.0,
    min_active: int = 0, sigma: float = 1.0, five_point: bool = False,
):
    """One device program per tracked frame: pyramid + KLT + epipolar filter
    + P3P + PnP + keyframe parallax. Returns (packed results, pyr_cur);
    pyr_cur is NOT fetched — the host feeds it back as the next frame's
    pyr_prev (device-resident double buffering, reference front_end.jl:454).
    """
    from .image import lk_pyramid_impl

    pyr_cur = lk_pyramid_impl(image, levels=levels, sigma=sigma, pad=pad)

    packed = state[:-3, :11]
    flags = state[:-3, 11].astype(jnp.int32)
    join_idx = state[:-3, 12].astype(jnp.int32)
    misc = state[-3:, :].reshape(39)

    res = frontend_step(
        pyr_prev, pyr_cur,
        packed[:, PK_PX],
        (flags & FL_VALID) > 0,
        (flags & FL_PRIOR) > 0,
        packed[:, PK_DISP],
        packed[:, PK_MP],
        (flags & FL_HAS_MP) > 0,
        jnp.maximum(join_idx, 0),
        join_idx >= 0,
        packed[:, PK_PREV_UND],
        packed[:, PK_PREV_BEAR],
        misc[0:9].reshape(3, 3),
        misc[9:15],
        misc[15:19],
        misc[19:23],
        key,
        levels=levels, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, max_fb_distance=max_fb_distance,
        essential_hypotheses=essential_hypotheses,
        pnp_hypotheses=pnp_hypotheses, threshold=threshold,
        min_parallax_5pt=min_parallax_5pt, min_active=min_active,
        five_point=five_point,
    )

    # Pack per-keypoint outputs into one (N, 11) fetch + one scalar vector.
    per_kp = jnp.concatenate(
        [
            res["new_px"],                                    # 0:2
            res["und_px"],                                    # 2:4
            res["bearings"],                                  # 4:7
            res["ok"][:, None].astype(jnp.float32),           # 7
            res["ess_outlier"][:, None].astype(jnp.float32),  # 8
            res["p3p_inliers"][:, None].astype(jnp.float32),  # 9
            res["pnp_outliers"][:, None].astype(jnp.float32),  # 10
        ],
        axis=-1,
    )
    scalars = jnp.concatenate(
        [
            res["ess_pose"].reshape(16),                      # 0:16
            res["p3p_cw"].reshape(16),                        # 16:32
            res["pnp_theta"],                                 # 32:38
            jnp.stack([
                res["median_parallax"],                       # 38
                res["mean_parallax"],                         # 39
                res["n_parallax"].astype(jnp.float32),        # 40
                res["ess_gate"].astype(jnp.float32),          # 41
                res["ess_n_inliers"].astype(jnp.float32),     # 42
                res["n_p3p"].astype(jnp.float32),             # 43
                res["p3p_n_inliers"].astype(jnp.float32),     # 44
                res["pnp_initial_error"],                     # 45
                res["pnp_final_error"],                       # 46
                res["pnp_n_outliers"].astype(jnp.float32),    # 47
            ]),
        ]
    )
    return per_kp, scalars, pyr_cur
