"""Device-resident per-frame tracking step (carry-passing).

The round-2 fused step (ops/frontend_step.py) still re-assembled and
re-uploaded the whole keypoint state from host dicts every frame and could
not dispatch frame N+1 before frame N's results were fetched — so every
frame paid the full dispatch+exec+fetch round trip (~26 ms of tunnel RPC
latency alone) serially.

This module moves the entire tracked-frame recurrence onto the device:

    carry_{N+1}, outputs_N = track_step(carry_N, image_N, dt_N)

with carry = {pyramid double-buffer, packed keypoint state, pose +
constant-velocity motion model}. Host bookkeeping (keypoint dict moves,
observation removals, pose records, keyframe decision — reference
front_end.jl:75-118) is applied one frame behind from the fetched outputs,
while the device already executes the next frame. The recurrence encodes the
SUCCESS path of the reference's per-frame cascade; the rare divergences
(P3P/PnP reset, keyframe creation) are detected at apply time and handled by
discarding the speculated frames and resyncing the carry from host state
(models/front_end.py).

In-kernel equivalents of the host work the round-2 path did per frame:
  - constant-velocity SE(3) predict/update (reference motion_model.jl:32-60);
  - 3D-keypoint projection priors under the predicted pose
    (map_manager.jl:486-507, camera.jl:79-82);
  - the final-pose selection cascade (front_end.jl:104-114,168-218);
  - next keypoint state: tracked pixel moves and the removal set
    (tracking failures, epipolar outliers, P3P/PnP outliers —
    map_manager.jl:524-562, front_end.jl:184-218).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .frontend_step import frontend_step
from .se3 import pose_to_theta, rt_to_4x4, se3_exp, se3_inv, se3_log, theta_to_pose

# Packed (cap, 10) f32 keypoint-state columns.
TK_PX = slice(0, 2)          # current pixel (y, x)
TK_MP = slice(2, 5)          # map-point world position
TK_PREV_UND = slice(5, 7)    # prev-KF undistorted pixel (x, y)
TK_PREV_BEAR = slice(7, 9)   # prev-KF normalized coords (x, y)
TK_FLAGS = 9                 # bit flags below
FL_VALID = 1                 # keypoint alive
FL_HAS_MP = 2                # has a 3D map point (is_3d)
FL_JOIN = 4                  # present in the previous keyframe (join set)

# misc (48,) f32 layout.
MS_PREV_KF_CW = slice(0, 16)   # previous keyframe cw (row-major 4x4)
MS_WC = slice(16, 32)          # last final wc (motion-model prev_wc)
MS_VEL = slice(32, 38)         # se(3) velocity (motion_model.log_rel_t)
MS_APPLY_5PT = 38              # nb_keyframes > 2 (front_end.jl:105-109)
MS_HAS_PREV = 39               # motion model initialized (prev_time >= 0)
MS_INTRINSICS = slice(40, 44)
MS_DISTORTION = slice(44, 48)

# 1 / 2^pyramid_levels_3d: projection priors enter in coarsest-prior-level
# units (map_manager.jl:458,466).
SCALE_3D = 0.5


def _project_distort(points_w, cw, intrinsics, dist):
    """Batched world -> distorted pixel (y, x) (camera.jl:79-82 via
    frame.jl:452-484). Matches Frame.project_world_to_image_distort_batch."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    pc = points_w @ cw[:3, :3].T + cw[:3, 3]
    z = pc[:, 2]
    z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    ny = pc[:, 1] / z
    nx = pc[:, 0] / z
    r2 = ny * ny + nx * nx
    rd = 1.0 + k1 * r2 + k2 * r2 * r2
    pp = ny * nx
    dtx = 2.0 * p1 * pp + p2 * (r2 + 2.0 * ny * ny)
    dty = p1 * (r2 + 2.0 * nx * nx) + 2.0 * p2 * pp
    return jnp.stack(
        [(rd * ny + dty) * fy + cy, (rd * nx + dtx) * fx + cx], axis=-1
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "essential_hypotheses", "pnp_hypotheses",
        "threshold", "min_active", "sigma", "five_point",
        "height", "width",
    ),
)
def track_step(
    carry,      # {"pyr": pytree, "kp": (cap, 10) f32, "misc": (48,) f32}
    image,      # (H, W) current frame
    dt,         # f32 scalar: time - prev_time (host-computed in f64)
    key,
    *,
    levels: int, window: int, iters: int = 30, eps: float = 1e-2,
    eig_thresh: float = 1e-4, pad: int = 17, max_fb_distance: float = 1.0,
    essential_hypotheses: int = 256, pnp_hypotheses: int = 256,
    threshold: float = 3.0, min_active: int = 0, sigma: float = 1.0,
    five_point: bool = False, height: int = 0, width: int = 0,
):
    """One tracked frame; returns (new_carry, per_kp, scalars).

    per_kp / scalars have the exact layout of frontend_step_v2's outputs
    (ops/frontend_step.py) so the host apply logic is shared.
    """
    from .image import lk_pyramid_impl

    pyr_prev = carry["pyr"]
    kp = carry["kp"]
    misc = carry["misc"]

    pyr_cur = lk_pyramid_impl(image, levels=levels, sigma=sigma, pad=pad)

    px = kp[:, TK_PX]
    mp_pos = kp[:, TK_MP]
    prev_und_xy = kp[:, TK_PREV_UND]
    prev_bear_xy = kp[:, TK_PREV_BEAR]
    flags = kp[:, TK_FLAGS].astype(jnp.int32)
    valid = (flags & FL_VALID) > 0
    has_mp = (flags & FL_HAS_MP) > 0
    has_join = (flags & FL_JOIN) > 0

    prev_kf_cw = misc[MS_PREV_KF_CW].reshape(4, 4)
    wc_prev = misc[MS_WC].reshape(4, 4)
    vel = misc[MS_VEL]
    apply_5pt = misc[MS_APPLY_5PT] > 0
    has_prev = misc[MS_HAS_PREV] > 0
    intrinsics = misc[MS_INTRINSICS]
    dist = misc[MS_DISTORTION]

    # -- motion-model predict (motion_model.jl:32-42) -----------------------
    wc_pred = jnp.where(has_prev, wc_prev @ se3_exp(vel * dt), wc_prev)
    cw_pred = se3_inv(wc_pred)
    theta_pred = pose_to_theta(cw_pred)

    # -- 3D projection priors (map_manager.jl:486-507) ----------------------
    proj = _project_distort(mp_pos, cw_pred, intrinsics, dist)
    in_img = (
        (proj[:, 0] >= 0.0) & (proj[:, 0] <= float(height - 1))
        & (proj[:, 1] >= 0.0) & (proj[:, 1] <= float(width - 1))
    )
    prior = valid & has_mp & in_img
    # A 3D keypoint whose projection leaves the image stays untracked this
    # frame (map_manager.jl:500-507): excluded from `attempted`, kept alive.
    attempted = valid & (~has_mp | in_img)
    disp = jnp.where(prior[:, None], SCALE_3D * (proj - px), 0.0)

    R_comp = prev_kf_cw[:3, :3] @ wc_pred[:3, :3]

    res = frontend_step(
        pyr_prev, pyr_cur,
        px, attempted, prior, disp, mp_pos, valid & has_mp,
        jnp.arange(px.shape[0], dtype=jnp.int32),  # per-slot join
        has_join & attempted,
        prev_und_xy, prev_bear_xy,
        R_comp.astype(jnp.float32), theta_pred.astype(jnp.float32),
        intrinsics, dist, key,
        levels=levels, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, max_fb_distance=max_fb_distance,
        essential_hypotheses=essential_hypotheses,
        pnp_hypotheses=pnp_hypotheses, threshold=threshold,
        min_active=min_active, five_point=five_point,
    )

    ok = res["ok"]
    ess_gate = res["ess_gate"]
    ess_outlier = res["ess_outlier"]          # already gated by ess_gate
    p3p_inliers = res["p3p_inliers"]
    pnp_outliers = res["pnp_outliers"]

    # -- final-pose cascade (mirrors FrontEnd._apply_fused success path) ----
    # 5-pt fallback pose with motion-model scale recovery
    # (front_end.jl:315-330).
    rel = prev_kf_cw @ wc_pred
    scale = jnp.linalg.norm(rel[:3, 3])
    E_pose = res["ess_pose"]
    t5 = E_pose[:3, 3]
    norm_t = jnp.linalg.norm(t5)
    t5 = jnp.where(norm_t > 1e-12, scale * t5 / norm_t, t5)
    pose_5pt = rt_to_4x4(E_pose[:3, :3], t5) @ prev_kf_cw

    cw_final = jnp.where(ess_gate & apply_5pt, pose_5pt, cw_pred)
    p3p_applied = (res["n_p3p"] >= 5) & (res["p3p_n_inliers"] >= 5)
    cw_final = jnp.where(p3p_applied, res["p3p_cw"], cw_final)
    pnp_applied = (
        p3p_applied
        & (res["p3p_n_inliers"] - res["pnp_n_outliers"] >= 5)
        & ~(res["pnp_final_error"] > res["pnp_initial_error"])
    )
    cw_final = jnp.where(
        pnp_applied, theta_to_pose(res["pnp_theta"]), cw_final
    )
    wc_final = se3_inv(cw_final)

    # -- motion-model update (motion_model.jl:44-60) ------------------------
    vel_new = jnp.where(
        dt > 0, se3_log(se3_inv(wc_prev) @ wc_final) / jnp.maximum(dt, 1e-12),
        vel,
    )

    # -- next keypoint state (map_manager.jl:524-562, front_end.jl:184-218) -
    has_mp_ok = ok & has_mp & ~ess_outlier
    removed = (
        (attempted & ~ok)
        | ess_outlier
        | (p3p_applied & has_mp_ok & ~p3p_inliers)
        | (pnp_applied & has_mp_ok & p3p_inliers & pnp_outliers)
    )
    valid_new = valid & ~removed
    moved = attempted & ok
    px_new = jnp.where(moved[:, None], res["new_px"], px)
    flags_new = jnp.where(valid_new, flags, flags & ~FL_VALID)

    kp_new = jnp.concatenate(
        [
            px_new,
            mp_pos,
            prev_und_xy,
            prev_bear_xy,
            flags_new.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )
    misc_new = jnp.concatenate(
        [
            prev_kf_cw.reshape(16),
            wc_final.reshape(16),
            vel_new,
            jnp.stack([misc[MS_APPLY_5PT], 1.0]),
            intrinsics,
            dist,
        ]
    )
    new_carry = {"pyr": pyr_cur, "kp": kp_new, "misc": misc_new}

    # -- packed outputs (layout of frontend_step_v2, ops/frontend_step.py) --
    per_kp = jnp.concatenate(
        [
            res["new_px"],                                    # 0:2
            res["und_px"],                                    # 2:4
            res["bearings"],                                  # 4:7
            ok[:, None].astype(jnp.float32),                  # 7
            ess_outlier[:, None].astype(jnp.float32),         # 8
            p3p_inliers[:, None].astype(jnp.float32),         # 9
            pnp_outliers[:, None].astype(jnp.float32),        # 10
            attempted[:, None].astype(jnp.float32),           # 11
            # The 3D mask the DEVICE actually used this frame: with the
            # async keyframe path the host's view can lag (temporal
            # promotions land via carry_merge one frame later), so the
            # host's apply reads the device's mask instead of its own.
            has_mp[:, None].astype(jnp.float32),              # 12
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
            # Extension block: the device-side prediction, final pose and
            # attempt mask diagnostics for host-mirror verification.
            pose_to_theta(cw_pred),                           # 48:54
            pose_to_theta(cw_final),                          # 54:60
        ]
    )
    return new_carry, per_kp, scalars


@jax.jit
def carry_merge(carry, host_kp, host_misc):
    """Reconcile the device carry with the host's authoritative state
    WITHOUT discarding the in-flight speculated dispatches (async keyframe
    path — the host's f64 keyframe gates run one frame behind the device's
    f32 predictions).

    Ownership split:
      - device-owned (ahead of the host): pixels, pose/velocity recurrence,
        tracking-failure removals — kept from `carry`;
      - host-owned (authoritative map state): map-point positions, 3D
        status, join set, prev-KF observation data, host-initiated removals
        (map-point culls), prev-KF pose, the 5pt-gate flag — overwritten
        from `host_kp` / `host_misc`.

    Validity is the AND of both views: the device may have killed points
    the host hasn't applied yet, and the host may have culled points the
    device still tracks. Neither side may resurrect the other's removals.

    host_misc: (17,) = prev_kf_cw (16) | apply_5pt.
    """
    kp = carry["kp"]
    flags_dev = kp[:, TK_FLAGS].astype(jnp.int32)
    flags_host = host_kp[:, TK_FLAGS].astype(jnp.int32)
    valid = (flags_dev & FL_VALID) & (flags_host & FL_VALID)
    flags_new = (flags_host & ~FL_VALID) | valid
    kp_new = jnp.concatenate(
        [
            kp[:, TK_PX],
            host_kp[:, TK_MP],
            host_kp[:, TK_PREV_UND],
            host_kp[:, TK_PREV_BEAR],
            flags_new.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )
    misc = carry["misc"]
    misc_new = jnp.concatenate(
        [
            host_misc[:16],                 # MS_PREV_KF_CW
            misc[MS_WC],
            misc[MS_VEL],
            jnp.stack([host_misc[16], misc[MS_HAS_PREV]]),
            misc[MS_INTRINSICS],
            misc[MS_DISTORTION],
        ]
    )
    return {"pyr": carry["pyr"], "kp": kp_new, "misc": misc_new}


@functools.partial(
    jax.jit,
    static_argnames=("levels", "window", "iters", "eps", "eig_thresh", "pad"),
)
def carry_adopt_kf(carry, kf_carry, pre_kp, *, levels, window, iters,
                   eps, eig_thresh, pad):
    """Graft a keyframe program's output onto the speculated tip carry
    WITHOUT discarding the in-flight dispatches (params.speculate_keyframes).

    `carry` is the tip of the speculated chain (frames dispatched past the
    keyframe), `kf_carry` is keyframe_step_carry's output (branched off the
    keyframe frame's carry), `pre_kp` is the kp table both chains branched
    from (identifies the slots the keyframe program filled).

    Ownership split (mirrors carry_merge):
      - slots the keyframe FILLED (invalid before, valid after): their
        detection pixel is at the KEYFRAME frame, 1-3 frames behind the
        tip — a catch-up LK pass (keyframe pyramid -> tip pyramid, full
        cascade, no prior) moves them to the tip frame. Without it the
        next track step would sample the detection position in the WRONG
        image and silently re-anchor the keypoint onto whatever content
        is there now (measured: ATE 0.028 -> 0.080 on the 30-frame CPU
        check). Catch-up failures are dropped — the reference's mapper
        lag loses late detections the same way (mapper.jl:37-140);
      - existing slots: pixel from the speculated chain (it tracked them
        past the keyframe), map position / prev-KF observation refs /
        3D + join flags from kf_carry (stereo promotions, new KF refs);
      - validity is the AND of both views;
      - misc: prev-KF pose + 5pt gate from kf_carry, pose/velocity
        recurrence from the speculated chain.
    """
    from .lucas_kanade import lk_flow

    kp = carry["kp"]
    kfkp = kf_carry["kp"]
    flags_dev = kp[:, TK_FLAGS].astype(jnp.int32)
    flags_kf = kfkp[:, TK_FLAGS].astype(jnp.int32)
    flags_pre = pre_kp[:, TK_FLAGS].astype(jnp.int32)
    new_slot = ((flags_pre & FL_VALID) == 0) & ((flags_kf & FL_VALID) > 0)
    valid = (flags_dev & FL_VALID) & (flags_kf & FL_VALID)
    flags_merged = (flags_kf & ~FL_VALID) | valid

    # Catch-up LK for the freshly detected slots only: keyframe pyramid ->
    # tip pyramid, zero prior (displacement over 1-3 frames fits the full
    # pyramid range).
    det_px = kfkp[:, TK_PX]
    flow, caught = lk_flow(
        kf_carry["pyr"], carry["pyr"], det_px,
        jnp.zeros_like(det_px), new_slot,
        levels=levels, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad,
    )
    new_px = det_px + flow
    new_flags = jnp.where(
        caught, flags_kf, flags_kf & ~FL_VALID
    ).astype(jnp.float32)[:, None]
    new_rows = jnp.concatenate(
        [new_px, kfkp[:, TK_MP], kfkp[:, TK_PREV_UND],
         kfkp[:, TK_PREV_BEAR], new_flags], axis=-1,
    )

    merged = jnp.concatenate(
        [
            kp[:, TK_PX],
            kfkp[:, TK_MP],
            kfkp[:, TK_PREV_UND],
            kfkp[:, TK_PREV_BEAR],
            flags_merged.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )
    kp_new = jnp.where(new_slot[:, None], new_rows, merged)
    misc = carry["misc"]
    kf_misc = kf_carry["misc"]
    misc_new = jnp.concatenate(
        [
            kf_misc[MS_PREV_KF_CW],
            misc[MS_WC],
            misc[MS_VEL],
            jnp.stack([kf_misc[MS_APPLY_5PT], misc[MS_HAS_PREV]]),
            misc[MS_INTRINSICS],
            misc[MS_DISTORTION],
        ]
    )
    caught_mask = jnp.where(new_slot, caught, True)
    return {"pyr": carry["pyr"], "kp": kp_new, "misc": misc_new}, caught_mask
