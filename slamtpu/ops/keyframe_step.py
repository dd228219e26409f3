"""Fused keyframe device program: Shi-Tomasi detection + stereo KLT
matching + stereo DLT + temporal DLT in ONE dispatch/fetch.

The round-2 keyframe path paid three serialized dispatch+fetch round trips
(~26 ms RPC latency each, plus host hops between them): extraction
(extractor.jl:63-95), the fused stereo step (mapper.jl:48-84 — matching +
stereo triangulation), and the batched temporal DLT (mapper.jl:185-263).
All three collapse here into one program:

  1. detect new keypoints on the keyframe image (whole-image Shi-Tomasi,
     dilated-occupancy suppression around tracked keypoints, per-cell
     top-k with the reference's dynamic budgets n_cell_detect /
     nb_to_detect as traced scalars — extractor.jl:74-95);
  2. scatter the admitted detections into the free tail of the SAME
     cap-sized keypoint slot array the stereo step tracks (the combined
     old+new set is what the budget bounds to max_nb_keypoints), in the
     exact row-major (cell, rank) order the host admits them;
  3. one fb_shadow cascade stereo-tracks everything (3D keypoints with the
     right-projection prior, everyone else plain — map_manager.jl:451-564);
  4. stereo DLT for every slot + temporal DLT against each candidate's
     first-observer keyframe (per-row projection matrices).

The HOST re-makes every accept/reject decision in f64 from the raw fetched
values (epipolar 2 px gate, depth/reprojection gates — mapper.jl:155-181,
239-260), exactly like the round-2 fused stereo step did; the kernel only
moves pixels and solves DLTs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import numpy as np

from .frontend_step import _undistort_backproject
from .features import _dilate
from .image import _conv_grouped, gaussian_kernel_1d, lk_pyramid_impl
from .lucas_kanade import fb_cascade
from .mvg import triangulate_points

# Per-slot packed columns (rows [0, cap) of the state upload).
KF_PX = slice(0, 2)        # pixel (y, x)
KF_UND = slice(2, 4)       # undistorted pixel (y, x) — host f64 cast
KF_DISP = slice(4, 6)      # stereo right-projection prior displacement
KF_FLAGS = 6               # bits below
KF_OBS_UND = slice(7, 9)   # first-observer undistorted pixel (x, y)
KF_GROUP = 9               # temporal group index (-1 = not a candidate)
KFL_VALID = 1
KFL_PRIOR = 2
KFL_TEMPORAL = 4
# Occupancy-only row: suppresses detection around its pixel but is not
# stereo-tracked (3D keypoints whose right projection left the image —
# they stay tracked in the front-end but take no part in this keyframe's
# stereo step, map_manager.jl:500-507).
KFL_OCCUPY = 8

# Per-cell candidate budget (matches the split path's CELL_TOPK).
KF_TOPK = 8

N_GROUPS = 64              # padded temporal observer-group capacity
N_MISC_ROWS = 4            # misc block rows (16 f32 each)

# misc layout (64 slots): P1 (16) | P2_right (16) | intr_r (4) | dist_r (4)
# | intr_l (4) | dist_l (4) | n_old | n_cell_detect | nb_to_detect
MISC_P1 = slice(0, 16)
MISC_P2R = slice(16, 32)
MISC_INTR_R = slice(32, 36)
MISC_DIST_R = slice(36, 40)
MISC_INTR_L = slice(40, 44)
MISC_DIST_L = slice(44, 48)
MISC_N_OLD = 48
MISC_CELL_DETECT = 49
MISC_NB_DETECT = 50


def state_rows(cap: int) -> int:
    return cap + N_GROUPS + N_MISC_ROWS


def _use_sort_scatter() -> bool:
    """Trace-time switch (SLAMTPU_SORT_SCATTER=1): replace the admission
    row scatters with one sort + gathers — in-program scatters cost ~8 ms
    each on the tunnel backend (PERF.md cost model) while a ~3k-element
    sort + searchsorted + gathers are ~1-2 ms total."""
    import os

    return os.environ.get("SLAMTPU_SORT_SCATTER") == "1"


def _admit_rows(scatter_idx, cap: int, flat, pairs):
    """out[s] = values[j] where scatter_idx[j] == s else base[s], plus the
    admitted-slot mask. Targets < cap are unique by construction (slot =
    running admitted count); `cap` is the shared dump row. Semantically
    identical to `.at[scatter_idx].set(values)[:cap]` per pair."""
    order = jnp.argsort(scatter_idx)
    st = scatter_idx[order]
    slots = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.clip(
        jnp.searchsorted(st, slots), 0, st.shape[0] - 1
    )
    hit = (st[pos] == slots)
    src = order[pos]
    new_mask = hit & flat[src]
    outs = []
    for base, values in pairs:
        hb = hit.reshape((cap,) + (1,) * (values.ndim - 1))
        outs.append(jnp.where(hb, values[src], base))
    return outs, new_mask


def _shi_tomasi_cells(pyr_left, px, occ_rows, *, pad, height, width,
                      radius, min_response, cell_size, subpix=False):
    """Shi-Tomasi response -> occupancy suppression -> 3x3 NMS -> per-cell
    top-k (extractor.jl:63-95). Reuses the carry pyramid's Scharr gradients
    (computed pre-padding, so the crop is bit-exact with gradients of the
    raw image); only the sigma-1 product blurs remain, batched into one
    grouped separable pass. Returns (vals, det_y, det_x) per (cell, rank)."""
    sl = (slice(pad, pad + height), slice(pad, pad + width))
    iy = pyr_left[0]["Iy"][sl]
    ix = pyr_left[0]["Ix"][sl]
    prods = jnp.stack([iy * iy, ix * ix, iy * ix])
    k1 = np.stack([gaussian_kernel_1d(1.0)] * 3)
    sm = _conv_grouped(_conv_grouped(prods, k1, 0), k1, 1)
    half_tr = 0.5 * (sm[0] + sm[1])
    disc = jnp.sqrt(jnp.square(0.5 * (sm[0] - sm[1])) + jnp.square(sm[2]))
    resp = half_tr - disc
    resp_raw = resp

    # Occupancy suppression BEFORE the 3x3 NMS — ordering is load-bearing:
    # zeroing the suppressed region first lets a weaker corner just outside
    # it survive NMS against a stronger suppressed neighbor (admission
    # parity with ops/features.detect_keypoints; a post-top-k pairwise
    # variant admitted a strict subset and starved the map).
    yx = jnp.round(px).astype(jnp.int32)
    yx = jnp.clip(yx, 0, jnp.array([height - 1, width - 1]))

    from .detect_pallas import suppress_and_nms, use_detect_pallas

    if use_detect_pallas():
        # Fused VMEM kernel (ops/detect_pallas.py): rasterize + dilate +
        # suppress + NMS in one pass, same dilate-before-NMS ordering.
        resp = suppress_and_nms(
            resp, yx, occ_rows, radius=radius, min_response=min_response
        )
    else:
        occ = (
            jnp.zeros((height, width), jnp.float32)
            .at[yx[:, 0], yx[:, 1]].max(occ_rows.astype(jnp.float32))
        )
        resp = jnp.where(_dilate(occ, radius) > 0.0, 0.0, resp)
        pooled = jax.lax.reduce_window(
            resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        resp = jnp.where(
            (resp >= pooled) & (resp > min_response), resp, 0.0
        )
    gy = -(-height // cell_size)
    gx = -(-width // cell_size)
    padded = jnp.pad(
        resp, ((0, gy * cell_size - height), (0, gx * cell_size - width))
    )
    cells = padded.reshape(gy, cell_size, gx, cell_size)
    cells = cells.transpose(0, 2, 1, 3).reshape(gy * gx, cell_size ** 2)
    vals, idx = jax.lax.top_k(cells, KF_TOPK)
    cell_ids = jnp.arange(gy * gx)
    det_y = ((cell_ids // gx)[:, None] * cell_size + idx // cell_size)
    det_x = ((cell_ids % gx)[:, None] * cell_size + idx % cell_size)
    if subpix:
        from .features import subpixel_refine

        return (vals,) + subpixel_refine(resp_raw, det_y, det_x)
    return vals, det_y, det_x


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "sigma", "min_active",
        "cell_size", "radius", "min_response", "height", "width",
        "stereo_1d", "subpix",
    ),
)
def keyframe_step(
    pyr_left,        # keyframe's left pyramid (device-resident, from carry)
    right_image,     # (H, W) right frame
    state,           # (cap + N_GROUPS + 4, 16) f32 packed upload
    *,
    levels: int, window: int, iters: int = 30, eps: float = 1e-2,
    eig_thresh: float = 1e-4, pad: int = 17, max_fb_distance: float = 1.0,
    sigma: float = 1.0, min_active: int = 0,
    cell_size: int = 35, radius: int = 17, min_response: float = 1e-4,
    height: int = 0, width: int = 0, stereo_1d: bool = False,
    subpix: bool = False,
):
    cap = state.shape[0] - N_GROUPS - N_MISC_ROWS
    slots = state[:cap]
    group_mats = state[cap:cap + N_GROUPS].reshape(N_GROUPS, 4, 4)
    misc = state[cap + N_GROUPS:].reshape(N_MISC_ROWS * 16)

    px = slots[:, KF_PX]
    und = slots[:, KF_UND]
    disp = slots[:, KF_DISP]
    flags = slots[:, KF_FLAGS].astype(jnp.int32)
    obs_und_xy = slots[:, KF_OBS_UND]
    group_idx = slots[:, KF_GROUP].astype(jnp.int32)
    valid = (flags & KFL_VALID) > 0
    prior_mask = (flags & KFL_PRIOR) > 0

    P1 = misc[MISC_P1].reshape(4, 4)
    P2r = misc[MISC_P2R].reshape(4, 4)
    intr_r = misc[MISC_INTR_R]
    dist_r = misc[MISC_DIST_R]
    intr_l = misc[MISC_INTR_L]
    dist_l = misc[MISC_DIST_L]
    n_old = misc[MISC_N_OLD].astype(jnp.int32)
    n_cell_detect = misc[MISC_CELL_DETECT].astype(jnp.int32)
    nb_to_detect = misc[MISC_NB_DETECT].astype(jnp.int32)

    pyr_right = lk_pyramid_impl(
        right_image, levels=levels, sigma=sigma, pad=pad
    )

    # ---- 1. detection (ops/features.detect_keypoints inlined) -------------
    occ_rows = (flags & (KFL_VALID | KFL_OCCUPY)) > 0
    vals, det_y, det_x = _shi_tomasi_cells(
        pyr_left, px, occ_rows, pad=pad, height=height, width=width,
        radius=radius, min_response=min_response, cell_size=cell_size,
        subpix=subpix,
    )

    # ---- 2. admission in host order (row-major cell, then rank) -----------
    col = jnp.broadcast_to(jnp.arange(KF_TOPK)[None, :], vals.shape)
    admitted = (vals > min_response) & (col < n_cell_detect)
    flat = admitted.reshape(-1)
    before = jnp.cumsum(flat) - flat        # exclusive admitted count
    flat = flat & (before < nb_to_detect)
    slot = n_old + before.astype(jnp.int32)
    flat = flat & (slot < cap)
    n_new = jnp.sum(flat)

    det_px = jnp.stack(
        [det_y.reshape(-1), det_x.reshape(-1)], axis=-1
    ).astype(jnp.float32)
    det_und, _ = _undistort_backproject(det_px, intr_l, dist_l)
    scatter_idx = jnp.where(flat, slot, cap)  # cap = dump row

    if _use_sort_scatter():
        (px_full, und_full), new_mask = _admit_rows(
            scatter_idx, cap, flat, [(px, det_px), (und, det_und)]
        )
        valid_full = valid | new_mask
    else:
        def scatter2(base, values):
            ext = jnp.concatenate([base, jnp.zeros((1, 2), base.dtype)])
            return ext.at[scatter_idx].set(values)[:cap]

        px_full = scatter2(px, det_px)
        und_full = scatter2(und, det_und)
        valid_full = (
            jnp.concatenate([valid, jnp.zeros((1,), bool)])
            .at[scatter_idx].set(flat)[:cap]
        ) | valid

    # ---- 3. stereo KLT over the combined set ------------------------------
    tracked_px, ok, _ = fb_cascade(
        pyr_left, pyr_right, px_full, prior_mask, disp, valid_full,
        levels=levels, prior_level=1, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, max_distance=max_fb_distance,
        min_active=min_active, one_d=stereo_1d,
    )
    # Row-corrected right pixel (map_manager.jl:586-588).
    corrected = jnp.stack([px_full[:, 0], tracked_px[:, 1]], axis=-1)
    right_und, _ = _undistort_backproject(corrected, intr_r, dist_r)

    # ---- 4a. stereo DLT (mapper.jl:142-183; host applies the gates) -------
    X_s = triangulate_points(und_full[:, ::-1], right_und[:, ::-1], P1, P2r)
    w_s = jnp.where(jnp.abs(X_s[:, 3:]) < 1e-12, 1e-12, X_s[:, 3:])
    lp_stereo = X_s[:, :3] / w_s

    # ---- 4b. temporal DLT vs first-observer KFs (mapper.jl:185-263) -------
    P2_rows = group_mats[jnp.clip(group_idx, 0, N_GROUPS - 1)]
    X_t = triangulate_points(obs_und_xy, und_full[:, ::-1], P1, P2_rows)

    per_slot = jnp.concatenate(
        [
            px_full,                                   # 0:2 (incl. new dets)
            tracked_px,                                # 2:4
            ok[:, None].astype(jnp.float32),           # 4
            lp_stereo,                                 # 5:8
            X_t,                                       # 8:12 homogeneous
        ],
        axis=-1,
    )
    return per_slot, n_new


# ---------------------------------------------------------------------------
# Carry-chained keyframe program (async keyframe path).
#
# The round-3 fused keyframe program above still serializes the pipeline at
# every keyframe: the next tracked frame cannot dispatch until the keyframe's
# results are FETCHED, host-gated, and the carry resynced (~90 ms of KF
# exec + RPC + host work on the critical path at the bench's 1/2 keyframe
# cadence). This variant consumes and emits the track_step carry directly
# (models/front_end.py slot layout), so the next track_step chains off the
# post-keyframe carry device-side with NO host round trip:
#
#   carry', per_slot, n_new = keyframe_step_carry(carry, right_img, state)
#
# The host's authoritative f64 gates (mapper.jl:155-181, 239-260) apply one
# frame behind from the fetched per_slot, exactly like tracked frames; the
# kernel predicts the STEREO promotions in f32 (identical formulas on the
# same DLT values — borderline flips are ~never) so the next frames' P3P /
# projection priors see the new 3D points immediately. Temporal-DLT
# promotions and any f32/f64 gate disagreements are reconciled by a cheap
# carry-merge correction (ops/track_step.py::carry_merge) dispatched after
# the host applies the keyframe.
# ---------------------------------------------------------------------------

# Per-slot packed columns of the (cap + N_GROUPS + KS2_MISC_ROWS, 16) upload.
KS2_UND = slice(0, 2)      # current undistorted pixel (y, x) — host f64 cast
KS2_OBS_UND = slice(2, 4)  # first-observer undistorted pixel (x, y)
KS2_GROUP = 4              # temporal group index (-1 = not a candidate)
KS2_FLAGS = 5              # bits below
KS2_FREE = 6               # free-slot list column: row k = k-th free slot
K2_TEMPORAL = 1            # temporal-DLT candidate
K2_TRICAND = 2             # stereo-promotion candidate (2D kp, live 2D mp)
K2_DROP = 4                # host-decided removal (slot dies in the carry)

KS2_MISC_ROWS = 5
# misc layout (80 slots): P1 (16) | P2_right (16) | intr_r (4) | dist_r (4)
# | intr_l (4) | dist_l (4) | n_cell_detect | nb_to_detect | apply_5pt
# | n_free | Ti0 (16, right-camera extrinsics)
M2_P1 = slice(0, 16)
M2_P2R = slice(16, 32)
M2_INTR_R = slice(32, 36)
M2_DIST_R = slice(36, 40)
M2_INTR_L = slice(40, 44)
M2_DIST_L = slice(44, 48)
M2_CELL_DETECT = 48
M2_NB_DETECT = 49
M2_APPLY5PT = 50
M2_NFREE = 51
M2_TI0 = slice(52, 68)


def state2_rows(cap: int) -> int:
    return cap + N_GROUPS + KS2_MISC_ROWS


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "sigma", "min_active",
        "cell_size", "radius", "min_response", "height", "width",
        "threshold", "stereo_1d", "subpix",
    ),
)
def keyframe_step_carry(
    carry,           # track_step carry: {"pyr", "kp" (cap, 10), "misc" (48,)}
    right_image,     # (H, W) right frame
    state,           # (cap + N_GROUPS + KS2_MISC_ROWS, 16) f32 packed upload
    *,
    levels: int, window: int, iters: int = 30, eps: float = 1e-2,
    eig_thresh: float = 1e-4, pad: int = 17, max_fb_distance: float = 1.0,
    sigma: float = 1.0, min_active: int = 0,
    cell_size: int = 35, radius: int = 17, min_response: float = 1e-4,
    height: int = 0, width: int = 0, threshold: float = 3.0,
    stereo_1d: bool = False, subpix: bool = False,
):
    from .se3 import se3_inv
    from .track_step import (
        FL_HAS_MP, FL_JOIN, FL_VALID,
        MS_DISTORTION, MS_HAS_PREV, MS_INTRINSICS, MS_VEL, MS_WC,
        TK_FLAGS, TK_MP, TK_PX,
        _project_distort,
    )

    kp = carry["kp"]
    misc_c = carry["misc"]
    pyr_left = carry["pyr"]
    cap = kp.shape[0]
    slots = state[:cap]
    group_mats = state[cap:cap + N_GROUPS].reshape(N_GROUPS, 4, 4)
    misc = state[cap + N_GROUPS:].reshape(KS2_MISC_ROWS * 16)

    px = kp[:, TK_PX]
    mp_pos = kp[:, TK_MP]
    flags = kp[:, TK_FLAGS].astype(jnp.int32)
    valid = (flags & FL_VALID) > 0
    has_mp = (flags & FL_HAS_MP) > 0

    und_up = slots[:, KS2_UND]
    obs_und_xy = slots[:, KS2_OBS_UND]
    group_idx = slots[:, KS2_GROUP].astype(jnp.int32)
    flags2 = slots[:, KS2_FLAGS].astype(jnp.int32)
    free_list = slots[:, KS2_FREE].astype(jnp.int32)
    tricand = (flags2 & K2_TRICAND) > 0

    P1 = misc[M2_P1].reshape(4, 4)
    P2r = misc[M2_P2R].reshape(4, 4)
    intr_r = misc[M2_INTR_R]
    dist_r = misc[M2_DIST_R]
    intr_l = misc[M2_INTR_L]
    dist_l = misc[M2_DIST_L]
    n_cell_detect = misc[M2_CELL_DETECT].astype(jnp.int32)
    nb_to_detect = misc[M2_NB_DETECT].astype(jnp.int32)
    apply_5pt = misc[M2_APPLY5PT]
    n_free = misc[M2_NFREE].astype(jnp.int32)
    Ti0 = misc[M2_TI0].reshape(4, 4)

    wc = misc_c[MS_WC].reshape(4, 4)
    cw = se3_inv(wc)

    # Host-decided drops (map point vanished etc.) die before everything.
    valid = valid & ((flags2 & K2_DROP) == 0)

    # -- right-projection priors for 3D keypoints (map_manager.jl:451-507) --
    # Computed on device from the carry's map positions: the right camera's
    # cw is Ti0 @ cw_left (camera.jl:61-66).
    proj_r = _project_distort(mp_pos, Ti0 @ cw, intr_r, dist_r)
    in_right = (
        (proj_r[:, 0] >= 0.0) & (proj_r[:, 0] <= float(height - 1))
        & (proj_r[:, 1] >= 0.0) & (proj_r[:, 1] <= float(width - 1))
    )
    prior_mask = valid & has_mp & in_right
    # A 3D keypoint whose right projection leaves the image keeps tracking
    # in the front end but takes no part in this keyframe's stereo step
    # (occupancy-only semantics, map_manager.jl:500-507).
    track_mask = valid & (~has_mp | in_right)
    disp = jnp.where(prior_mask[:, None], 0.5 * (proj_r - px), 0.0)

    pyr_right = lk_pyramid_impl(
        right_image, levels=levels, sigma=sigma, pad=pad
    )

    # -- 1. detection + admission into FREE slots ----------------------------
    vals, det_y, det_x = _shi_tomasi_cells(
        pyr_left, px, valid, pad=pad, height=height, width=width,
        radius=radius, min_response=min_response, cell_size=cell_size,
        subpix=subpix,
    )
    col = jnp.broadcast_to(jnp.arange(KF_TOPK)[None, :], vals.shape)
    admitted = (vals > min_response) & (col < n_cell_detect)
    flat = admitted.reshape(-1)
    before = jnp.cumsum(flat) - flat        # exclusive admitted count
    flat = flat & (before < nb_to_detect) & (before < n_free)
    slot = free_list[jnp.clip(before, 0, cap - 1)]
    n_new = jnp.sum(flat)

    det_px = jnp.stack(
        [det_y.reshape(-1), det_x.reshape(-1)], axis=-1
    ).astype(jnp.float32)
    det_und, _ = _undistort_backproject(det_px, intr_l, dist_l)
    scatter_idx = jnp.where(flat, slot, cap)  # cap = dump row

    if _use_sort_scatter():
        (px_full, und_full), new_mask = _admit_rows(
            scatter_idx, cap, flat, [(px, det_px), (und_up, det_und)]
        )
    else:
        def scatter2(base, values):
            ext = jnp.concatenate([base, jnp.zeros((1, 2), base.dtype)])
            return ext.at[scatter_idx].set(values)[:cap]

        px_full = scatter2(px, det_px)
        und_full = scatter2(und_up, det_und)
        new_mask = (
            jnp.zeros((cap + 1,), bool).at[scatter_idx].set(flat)[:cap]
        )
    valid_full = valid | new_mask
    track_full = track_mask | new_mask

    # -- 2. stereo KLT over the combined set ---------------------------------
    tracked_px, ok, _ = fb_cascade(
        pyr_left, pyr_right, px_full, prior_mask, disp, track_full,
        levels=levels, prior_level=1, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, max_distance=max_fb_distance,
        min_active=min_active, one_d=stereo_1d,
    )
    # Row-corrected right pixel (map_manager.jl:586-588).
    corrected = jnp.stack([px_full[:, 0], tracked_px[:, 1]], axis=-1)
    right_und, _ = _undistort_backproject(corrected, intr_r, dist_r)

    # -- 3a. stereo DLT (mapper.jl:142-183) ----------------------------------
    X_s = triangulate_points(und_full[:, ::-1], right_und[:, ::-1], P1, P2r)
    w_s = jnp.where(jnp.abs(X_s[:, 3:]) < 1e-12, 1e-12, X_s[:, 3:])
    lp = X_s[:, :3] / w_s

    # -- 3b. temporal DLT vs first-observer KFs (mapper.jl:185-263) ----------
    P2_rows = group_mats[jnp.clip(group_idx, 0, N_GROUPS - 1)]
    X_t = triangulate_points(obs_und_xy, und_full[:, ::-1], P1, P2_rows)

    # -- 4. predicted stereo promotion (f32 mirror of the host's f64 gates,
    # mapper.jl:155-181; the host re-decides authoritatively one frame
    # later and corrects via carry_merge) ------------------------------------
    epi = ok & (jnp.abs(und_full[:, 0] - right_und[:, 0]) <= 2.0)
    rp = lp @ Ti0[:3, :3].T + Ti0[:3, 3]
    fx_l, fy_l, cx_l, cy_l = intr_l[0], intr_l[1], intr_l[2], intr_l[3]
    fx_r, fy_r, cx_r, cy_r = intr_r[0], intr_r[1], intr_r[2], intr_r[3]
    zl = jnp.where(jnp.abs(lp[:, 2]) < 1e-12, 1e-12, lp[:, 2])
    zr = jnp.where(jnp.abs(rp[:, 2]) < 1e-12, 1e-12, rp[:, 2])
    proj_l_und = jnp.stack(
        [fy_l * lp[:, 1] / zl + cy_l, fx_l * lp[:, 0] / zl + cx_l], axis=-1
    )
    proj_r_und = jnp.stack(
        [fy_r * rp[:, 1] / zr + cy_r, fx_r * rp[:, 0] / zr + cx_r], axis=-1
    )
    lrepr = jnp.linalg.norm(und_full - proj_l_und, axis=-1)
    rrepr = jnp.linalg.norm(right_und - proj_r_und, axis=-1)
    tri_ok = (
        (lp[:, 2] >= 0.1) & (rp[:, 2] >= 0.1)
        & (lrepr <= threshold) & (rrepr <= threshold)
    )
    promote = epi & tri_ok & (tricand | new_mask)
    wpt = lp @ wc[:3, :3].T + wc[:3, 3]
    mp_new = jnp.where(promote[:, None], wpt, mp_pos)
    has_mp_new = has_mp | promote

    # -- 5. post-keyframe carry ----------------------------------------------
    # Every keypoint observed in the new keyframe joins the join set; the
    # occupancy-only rows (3D, right projection out of image) do not — the
    # host removes their keyframe observation (mapper deferred removals).
    join = (valid & ~(has_mp & ~in_right)) | new_mask
    flags_new = (
        valid_full.astype(jnp.int32) * FL_VALID
        + has_mp_new.astype(jnp.int32) * FL_HAS_MP
        + join.astype(jnp.int32) * FL_JOIN
    )
    prev_bear = jnp.stack(
        [(und_full[:, 1] - cx_l) / fx_l, (und_full[:, 0] - cy_l) / fy_l],
        axis=-1,
    )
    kp_new = jnp.concatenate(
        [
            px_full,                                   # TK_PX
            mp_new,                                    # TK_MP
            und_full[:, ::-1],                         # TK_PREV_UND (x, y)
            prev_bear,                                 # TK_PREV_BEAR (x, y)
            flags_new.astype(jnp.float32)[:, None],    # TK_FLAGS
        ],
        axis=-1,
    )
    misc_new = jnp.concatenate(
        [
            cw.reshape(16),                            # MS_PREV_KF_CW
            misc_c[MS_WC],
            misc_c[MS_VEL],
            jnp.stack([apply_5pt, misc_c[MS_HAS_PREV]]),
            misc_c[MS_INTRINSICS],
            misc_c[MS_DISTORTION],
        ]
    )
    new_carry = {"pyr": pyr_left, "kp": kp_new, "misc": misc_new}

    per_slot = jnp.concatenate(
        [
            px_full,                                   # 0:2 (incl. new dets)
            tracked_px,                                # 2:4
            ok[:, None].astype(jnp.float32),           # 4
            lp,                                        # 5:8
            X_t,                                       # 8:12 homogeneous
            promote[:, None].astype(jnp.float32),      # 12 predicted 3D
        ],
        axis=-1,
    )
    return new_carry, per_slot, n_new
