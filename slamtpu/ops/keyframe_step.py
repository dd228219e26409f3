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


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "sigma", "min_active",
        "cell_size", "radius", "min_response", "height", "width",
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
    height: int = 0, width: int = 0,
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

    # ---- 1. detection (ops/features.detect_keypoints inlined). The
    # Shi-Tomasi response reuses the carry pyramid's Scharr gradients
    # (stack Iy/Ix, computed
    # pre-padding, so the crop is bit-exact with gradients of the raw
    # image) — only the sigma-1 product blurs remain, batched into one
    # grouped separable pass. -----------------------------------------------
    sl = (slice(pad, pad + height), slice(pad, pad + width))
    iy = pyr_left[0]["Iy"][sl]
    ix = pyr_left[0]["Ix"][sl]
    prods = jnp.stack([iy * iy, ix * ix, iy * ix])
    k1 = np.stack([gaussian_kernel_1d(1.0)] * 3)
    sm = _conv_grouped(_conv_grouped(prods, k1, 0), k1, 1)
    half_tr = 0.5 * (sm[0] + sm[1])
    disc = jnp.sqrt(jnp.square(0.5 * (sm[0] - sm[1])) + jnp.square(sm[2]))
    resp = half_tr - disc

    # Occupancy suppression BEFORE the 3x3 NMS — ordering is load-bearing:
    # zeroing the suppressed region first lets a weaker corner just outside
    # it survive NMS against a stronger suppressed neighbor (admission
    # parity with ops/features.detect_keypoints; a post-top-k pairwise
    # variant admitted a strict subset and starved the map).
    yx = jnp.round(px).astype(jnp.int32)
    yx = jnp.clip(yx, 0, jnp.array([height - 1, width - 1]))
    occ_rows = (flags & (KFL_VALID | KFL_OCCUPY)) > 0
    occ = jnp.zeros((height, width), jnp.float32).at[yx[:, 0], yx[:, 1]].max(
        occ_rows.astype(jnp.float32)
    )
    resp = jnp.where(_dilate(occ, radius) > 0.0, 0.0, resp)
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    resp = jnp.where((resp >= pooled) & (resp > min_response), resp, 0.0)
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
        min_active=min_active,
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
