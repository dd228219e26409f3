"""Fused stereo keyframe step: right-pyramid build + stereo KLT matching +
epipolar gating + stereo DLT triangulation in ONE device program.

Replaces three separate dispatches on the keyframe path (reference
mapper.jl:48-84): `optical_flow_matching(..., stereo=true)`
(map_manager.jl:451-564), `maybe_stereo_update!` (:579-590), and
`triangulate_stereo!` (mapper.jl:142-183). Semantics preserved:

  - 3D keypoints track with the right-projection displacement prior at one
    pyramid level, the rest at the full pyramid, failed-prior retry as
    plain (the shared merged cascade);
  - the epipolar gate compares UNDISTORTED row coordinates (<= 2 px) and
    the accepted right pixel is (left_raw_y, tracked_x) (:586-588);
  - triangulation gates: positive depth (>= 0.1) in both cameras and
    reprojection error <= max_error in both (undistorted pixels vs plain
    pinhole projection, mapper.jl:162-177);
  - world point = frame.wc @ left_camera_point (:179).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .frontend_step import _undistort_backproject
from .image import lk_pyramid_impl
from .lucas_kanade import fb_shadow
from .mvg import triangulate_points


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "epipolar_error", "max_error", "sigma",
        "min_active",
    ),
)
def stereo_step(
    pyr_left, right_image,
    px,              # (N, 2) left pixels (y, x)
    left_raw_y,      # (N,) raw left pixel y (epipolar-corrected right y)
    left_und,        # (N, 2) left undistorted pixels (y, x)
    prior_mask,      # (N,) track with right-projection prior
    disp_prior,      # (N, 2) prior displacement (coarsest-level units)
    valid,           # (N,)
    tri_candidate,   # (N,) stereo-triangulate if matched (2D kp, 2D mp)
    P1, P2,          # (4, 4) triangulation projections (K4, K4_R @ Ti0)
    Ti0,             # (4, 4) left->right camera transform
    wc,              # (4, 4) camera->world of the keyframe
    intr_l, dist_l, intr_r, dist_r,
    *,
    levels: int, window: int, iters: int = 30, eps: float = 1e-2,
    eig_thresh: float = 1e-4, pad: int = 17, max_fb_distance: float = 1.0,
    epipolar_error: float = 2.0, max_error: float = 3.0, sigma: float = 1.0,
    min_active: int = 0,
):
    pyr_right = lk_pyramid_impl(
        right_image, levels=levels, sigma=sigma, pad=pad
    )

    # One doubled-lane cascade tracks both families plus the failed-prior
    # retry simultaneously (fb_shadow — same trick as the tracking step).
    tracked_px, ok, _ = fb_shadow(
        pyr_left, pyr_right, px, prior_mask, disp_prior, valid,
        levels=levels, prior_level=1, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, max_distance=max_fb_distance,
        min_active=min_active,
    )

    # Row-corrected right pixel + its undistorted twin feed the DLT; the
    # epipolar GATE decision itself is re-made on the host in f64 from the
    # raw tracked pixel (f32 boundary flips at the 2 px gate were the first
    # divergence vs the legacy path).
    corrected = jnp.stack([left_raw_y, tracked_px[:, 1]], axis=-1)
    right_und, _ = _undistort_backproject(corrected, intr_r, dist_r)

    # Stereo DLT triangulation for every candidate (mapper.jl:142-183);
    # the host applies the gates.
    X = triangulate_points(
        left_und[:, ::-1], right_und[:, ::-1], P1, P2
    )  # (N, 4) homogeneous, left-camera frame
    w_h = jnp.where(jnp.abs(X[:, 3:]) < 1e-12, 1e-12, X[:, 3:])
    lp = X[:, :3] / w_h

    # Depth/reprojection gating and the world transform run on the HOST in
    # f64 (identical to the legacy path's gates); the kernel returns the raw
    # left-camera triangulations.
    return {
        "tracked_px": tracked_px,
        "ok": ok,
        "left_point": lp,
    }
