"""Fused stereo keyframe step: right-pyramid build + stereo KLT matching +
stereo DLT triangulation in ONE device program.

Replaces three separate dispatches on the keyframe path (reference
mapper.jl:48-84): `optical_flow_matching(..., stereo=true)`
(map_manager.jl:451-564), `maybe_stereo_update!` (:579-590), and
`triangulate_stereo!` (mapper.jl:142-183). Semantics preserved:

  - 3D keypoints track with the right-projection displacement prior at one
    pyramid level, the rest at the full pyramid, failed-prior retry as
    shadow lanes (the shared fb_shadow cascade);
  - the row-corrected right pixel is (left_raw_y, tracked_x) (:586-588);
  - the 2 px epipolar gate and every depth/reprojection gate are re-made
    by the HOST in f64 (models/mapper.py), bit-matching the legacy path's
    decisions; the kernel returns raw tracked pixels + triangulations.

All per-keypoint inputs arrive as ONE packed (N + 6, 7) f32 upload (each
H2D transfer costs ~4-10 ms of tunnel latency).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .frontend_step import _undistort_backproject
from .image import lk_pyramid_impl
from .lucas_kanade import fb_cascade
from .mvg import triangulate_points

# Packed state layout (rows [0, N)): columns
SK_PX = slice(0, 2)       # left pixel (y, x); row y doubles as raw left y
SK_UND = slice(2, 4)      # left undistorted pixel (y, x)
SK_DISP = slice(4, 6)     # right-projection prior displacement
SK_FLAGS = 6              # bit 1 = valid, bit 2 = track with prior
# Rows [N, N+6): misc f32 flattened row-major (42 slots):
#   P1 (16) | P2 (16) | intr_r (4) | dist_r (4) | unused (2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_fb_distance", "sigma", "min_active",
    ),
)
def stereo_step(
    pyr_left, right_image, state,
    *,
    levels: int, window: int, iters: int = 30, eps: float = 1e-2,
    eig_thresh: float = 1e-4, pad: int = 17, max_fb_distance: float = 1.0,
    sigma: float = 1.0, min_active: int = 0,
):
    pyr_right = lk_pyramid_impl(
        right_image, levels=levels, sigma=sigma, pad=pad
    )

    px = state[:-6, SK_PX]
    left_und = state[:-6, SK_UND]
    disp_prior = state[:-6, SK_DISP]
    flags = state[:-6, SK_FLAGS].astype(jnp.int32)
    valid = (flags & 1) > 0
    prior_mask = (flags & 2) > 0
    misc = state[-6:, :].reshape(42)
    P1 = misc[0:16].reshape(4, 4)
    P2 = misc[16:32].reshape(4, 4)
    intr_r = misc[32:36]
    dist_r = misc[36:40]

    # One doubled-lane cascade tracks both families plus the failed-prior
    # retry simultaneously (fb_shadow — same trick as the tracking step).
    tracked_px, ok, _ = fb_cascade(
        pyr_left, pyr_right, px, prior_mask, disp_prior, valid,
        levels=levels, prior_level=1, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, max_distance=max_fb_distance,
        min_active=min_active,
    )

    # Row-corrected right pixel + its undistorted twin feed the DLT; the
    # epipolar GATE decision itself is re-made on the host in f64 from the
    # raw tracked pixel (f32 boundary flips at the 2 px gate were the first
    # divergence vs the legacy path).
    corrected = jnp.stack([px[:, 0], tracked_px[:, 1]], axis=-1)
    right_und, _ = _undistort_backproject(corrected, intr_r, dist_r)

    # Stereo DLT triangulation for every candidate (mapper.jl:142-183);
    # the host applies the gates.
    X = triangulate_points(
        left_und[:, ::-1], right_und[:, ::-1], P1, P2
    )  # (N, 4) homogeneous, left-camera frame
    w_h = jnp.where(jnp.abs(X[:, 3:]) < 1e-12, 1e-12, X[:, 3:])
    lp = X[:, :3] / w_h

    return {
        "tracked_px": tracked_px,
        "ok": ok,
        "left_point": lp,
    }
