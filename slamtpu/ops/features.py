"""Shi-Tomasi keypoint detection with grid budgeting + BRIEF-256 descriptors.

TPU-native replacement for reference src/extractor.jl. Design differences
(documented; trajectory-level parity, not bitwise):
  - The min-eigenvalue response is computed once over the WHOLE image, then
    reduced per grid cell (the reference recomputes shi_tomasi per 35x35 cell
    view, extractor.jl:86, inheriting per-cell border effects).
  - Existing-keypoint avoidance suppresses the response inside a dilated
    occupancy region (separable max-pool of radius r) instead of multiplying
    the image by a blurred circle mask (extractor.jl:63-95) — same intent
    (no re-detections near tracked points), far cheaper on TPU.
  - Per-cell top-k is a single reshape + top_k over a padded cell layout; the
    host keeps the first `k` responses above `min_response` per cell
    (mirrors extractor.jl:24-42 response sorting + cap).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .image import gaussian_blur, scharr_gradients

# Max detections returned per grid cell; the host trims to the dynamic
# per-cell budget n_cell_detect = ceil(n_detect / n_cells) (extractor.jl:76).
CELL_TOPK = 8


def shi_tomasi_response(img, sigma: float = 1.0):
    """Min-eigenvalue corner response (ImageFeatures.shi_tomasi equivalent)."""
    iy, ix = scharr_gradients(img)
    gyy = gaussian_blur(iy * iy, sigma)
    gxx = gaussian_blur(ix * ix, sigma)
    gyx = gaussian_blur(iy * ix, sigma)
    half_tr = 0.5 * (gyy + gxx)
    disc = jnp.sqrt(jnp.square(0.5 * (gyy - gxx)) + jnp.square(gyx))
    return half_tr - disc


def _dilate(occ, radius: int):
    """Binary dilation with a (2r+1) square, as a separable box-sum conv.

    The occupancy map is {0, 1}, so max-pool dilation == "any occupied in
    the window" == box-sum > 0. Convs on this backend cost ~1.8 ms/pass
    regardless of tap count while reduce_window costs 4-8 ms/pass
    (PERF.md cost model), so the conv form halves the dilation's share of
    detection exec. Counts are small integers — exact in f32. Returns a
    {0., 1.} map so callers' `> 0.0` threshold semantics are unchanged.
    """
    k = 2 * radius + 1
    ones = jnp.ones((k,), jnp.float32)
    x = occ[None, None]  # NCHW
    x = jax.lax.conv_general_dilated(
        x, ones[None, None, :, None], (1, 1), [(radius, radius), (0, 0)]
    )
    x = jax.lax.conv_general_dilated(
        x, ones[None, None, None, :], (1, 1), [(0, 0), (radius, radius)]
    )
    return (x[0, 0] > 0.5).astype(occ.dtype)


def subpixel_refine(resp_raw, ys, xs):
    """Parabola-vertex subpixel refinement of detected corners on the RAW
    Shi-Tomasi response (pre-suppression/NMS — the zeroed neighbors of the
    NMS map would break the fit). Per axis:

        offset = (f(-1) - f(+1)) / (2 (f(-1) - 2 f(0) + f(+1)))

    clamped to [-0.5, 0.5] and zeroed at image borders or non-strict
    maxima. Beyond the reference (integer ImageFeatures corners,
    extractor.jl:63-95): integer detection quantizes corners at ~0.29 px
    RMS, which is the stereo-triangulation noise floor of the bench
    (PERF.md). Returns float32 (ys + dy, xs + dx) with ys/xs int shapes
    preserved."""
    h, w = resp_raw.shape
    shape = ys.shape
    yf = ys.reshape(-1).astype(jnp.int32)
    xf = xs.reshape(-1).astype(jnp.int32)
    # Clamp the window to the image: border detections get a shifted
    # window, but ok_y/ok_x already zero their offsets — the clamp only
    # keeps the gather starts non-negative (the DMA gather clamps
    # negatives to the HIGH end, unlike dynamic_slice).
    start = jnp.stack(
        [jnp.clip(yf - 1, 0, h - 3), jnp.clip(xf - 1, 0, w - 3)], axis=-1
    )

    from .dma_gather import gather_windows, use_dma_gather

    if use_dma_gather():
        win = gather_windows(resp_raw[None], start, 3, 3)[:, 0]
    else:
        def one(s):
            return jax.lax.dynamic_slice(
                resp_raw, (s[0], s[1]), (3, 3)
            )
        win = jax.vmap(one)(start)
    f0 = win[:, 1, 1]
    num_y = win[:, 0, 1] - win[:, 2, 1]
    den_y = win[:, 0, 1] - 2.0 * f0 + win[:, 2, 1]
    num_x = win[:, 1, 0] - win[:, 1, 2]
    den_x = win[:, 1, 0] - 2.0 * f0 + win[:, 1, 2]
    ok_y = (yf >= 1) & (yf <= h - 2) & (den_y < -1e-12)
    ok_x = (xf >= 1) & (xf <= w - 2) & (den_x < -1e-12)
    dy = jnp.where(
        ok_y,
        jnp.clip(num_y / (2.0 * jnp.where(ok_y, den_y, -1.0)), -0.5, 0.5),
        0.0,
    )
    dx = jnp.where(
        ok_x,
        jnp.clip(num_x / (2.0 * jnp.where(ok_x, den_x, -1.0)), -0.5, 0.5),
        0.0,
    )
    ysf = (yf.astype(jnp.float32) + dy).reshape(shape)
    xsf = (xf.astype(jnp.float32) + dx).reshape(shape)
    return ysf, xsf


@functools.partial(
    jax.jit,
    static_argnames=("cell_size", "radius", "min_response", "subpix"),
)
def detect_keypoints(img, occupied_px, occupied_valid, *, cell_size: int,
                     radius: int, min_response: float = 1e-4,
                     subpix: bool = False):
    """Grid-budgeted Shi-Tomasi detection (reference extractor.jl:63-95).

    img: (H, W) f32 in [0, 1].
    occupied_px: (M, 2) f32 existing keypoint pixels (y, x); detections are
        suppressed within `radius` (Chebyshev) of any valid entry.
    occupied_valid: (M,) bool.

    Returns (responses, ys, xs) each (n_cells, CELL_TOPK); cells ordered
    row-major over the grid, entries sorted by descending response. Invalid
    slots have response <= 0.
    """
    h, w = img.shape
    img = img.astype(jnp.float32)
    resp = shi_tomasi_response(img)
    resp_raw = resp

    # Suppress around existing keypoints. (NOTE: a one-hot outer-product
    # matmul formulation of this scatter ran at the same ~39 ms warm but
    # took the remote XLA helper ~500 s to compile — keep the scatter.)
    yx = jnp.round(occupied_px).astype(jnp.int32)
    yx = jnp.clip(yx, 0, jnp.array([h - 1, w - 1]))

    from .detect_pallas import suppress_and_nms, use_detect_pallas

    if use_detect_pallas():
        # Fused VMEM kernel: rasterize + dilate + suppress + NMS in one
        # pass (ops/detect_pallas.py) — replaces the ~8 ms scatter, the
        # dilation convs and the reduce_window below.
        resp = suppress_and_nms(
            resp, yx, occupied_valid, radius=radius,
            min_response=min_response,
        )
    else:
        occ = jnp.zeros((h, w), jnp.float32).at[yx[:, 0], yx[:, 1]].max(
            occupied_valid.astype(jnp.float32)
        )
        suppressed = _dilate(occ, radius) > 0.0
        resp = jnp.where(suppressed, 0.0, resp)

        # Local maxima (3x3) above min_response.
        pooled = jax.lax.reduce_window(
            resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        resp = jnp.where(
            (resp >= pooled) & (resp > min_response), resp, 0.0
        )

    # Per-cell top-k via padded reshape.
    gy = -(-h // cell_size)
    gx = -(-w // cell_size)
    padded = jnp.pad(resp, ((0, gy * cell_size - h), (0, gx * cell_size - w)))
    cells = padded.reshape(gy, cell_size, gx, cell_size)
    cells = cells.transpose(0, 2, 1, 3).reshape(gy * gx, cell_size * cell_size)
    vals, idx = jax.lax.top_k(cells, CELL_TOPK)

    cell_ids = jnp.arange(gy * gx)
    cy = (cell_ids // gx)[:, None] * cell_size + idx // cell_size
    cx = (cell_ids % gx)[:, None] * cell_size + idx % cell_size
    if subpix:
        return (vals,) + subpixel_refine(resp_raw, cy, cx)
    return vals, cy.astype(jnp.int32), cx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# BRIEF-256 (reference extractor.jl:22 BRIEF(size=256), describe :103-105).
# Fixed Gaussian sampling pattern (seeded) within a 33x33 patch on a
# sigma=2-smoothed image; host-side packing into uint64[4].
# ---------------------------------------------------------------------------

_BRIEF_PATCH = 16  # half-size of the sampling patch


def brief_pattern(size: int = 256, seed: int = 123) -> np.ndarray:
    """(size, 4) int offsets (y1, x1, y2, x2), Gaussian sampled, clipped."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _BRIEF_PATCH / 2.5, size=(size, 4))
    return np.clip(np.round(pts), -_BRIEF_PATCH, _BRIEF_PATCH).astype(np.int32)


@functools.partial(jax.jit, static_argnames=())
def brief_describe(img, keypoints, valid, pattern):
    """Binary descriptors for N keypoints.

    img: (H, W) f32; keypoints: (N, 2) f32 (y, x); pattern: (256, 4) int32.
    Returns (N, 256) uint8 bits and an (N,) bool mask of keypoints whose
    whole patch lies inside the image.
    """
    h, w = img.shape
    smooth = gaussian_blur(img.astype(jnp.float32), 2.0)
    kp = jnp.round(keypoints).astype(jnp.int32)
    inb = (
        (kp[:, 0] >= _BRIEF_PATCH)
        & (kp[:, 0] < h - _BRIEF_PATCH)
        & (kp[:, 1] >= _BRIEF_PATCH)
        & (kp[:, 1] < w - _BRIEF_PATCH)
        & valid
    )
    kp = jnp.clip(kp, _BRIEF_PATCH, jnp.array([h - 1 - _BRIEF_PATCH,
                                               w - 1 - _BRIEF_PATCH]))
    y1 = kp[:, 0:1] + pattern[None, :, 0]
    x1 = kp[:, 1:2] + pattern[None, :, 1]
    y2 = kp[:, 0:1] + pattern[None, :, 2]
    x2 = kp[:, 1:2] + pattern[None, :, 3]
    bits = smooth[y1, x1] < smooth[y2, x2]
    return bits.astype(jnp.uint8), inb


def pack_descriptor_bits(bits: np.ndarray) -> np.ndarray:
    """(N, 256) 0/1 -> (N, 32) uint8 packed for fast host Hamming."""
    return np.packbits(np.asarray(bits, dtype=np.uint8), axis=-1)


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int32)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Packed uint8 descriptors -> Hamming distance (broadcasts)."""
    return _POPCOUNT[np.bitwise_xor(a, b)].sum(axis=-1)
