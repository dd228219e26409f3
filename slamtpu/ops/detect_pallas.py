"""Fused Pallas kernel for detection suppression + NMS.

The XLA detection tail (ops/features.py::detect_keypoints and its inlined
twin in ops/keyframe_step.py::_shi_tomasi_cells) pays, per keyframe:
~8 ms for the 1024-point occupancy scatter (per-point serialized, like the
round-2 window gathers), ~3.6 ms for the conv-form square dilation, 4-8 ms
for the 3x3 reduce_window NMS, and ~2 ms per full-image elementwise pass
for the suppress/threshold wheres — all HBM round trips (PERF.md cost
model). This kernel fuses everything downstream of the Shi-Tomasi response
into ONE VMEM-resident pass:

  1. occupancy rasterization: per point, ONE row write of the
     x-dilated interval [x-r, x+r] (a lane-iota compare — no per-pixel
     scatter, no dynamic lane indexing; the row index is a dynamic
     SUBLANE offset, which Mosaic supports);
  2. y-dilation by 2r static sublane shifts (completes the exact
     (2r+1)-square Chebyshev dilation of ops/features.py::_dilate);
  3. suppression (zero the response inside dilated occupancy — the
     load-bearing dilate-BEFORE-NMS ordering, see PERF.md);
  4. 3x3 NMS + min_response threshold.

Output: the suppressed, NMS'd response map; the per-cell top-k stays in
XLA (lax.top_k measures fine, ~1.7 ms).

Reference semantics mirrored: extractor.jl:63-95 (detection budget /
suppression radius), with the same results as the XLA path bit-for-bit on
the {0,1} occupancy algebra (max/compare only — no float accumulation).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_detect_pallas() -> bool:
    """Trace-time switch: default ON on TPU backends since the round-4
    on-device A/B — the fused suppression+NMS kernel cut the keyframe
    program from 213.7 to 48.3 ms (PERF.md round-4 table). Opt out with
    SLAMTPU_NO_PALLAS_DETECT=1; SLAMTPU_PALLAS_DETECT=1 forces it on
    elsewhere (interpret mode covers CPU tests)."""
    if os.environ.get("SLAMTPU_NO_PALLAS_DETECT"):
        return False
    if os.environ.get("SLAMTPU_PALLAS_DETECT"):
        return True
    import jax

    return jax.default_backend() == "tpu"


def _detect_kernel(yx_ref, val_ref, resp_ref, out_ref, occ_ref, *,
                   radius, min_response):
    h, w = resp_ref.shape
    r = radius
    n = yx_ref.shape[0]

    # --- 1. rasterize x-dilated occupancy rows --------------------------
    occ_ref[...] = jnp.zeros((h, w), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def body(i, _):
        @pl.when(val_ref[i] > 0)
        def _():
            y = yx_ref[i, 0]
            x = yx_ref[i, 1]
            row = ((lane >= x - r) & (lane <= x + r)).astype(jnp.float32)
            cur = occ_ref[pl.ds(y, 1), :]
            occ_ref[pl.ds(y, 1), :] = jnp.maximum(cur, row)
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    # --- 2. y-dilation by static shifts (exact (2r+1) square) -----------
    o = occ_ref[...]
    dil = o
    for dy in range(1, r + 1):
        up = jnp.concatenate([o[dy:], jnp.zeros((dy, w), jnp.float32)], 0)
        down = jnp.concatenate([jnp.zeros((dy, w), jnp.float32), o[:-dy]], 0)
        dil = jnp.maximum(dil, jnp.maximum(up, down))

    # --- 3. suppress BEFORE NMS (ordering is load-bearing) --------------
    resp = jnp.where(dil > 0.5, 0.0, resp_ref[...])

    # --- 4. 3x3 NMS + threshold ------------------------------------------
    neg = jnp.float32(-jnp.inf)

    def shift_y(a, dy):
        if dy > 0:
            return jnp.concatenate([a[dy:], jnp.full((dy, w), neg)], 0)
        if dy < 0:
            return jnp.concatenate([jnp.full((-dy, w), neg), a[:dy]], 0)
        return a

    def shift_x(a, dx):
        if dx > 0:
            return jnp.concatenate([a[:, dx:], jnp.full((h, dx), neg)], 1)
        if dx < 0:
            return jnp.concatenate([jnp.full((h, -dx), neg), a[:, :dx]], 1)
        return a

    pooled = jnp.full((h, w), neg)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            pooled = jnp.maximum(pooled, shift_x(shift_y(resp, dy), dx))
    out_ref[...] = jnp.where(
        (resp >= pooled) & (resp > min_response), resp, 0.0
    )


def suppress_and_nms(resp, yx, occ_valid, *, radius: int,
                     min_response: float, interpret=None):
    """Occupancy-suppressed 3x3 NMS of a response map, fused in VMEM.

    resp: (H, W) f32 Shi-Tomasi response; yx: (N, 2) int32 occupied pixels
    (pre-clipped to the image); occ_valid: (N,) bool. Returns the (H, W)
    map with non-maxima and suppressed/below-threshold pixels zeroed —
    identical to the XLA tail of detect_keypoints.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = resp.shape
    return pl.pallas_call(
        functools.partial(
            _detect_kernel, radius=radius, min_response=min_response
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # yx
            pl.BlockSpec(memory_space=pltpu.SMEM),   # val
            pl.BlockSpec(memory_space=pltpu.VMEM),   # resp
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        interpret=interpret,
    )(yx.astype(jnp.int32), occ_valid.astype(jnp.int32),
      resp.astype(jnp.float32))
