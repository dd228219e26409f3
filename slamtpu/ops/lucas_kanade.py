"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for reference src/optical_flow/lucas_kanade.jl and
src/tracker.jl. The reference iterates per point inside a Threads.@threads
loop (lucas_kanade.jl:33); here ALL keypoints advance together as one padded
(N, ...) batch per pyramid level inside a single jitted program:

  - per level: gather each point's (2w+1)x(2w+1) window of the first image,
    its Scharr gradients, and the sigma=4-smoothed gradient products once;
  - run a masked `lax.while_loop` over solver iterations (early exit when
    every active point converged — mirrors the reference's per-point epsilon
    termination, lucas_kanade.jl:81-82);
  - the structure tensor G is a masked window sum (exactly the reference's
    integral-image boxdiff, lucas_kanade.jl:140-157) inverted by the
    closed-form 2x2 SVD pseudo-inverse (optical_flow/utils.jl:5-45);
  - the second image is sampled bilinearly at the moving correspondence
    (the only per-iteration gather).

Semantics preserved from the reference:
  - integer level coordinates: floor(point / 2^level) (lucas_kanade.jl:197);
  - window clamping to level bounds from BOTH endpoints (get_offsets,
    lucas_kanade.jl:199-208) via validity masks;
  - min-eigenvalue rejection normalized by window pixel count (:154);
  - displacement priors enter in coarsest-level units and double per level
    (:94-95); epsilon termination does NOT apply the final step (:81-84);
  - a point that fails at any level stays failed (:34).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .dma_gather import gather_windows, use_dma_gather
from .image import pyramid_level_shape


def svd2x2_sym_eig(a, b, c):
    """Eigenvalues (descending) of the symmetric 2x2 [[a, b], [b, c]]."""
    half_tr = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.square(0.5 * (a - c)) + jnp.square(b))
    return half_tr + disc, half_tr - disc


def pinv2x2_sym(a, b, c, tol_scale: float = 1e-6):
    """Moore-Penrose pseudo-inverse of symmetric 2x2, closed form.

    Mirrors reference svd2x2 + pinv2x2 (optical_flow/utils.jl): singular
    values below tol = tol_scale * s_max are zeroed instead of inverted.
    """
    s1, s2 = svd2x2_sym_eig(a, b, c)
    # Eigenvector for s1: rotate by phi where tan(2 phi) = 2b / (a - c).
    theta = 0.5 * jnp.arctan2(2.0 * b, a - c)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    tol = tol_scale * jnp.maximum(jnp.abs(s1), jnp.abs(s2))
    inv1 = jnp.where(jnp.abs(s1) > tol, 1.0 / s1, 0.0)
    inv2 = jnp.where(jnp.abs(s2) > tol, 1.0 / s2, 0.0)
    # G_inv = V diag(inv) V^T with V = [[ct, -st], [st, ct]].
    ia = inv1 * ct * ct + inv2 * st * st
    ib = (inv1 - inv2) * ct * st
    ic = inv1 * st * st + inv2 * ct * ct
    return ia, ib, ic, s1, s2


def _gather_window(img, start_yx, size):
    """vmapped dynamic-slice gather: (H, W), (N, 2) -> (N, size, size)."""
    def one(s):
        return jax.lax.dynamic_slice(img, (s[0], s[1]), (size, size))
    return jax.vmap(one)(start_yx)


def _lk_level(d1, d2, p_lvl, flow, ok, *, hw, window, iters, eps,
              eig_thresh, pad, min_active: int = 0,
              escape_fail: bool = False):
    """One pyramid level for all N points.

    p_lvl: (N, 2) int32 integer level coordinates (y, x).
    flow:  (N, 2) f32 displacement at this level's scale.
    ok:    (N,) bool — points still alive.
    """
    H, W = hw
    w = window
    T = 2 * w + 1
    n = p_lvl.shape[0]

    oy = jnp.arange(-w, w + 1, dtype=jnp.float32)[:, None]
    ox = jnp.arange(-w, w + 1, dtype=jnp.float32)[None, :]

    start = p_lvl - w + pad
    if "stack" in d1:
        def one(s):
            return jax.lax.dynamic_slice(
                d1["stack"], (0, s[0], s[1]), (6, T, T)
            )
        stack_w = jax.vmap(one)(start)  # one gather for all six maps
        img1_w, iy_w, ix_w = stack_w[:, 0], stack_w[:, 1], stack_w[:, 2]
        gyy_w, gxx_w, gyx_w = stack_w[:, 3], stack_w[:, 4], stack_w[:, 5]
    else:
        img1_w = _gather_window(d1["img"], start, T)
        iy_w = _gather_window(d1["Iy"], start, T)
        ix_w = _gather_window(d1["Ix"], start, T)
        gyy_w = _gather_window(d1["Gyy"], start, T)
        gxx_w = _gather_window(d1["Gxx"], start, T)
        gyx_w = _gather_window(d1["Gyx"], start, T)

    p_f = p_lvl.astype(jnp.float32)
    hw_max = jnp.array([H - 1, W - 1], dtype=jnp.float32)

    def window_mask(q):
        """Clamped-window validity mask (N, T, T); reference get_offsets."""
        up = jnp.floor(jnp.minimum(float(w), jnp.minimum(p_f[:, 0], q[:, 0])))
        down = jnp.floor(
            jnp.minimum(float(w), hw_max[0] - jnp.maximum(p_f[:, 0], q[:, 0]))
        )
        left = jnp.floor(jnp.minimum(float(w), jnp.minimum(p_f[:, 1], q[:, 1])))
        right = jnp.floor(
            jnp.minimum(float(w), hw_max[1] - jnp.maximum(p_f[:, 1], q[:, 1]))
        )
        my = (oy[None] >= -up[:, None, None]) & (oy[None] <= down[:, None, None])
        mx = (ox[None] >= -left[:, None, None]) & (ox[None] <= right[:, None, None])
        return (my & mx).astype(jnp.float32)

    def structure_tensor(mask):
        syy = jnp.sum(gyy_w * mask, axis=(1, 2))
        sxx = jnp.sum(gxx_w * mask, axis=(1, 2))
        syx = jnp.sum(gyx_w * mask, axis=(1, 2))
        ia, ib, ic, _, s2 = pinv2x2_sym(syy, syx, sxx)
        count = jnp.sum(mask, axis=(1, 2))
        min_eig = s2 / jnp.maximum(count, 1.0)
        return ia, ib, ic, min_eig

    def in_bounds(q):
        return (
            (q[:, 0] >= 0.0)
            & (q[:, 0] <= hw_max[0])
            & (q[:, 1] >= 0.0)
            & (q[:, 1] <= hw_max[1])
        )

    def body(carry):
        it, flow, running, ok = carry
        q = p_f + flow
        inb = in_bounds(q)
        fail = running & ~inb

        mask = window_mask(jnp.where(inb[:, None], q, p_f))
        ia, ib, ic, min_eig = structure_tensor(mask)
        fail = fail | (running & (min_eig < eig_thresh))

        # Bilinear sample of the second image around q.
        q_floor = jnp.floor(q)
        frac = q - q_floor
        base = q_floor.astype(jnp.int32) - w + pad
        big = _gather_window(d2["img"], base, T + 1)  # (N, T+1, T+1)
        fy = frac[:, 0][:, None, None]
        fx = frac[:, 1][:, None, None]
        img2_s = (
            (1.0 - fy) * (1.0 - fx) * big[:, :T, :T]
            + (1.0 - fy) * fx * big[:, :T, 1:]
            + fy * (1.0 - fx) * big[:, 1:, :T]
            + fy * fx * big[:, 1:, 1:]
        )

        diff = (img1_w - img2_s) * mask
        by = jnp.sum(diff * iy_w, axis=(1, 2))
        bx = jnp.sum(diff * ix_w, axis=(1, 2))
        step_y = ia * by + ib * bx
        step_x = ib * by + ic * bx

        converged = (jnp.abs(step_y) < eps) & (jnp.abs(step_x) < eps)
        new_flow = flow + jnp.stack([step_y, step_x], axis=-1)
        fail = fail | (running & ~converged & ~in_bounds(p_f + new_flow))

        advance = running & ~fail & ~converged
        flow = jnp.where(advance[:, None], new_flow, flow)
        ok = ok & ~fail
        running = running & ok & ~converged
        return it + 1, flow, running, ok

    # min_active > 0: production early stop — end the level once only a
    # handful of stragglers still iterate (their round-trip check filters
    # unconverged survivors). Scaled by the live point count so small
    # batches keep near-exact semantics; 0 = exact reference behavior.
    stop_thresh = jnp.minimum(min_active, jnp.sum(ok) // 32)

    def cond(carry):
        it, _, running, _ = carry
        return (it < iters) & (jnp.sum(running) > stop_thresh)

    _, flow, _, ok = jax.lax.while_loop(cond, body, (0, flow, ok, ok))
    return flow, ok


# Patch margin for the cached-window LK iteration: the second image is
# gathered once per level as a (T+1+2*MARGIN)^2 patch per point; solver
# iterations sample inside it with static shifted slices (no per-iteration
# HBM gathers — gather latency dominates on the tunnel-attached device).
# In the lane-major kernel a point drifting past the margin FAILS (its flow
# never updates from clamped data); measured intra-level drift is <= 7 px
# at KITTI scale, so margin 6 makes escapes rare, and the forward-backward
# check plus the failed-prior retry absorb them. (A conditional re-gather
# inside the while_loop costs ~0.9 ms/iteration on TPU — the cond's gather
# branch serializes the loop — which dominated the whole front-end.)
LK_PATCH_MARGIN = 6


def lk_pad(window: int) -> int:
    """Image padding required by the LK kernels for a given half-window."""
    return window + LK_PATCH_MARGIN + 2


def _lk_level_patch(d1, d2, p_lvl, flow, ok, *, hw, window, iters, eps,
                    eig_thresh, pad, min_active: int = 0,
                    escape_fail: bool = False):
    """Patch-cached variant of _lk_level (same contract and semantics).

    The per-iteration bilinear sample of the second image reads from a
    per-point (P, P) patch held in registers/VMEM, selected with 2*MARGIN+1
    static shifted slices instead of a dynamic gather; the patch is
    re-gathered (for all points at their current correspondence) only when
    any active point leaves its margin.
    """
    H, W = hw
    w = window
    T = 2 * w + 1
    R = LK_PATCH_MARGIN
    P = T + 1 + 2 * R
    n = p_lvl.shape[0]

    oy = jnp.arange(-w, w + 1, dtype=jnp.float32)[:, None]
    ox = jnp.arange(-w, w + 1, dtype=jnp.float32)[None, :]

    start = p_lvl - w + pad
    def one(s):
        return jax.lax.dynamic_slice(d1["stack"], (0, s[0], s[1]), (6, T, T))
    stack_w = jax.vmap(one)(start)
    img1_w, iy_w, ix_w = stack_w[:, 0], stack_w[:, 1], stack_w[:, 2]
    gyy_w, gxx_w, gyx_w = stack_w[:, 3], stack_w[:, 4], stack_w[:, 5]

    p_f = p_lvl.astype(jnp.float32)
    hw_max = jnp.array([H - 1, W - 1], dtype=jnp.float32)

    def window_mask(q):
        up = jnp.floor(jnp.minimum(float(w), jnp.minimum(p_f[:, 0], q[:, 0])))
        down = jnp.floor(
            jnp.minimum(float(w), hw_max[0] - jnp.maximum(p_f[:, 0], q[:, 0]))
        )
        left = jnp.floor(jnp.minimum(float(w), jnp.minimum(p_f[:, 1], q[:, 1])))
        right = jnp.floor(
            jnp.minimum(float(w), hw_max[1] - jnp.maximum(p_f[:, 1], q[:, 1]))
        )
        my = (oy[None] >= -up[:, None, None]) & (oy[None] <= down[:, None, None])
        mx = (ox[None] >= -left[:, None, None]) & (ox[None] <= right[:, None, None])
        return (my & mx).astype(jnp.float32)

    def structure_tensor(mask):
        syy = jnp.sum(gyy_w * mask, axis=(1, 2))
        sxx = jnp.sum(gxx_w * mask, axis=(1, 2))
        syx = jnp.sum(gyx_w * mask, axis=(1, 2))
        ia, ib, ic, _, s2 = pinv2x2_sym(syy, syx, sxx)
        count = jnp.sum(mask, axis=(1, 2))
        return ia, ib, ic, s2 / jnp.maximum(count, 1.0)

    def in_bounds(q):
        return (
            (q[:, 0] >= 0.0) & (q[:, 0] <= hw_max[0])
            & (q[:, 1] >= 0.0) & (q[:, 1] <= hw_max[1])
        )

    def gather_patches(q):
        """(N, P, P) patches of the second image centered at floor(q)."""
        base = jnp.floor(q).astype(jnp.int32) - w - R + pad
        def onep(s):
            return jax.lax.dynamic_slice(d2["img"], (s[0], s[1]), (P, P))
        return jax.vmap(onep)(base), base

    def select_window(patch, rel):
        """(N, P, P), (N, 2) int in [0, 2R] -> (N, T+1, T+1) windows using
        static shifted slices."""
        rows = jnp.zeros((n, T + 1, P), jnp.float32)
        for a in range(2 * R + 1):
            sel = (rel[:, 0] == a).astype(jnp.float32)[:, None, None]
            rows = rows + sel * patch[:, a:a + T + 1, :]
        out = jnp.zeros((n, T + 1, T + 1), jnp.float32)
        for b in range(2 * R + 1):
            sel = (rel[:, 1] == b).astype(jnp.float32)[:, None, None]
            out = out + sel * rows[:, :, b:b + T + 1]
        return out

    q0 = p_f + flow
    patch0, base0 = gather_patches(jnp.where(in_bounds(q0)[:, None], q0, p_f))

    def body(carry):
        it, flow, running, ok, patch, base = carry
        q = p_f + flow
        inb = in_bounds(q)
        fail = running & ~inb

        q_safe = jnp.where(inb[:, None], q, p_f)
        mask = window_mask(q_safe)
        ia, ib, ic, min_eig = structure_tensor(mask)
        fail = fail | (running & (min_eig < eig_thresh))

        q_floor = jnp.floor(q_safe)
        frac = q_safe - q_floor
        rel = q_floor.astype(jnp.int32) - w + pad - base  # in [0, 2R] ideally
        escaped = running & (
            (rel[:, 0] < 0) | (rel[:, 0] > 2 * R)
            | (rel[:, 1] < 0) | (rel[:, 1] > 2 * R)
        )

        def regather(_):
            return gather_patches(q_safe)

        patch, base = jax.lax.cond(
            jnp.any(escaped), regather, lambda _: (patch, base), None
        )
        rel = jnp.clip(
            q_floor.astype(jnp.int32) - w + pad - base, 0, 2 * R
        )

        big = select_window(patch, rel)  # (N, T+1, T+1)
        fy = frac[:, 0][:, None, None]
        fx = frac[:, 1][:, None, None]
        img2_s = (
            (1.0 - fy) * (1.0 - fx) * big[:, :T, :T]
            + (1.0 - fy) * fx * big[:, :T, 1:]
            + fy * (1.0 - fx) * big[:, 1:, :T]
            + fy * fx * big[:, 1:, 1:]
        )

        diff = (img1_w - img2_s) * mask
        by = jnp.sum(diff * iy_w, axis=(1, 2))
        bx = jnp.sum(diff * ix_w, axis=(1, 2))
        step_y = ia * by + ib * bx
        step_x = ib * by + ic * bx

        converged = (jnp.abs(step_y) < eps) & (jnp.abs(step_x) < eps)
        new_flow = flow + jnp.stack([step_y, step_x], axis=-1)
        fail = fail | (running & ~converged & ~in_bounds(p_f + new_flow))

        advance = running & ~fail & ~converged
        flow = jnp.where(advance[:, None], new_flow, flow)
        ok = ok & ~fail
        running = running & ok & ~converged
        return it + 1, flow, running, ok, patch, base

    stop_thresh = jnp.minimum(min_active, jnp.sum(ok) // 32)

    def cond(carry):
        it, _, running, _, _, _ = carry
        return (it < iters) & (jnp.sum(running) > stop_thresh)

    _, flow, _, ok, _, _ = jax.lax.while_loop(
        cond, body, (0, flow, ok, ok, patch0, base0)
    )
    return flow, ok


def _lk_level_patch_lanes(d1, d2, p_lvl, flow, ok, *, hw, window, iters,
                          eps, eig_thresh, pad, min_active: int = 0,
                          escape_fail: bool = False):
    """Lane-major variant of _lk_level_patch (same contract and semantics).

    All (window x window) per-point arrays are laid out (T, T, N) instead of
    (N, T, T): the point axis N (a multiple of 128 in production, padded
    capacity) lands on the TPU lane dimension, so VPU ops run at full lane
    utilization. The (N, T, T) layout pads T=2w+1 (typically 19) out to 128
    lanes — ~6.7x wasted bandwidth on every one of the ~25 elementwise passes
    per solver iteration, measured ~1.3 ms/iteration at N=1024; this layout
    is ~8x leaner per pass.
    """
    H, W = hw
    w = window
    T = 2 * w + 1
    R = LK_PATCH_MARGIN
    P = T + 1 + 2 * R
    n = p_lvl.shape[0]

    oy = jnp.arange(-w, w + 1, dtype=jnp.float32)[:, None, None]  # (T,1,1)
    ox = jnp.arange(-w, w + 1, dtype=jnp.float32)[None, :, None]  # (1,T,1)

    start = p_lvl - w + pad

    if use_dma_gather():
        # Pipelined-DMA span gather + vector extraction (ops/dma_gather.py):
        # bit-exact with the vmapped dynamic_slice below, ~10x cheaper on the
        # TPU backend (the serialized per-point copies dominate level cost).
        stack_w = gather_windows(d1["stack"], start, T, T)
    else:
        def one(s):
            return jax.lax.dynamic_slice(
                d1["stack"], (0, s[0], s[1]), (6, T, T)
            )

        stack_w = jax.vmap(one)(start)        # (N, 6, T, T) — once per level
    stack_w = stack_w.transpose(1, 2, 3, 0)   # (6, T, T, N)
    img1_w, iy_w, ix_w = stack_w[0], stack_w[1], stack_w[2]
    gyy_w, gxx_w, gyx_w = stack_w[3], stack_w[4], stack_w[5]

    p_f = p_lvl.astype(jnp.float32)
    hw_max = jnp.array([H - 1, W - 1], dtype=jnp.float32)

    def window_mask(q):
        up = jnp.floor(jnp.minimum(float(w), jnp.minimum(p_f[:, 0], q[:, 0])))
        down = jnp.floor(
            jnp.minimum(float(w), hw_max[0] - jnp.maximum(p_f[:, 0], q[:, 0]))
        )
        left = jnp.floor(jnp.minimum(float(w), jnp.minimum(p_f[:, 1], q[:, 1])))
        right = jnp.floor(
            jnp.minimum(float(w), hw_max[1] - jnp.maximum(p_f[:, 1], q[:, 1]))
        )
        my = (oy >= -up[None, None, :]) & (oy <= down[None, None, :])
        mx = (ox >= -left[None, None, :]) & (ox <= right[None, None, :])
        return (my & mx).astype(jnp.float32)  # (T, T, N)

    def structure_tensor(mask):
        syy = jnp.sum(gyy_w * mask, axis=(0, 1))
        sxx = jnp.sum(gxx_w * mask, axis=(0, 1))
        syx = jnp.sum(gyx_w * mask, axis=(0, 1))
        ia, ib, ic, _, s2 = pinv2x2_sym(syy, syx, sxx)
        count = jnp.sum(mask, axis=(0, 1))
        return ia, ib, ic, s2 / jnp.maximum(count, 1.0)

    def in_bounds(q):
        return (
            (q[:, 0] >= 0.0) & (q[:, 0] <= hw_max[0])
            & (q[:, 1] >= 0.0) & (q[:, 1] <= hw_max[1])
        )

    def gather_patches(q):
        """(P, P, N) patches of the second image centered at floor(q)."""
        base = jnp.floor(q).astype(jnp.int32) - w - R + pad

        if use_dma_gather():
            patch = gather_windows(d2["img"][None], base, P, P)[:, 0]
        else:
            def onep(s):
                return jax.lax.dynamic_slice(d2["img"], (s[0], s[1]), (P, P))

            patch = jax.vmap(onep)(base)

        return patch.transpose(1, 2, 0), base

    def select_window(patch, rel):
        """(P, P, N), (N, 2) int in [0, 2R] -> (T+1, T+1, N) windows using
        static shifted slices (selection masks broadcast over lanes)."""
        rows = jnp.zeros((T + 1, P, n), jnp.float32)
        for a in range(2 * R + 1):
            sel = (rel[:, 0] == a).astype(jnp.float32)[None, None, :]
            rows = rows + sel * patch[a:a + T + 1]
        out = jnp.zeros((T + 1, T + 1, n), jnp.float32)
        for b in range(2 * R + 1):
            sel = (rel[:, 1] == b).astype(jnp.float32)[None, None, :]
            out = out + sel * rows[:, b:b + T + 1]
        return out

    q0 = p_f + flow
    q0_safe = jnp.where(in_bounds(q0)[:, None], q0, p_f)
    patch0, base0 = gather_patches(q0_safe)

    # Mask + structure tensor hoisted out of the solver loop: the reference
    # computes them once per level and re-clamps only when the window hits
    # the image border mid-iteration (lucas_kanade.jl:58-72, "Recalculate
    # gradient only if the offset changes") — interior points, i.e. nearly
    # all of them, never trigger that path. We clamp once at the level's
    # entry correspondence; a border-drifting point keeps its entry-clamped
    # G and mask for the remainder of the level.
    mask = window_mask(q0_safe)
    ia, ib, ic, min_eig = structure_tensor(mask)
    eig_ok = min_eig >= eig_thresh

    def body(carry):
        it, flow, running, ok, patch, base = carry
        q = p_f + flow
        inb = in_bounds(q)
        fail = running & ~inb

        q_safe = jnp.where(inb[:, None], q, p_f)
        q_floor = jnp.floor(q_safe)
        frac = q_safe - q_floor
        rel = q_floor.astype(jnp.int32) - w + pad - base
        # A point that drifts past the patch margin FREEZES (keeps its last
        # in-margin flow, stays ok) instead of failing: there is no
        # conditional re-gather (a cond whose branch gathers serializes the
        # while_loop at ~0.9 ms/iteration), and the forward-backward check
        # decides survival from the frozen estimate. Freezing dominates the
        # round-1 hard-fail (which killed ~25% of fast-moving points and
        # doubled the keyframe cadence). EXCEPTION (escape_fail=True): in the
        # BACKWARD fb pass the flow starts at -flow_forward, so a frozen
        # point reports a ~zero round trip and would spuriously PASS the
        # check — exactly the mis-tracked points the check exists to kill.
        escaped = (
            (rel[:, 0] < 0) | (rel[:, 0] > 2 * R)
            | (rel[:, 1] < 0) | (rel[:, 1] > 2 * R)
        )
        if escape_fail:
            fail = fail | (running & escaped)
        rel = jnp.clip(rel, 0, 2 * R)

        big = select_window(patch, rel)  # (T+1, T+1, N)
        fy = frac[:, 0][None, None, :]
        fx = frac[:, 1][None, None, :]
        img2_s = (
            (1.0 - fy) * (1.0 - fx) * big[:T, :T]
            + (1.0 - fy) * fx * big[:T, 1:]
            + fy * (1.0 - fx) * big[1:, :T]
            + fy * fx * big[1:, 1:]
        )

        diff = (img1_w - img2_s) * mask
        by = jnp.sum(diff * iy_w, axis=(0, 1))
        bx = jnp.sum(diff * ix_w, axis=(0, 1))
        step_y = ia * by + ib * bx
        step_x = ib * by + ic * bx

        converged = (jnp.abs(step_y) < eps) & (jnp.abs(step_x) < eps)
        new_flow = flow + jnp.stack([step_y, step_x], axis=-1)
        fail = fail | (running & ~converged & ~in_bounds(p_f + new_flow))

        advance = running & ~fail & ~converged & ~escaped
        flow = jnp.where(advance[:, None], new_flow, flow)
        ok = ok & ~fail
        running = running & ok & ~converged & ~escaped
        return it + 1, flow, running, ok, patch, base

    ok = ok & eig_ok

    # A fused Pallas solver-loop kernel existed behind SLAMTPU_PALLAS_LK
    # but measured neutral on device (round-4 A/B: 55.6 vs 51.9 ms track
    # — the LK cost is gather/setup bandwidth, not solver iterations;
    # PERF.md round 3) and was deleted.
    if _fixed_trip_loop():
        # Fixed-trip variant: per-point eps/fail semantics are identical
        # (converged/failed points stop advancing via the masks), only the
        # GLOBAL early exit is dropped. The while_loop's exit condition is
        # a cross-lane reduction -> scalar branch every iteration — a
        # device sync that costs ~1 ms/iteration on this backend and
        # dominates the level cost (measured: LK time is independent of
        # the iteration budget because the early exit always fires first).
        def body_i(it, carry):
            return body((it,) + carry)[1:]

        flow, _, ok, _, _ = jax.lax.fori_loop(
            0, iters, body_i, (flow, ok, ok, patch0, base0)
        )
        return flow, ok

    stop_thresh = jnp.minimum(min_active, jnp.sum(ok) // 32)

    def cond(carry):
        it, _, running, _, _, _ = carry
        return (it < iters) & (jnp.sum(running) > stop_thresh)

    _, flow, _, ok, _, _ = jax.lax.while_loop(
        cond, body, (0, flow, ok, ok, patch0, base0)
    )
    return flow, ok


def _lk_level_lanes_1d(d1, d2, p_lvl, flow, ok, *, hw, window, iters, eps,
                       eig_thresh, pad, min_active: int = 0,
                       escape_fail: bool = False):
    """Disparity-only (1D, x-axis) lane-major LK level for RECTIFIED stereo.

    The stereo matcher's output row is corrected to the left row anyway
    (map_manager.jl:586-588 discards the tracked y), so for rectified pairs
    the y degree of freedom only adds cost: this kernel pins flow_y = 0 and
    solves the scalar normal equation step_x = b_x / Gxx per point.

    Structural savings vs _lk_level_patch_lanes: the patch row-window is
    FIXED (y never moves), so the patch is (T, P, N) instead of
    (T+1+2R, P, N) and the 2R+1 masked-shift row selection disappears from
    the solver loop entirely; bilinear sampling needs 2 terms, not 4.
    Validity gates mirror the 2D kernel with x-only semantics: the
    min-eigenvalue test becomes Gxx / count (x-gradient energy — a
    horizontal edge is untrackable in x), escape/convergence/bounds act on
    the x component.
    """
    H, W = hw
    w = window
    T = 2 * w + 1
    R = LK_PATCH_MARGIN
    P = T + 1 + 2 * R
    n = p_lvl.shape[0]

    ox = jnp.arange(-w, w + 1, dtype=jnp.float32)[None, :, None]  # (1,T,1)

    flow = flow * jnp.array([0.0, 1.0], jnp.float32)  # pin y

    start = p_lvl - w + pad
    if use_dma_gather():
        stack_w = gather_windows(d1["stack"], start, T, T)
    else:
        def one(s):
            return jax.lax.dynamic_slice(
                d1["stack"], (0, s[0], s[1]), (6, T, T)
            )

        stack_w = jax.vmap(one)(start)
    stack_w = stack_w.transpose(1, 2, 3, 0)   # (6, T, T, N)
    img1_w, ix_w, gxx_w = stack_w[0], stack_w[2], stack_w[4]

    p_f = p_lvl.astype(jnp.float32)
    hw_max = jnp.array([H - 1, W - 1], dtype=jnp.float32)

    # y-clamp depends only on p (y never moves); (T, 1, N) row mask.
    oy = jnp.arange(-w, w + 1, dtype=jnp.float32)[:, None, None]
    up = jnp.minimum(float(w), p_f[:, 0])
    down = jnp.minimum(float(w), hw_max[0] - p_f[:, 0])
    my = (oy >= -up[None, None, :]) & (oy <= down[None, None, :])

    def window_mask(qx):
        left = jnp.floor(
            jnp.minimum(float(w), jnp.minimum(p_f[:, 1], qx))
        )
        right = jnp.floor(
            jnp.minimum(float(w), hw_max[1] - jnp.maximum(p_f[:, 1], qx))
        )
        mx = (ox >= -left[None, None, :]) & (ox <= right[None, None, :])
        return (my & mx).astype(jnp.float32)  # (T, T, N)

    def in_bounds_x(qx):
        return (qx >= 0.0) & (qx <= hw_max[1])

    # Patch: rows fixed at the template rows, x spans the margin.
    def gather_patches(qx):
        base_x = jnp.floor(qx).astype(jnp.int32) - w - R + pad
        base = jnp.stack([start[:, 0], base_x], axis=-1)
        if use_dma_gather():
            patch = gather_windows(d2["img"][None], base, T, P)[:, 0]
        else:
            def onep(s):
                return jax.lax.dynamic_slice(d2["img"], (s[0], s[1]), (T, P))

            patch = jax.vmap(onep)(base)
        return patch.transpose(1, 2, 0), base_x  # (T, P, N)

    def select_window(patch, rel):
        """(T, P, N), (N,) int in [0, 2R] -> (T, T+1, N) x-windows."""
        out = jnp.zeros((T, T + 1, n), jnp.float32)
        for b in range(2 * R + 1):
            sel = (rel == b).astype(jnp.float32)[None, None, :]
            out = out + sel * patch[:, b:b + T + 1]
        return out

    qx0 = p_f[:, 1] + flow[:, 1]
    qx0_safe = jnp.where(in_bounds_x(qx0), qx0, p_f[:, 1])
    patch0, base0 = gather_patches(qx0_safe)

    # Mask + scalar structure sum hoisted out of the loop (entry-clamped,
    # same policy as the 2D lane kernel).
    mask = window_mask(qx0_safe)
    sxx = jnp.sum(gxx_w * mask, axis=(0, 1))
    count = jnp.sum(mask, axis=(0, 1))
    inv_sxx = jnp.where(sxx > 1e-12, 1.0 / jnp.maximum(sxx, 1e-12), 0.0)
    eig_ok = (sxx / jnp.maximum(count, 1.0)) >= eig_thresh

    def body(carry):
        it, fx_flow, running, ok, patch, base = carry
        qx = p_f[:, 1] + fx_flow
        inb = in_bounds_x(qx)
        fail = running & ~inb

        qx_safe = jnp.where(inb, qx, p_f[:, 1])
        qx_floor = jnp.floor(qx_safe)
        frac = qx_safe - qx_floor
        rel = qx_floor.astype(jnp.int32) - w + pad - base
        escaped = (rel < 0) | (rel > 2 * R)
        if escape_fail:
            fail = fail | (running & escaped)
        rel = jnp.clip(rel, 0, 2 * R)

        big = select_window(patch, rel)  # (T, T+1, N)
        fxb = frac[None, None, :]
        img2_s = (1.0 - fxb) * big[:, :T] + fxb * big[:, 1:]

        diff = (img1_w - img2_s) * mask
        bx = jnp.sum(diff * ix_w, axis=(0, 1))
        step_x = inv_sxx * bx

        converged = jnp.abs(step_x) < eps
        new_fx = fx_flow + step_x
        fail = fail | (
            running & ~converged & ~in_bounds_x(p_f[:, 1] + new_fx)
        )

        advance = running & ~fail & ~converged & ~escaped
        fx_flow = jnp.where(advance, new_fx, fx_flow)
        ok = ok & ~fail
        running = running & ok & ~converged & ~escaped
        return it + 1, fx_flow, running, ok, patch, base

    ok = ok & eig_ok
    fx0 = flow[:, 1]

    if _fixed_trip_loop():
        def body_i(it, carry):
            return body((it,) + carry)[1:]

        fx_flow, _, ok, _, _ = jax.lax.fori_loop(
            0, iters, body_i, (fx0, ok, ok, patch0, base0)
        )
        return jnp.stack([jnp.zeros_like(fx_flow), fx_flow], -1), ok

    stop_thresh = jnp.minimum(min_active, jnp.sum(ok) // 32)

    def cond(carry):
        it, _, running, _, _, _ = carry
        return (it < iters) & (jnp.sum(running) > stop_thresh)

    _, fx_flow, _, ok, _, _ = jax.lax.while_loop(
        cond, body, (0, fx0, ok, ok, patch0, base0)
    )
    return jnp.stack([jnp.zeros_like(fx_flow), fx_flow], -1), ok


def _fixed_trip_loop() -> bool:
    """Trace-time switch: run LK solver loops with a static trip count
    (lax.fori_loop) instead of the early-exit while_loop. Per-point results
    are identical at equal iteration budget; set a smaller budget via
    Params.lk_iterations when enabling (SLAMTPU_LK_FORI=1)."""
    import os
    return bool(os.environ.get("SLAMTPU_LK_FORI"))


def _select_level_fn(pad: int, window: int, has_stack: bool,
                     one_d: bool = False):
    """Pick the per-level LK kernel: lane-major patch-cached (default) >
    point-major patch-cached (SLAMTPU_NO_LANE_LK) > exact per-iteration
    gather (SLAMTPU_NO_PATCH_LK, or insufficient padding/stack).
    one_d selects the disparity-only rectified-stereo kernel (lane-major
    only; the fallback paths run the 2D kernel — the caller row-corrects
    the output either way)."""
    import os
    if (
        os.environ.get("SLAMTPU_NO_PATCH_LK")
        or pad < lk_pad(window)
        or not has_stack
    ):
        return _lk_level
    if os.environ.get("SLAMTPU_NO_LANE_LK"):
        return _lk_level_patch
    if one_d:
        return _lk_level_lanes_1d
    return _lk_level_patch_lanes


def lk_flow(pyr1, pyr2, points, displacement, valid, *, levels, window,
            iters, eps, eig_thresh, pad,
            min_active: int = 0, escape_fail: bool = False,
            one_d: bool = False):
    """Pyramidal LK for N points (reference optflow!, lucas_kanade.jl:9-100).

    points: (N, 2) f32 full-resolution (y, x).
    displacement: (N, 2) f32 prior in COARSEST-level units.
    Returns (flow_full_res, status): flow at level 0 scale.

    The per-level step uses the patch-cached lane-major kernel (windows
    gathered via the Pallas DMA pipeline on TPU, ops/dma_gather.py).
    """
    flow = displacement.astype(jnp.float32)
    ok = valid
    for level in range(levels, -1, -1):
        d1, d2 = pyr1[level], pyr2[level]
        hw = pyramid_level_shape(d1, pad)
        p_lvl = jnp.floor(points / (2.0 ** level)).astype(jnp.int32)
        # Patch-cached variant (default): identical results, no
        # per-iteration dependent gathers; lane-major layout keeps the
        # point axis on the 128 TPU lanes. Requires enough image padding
        # for the (T+1+2*MARGIN) patches.
        level_fn = _select_level_fn(pad, window, "stack" in d1, one_d)

        # Skip the whole level when no point is alive (e.g. the
        # failed-prior retry pass is usually empty).
        def run(args, level_fn=level_fn):
            f, o = args
            return level_fn(
                d1, d2, p_lvl, f, o, hw=hw, window=window, iters=iters,
                eps=eps, eig_thresh=eig_thresh, pad=pad,
                min_active=min_active, escape_fail=escape_fail,
            )

        flow, ok = jax.lax.cond(
            jnp.any(ok), run, lambda args: args, (flow, ok)
        )
        if level > 0:
            flow = flow * 2.0
    return flow, ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "window", "iters", "eps", "eig_thresh", "pad",
        "max_distance", "min_active",
    ),
)
def fb_track(pyr_prev, pyr_cur, points, displacement, valid, *, levels,
             window, iters=30, eps=1e-2, eig_thresh=1e-4, pad=11,
             max_distance=1.0, min_active=0):
    """Forward-backward KLT (reference src/tracker.jl:17-68).

    Forward over `levels` pyramid levels with the displacement prior, then
    backward at level 0 only (tracker.jl:34), keeping points whose round trip
    lands within `max_distance` of the original.

    Returns (new_points (N, 2), status (N,)).
    """
    flow_f, status = lk_flow(
        pyr_prev, pyr_cur, points, displacement, valid,
        levels=levels, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, min_active=min_active,
    )
    new_points = points + flow_f
    flow_b, bstatus = lk_flow(
        pyr_cur, pyr_prev, new_points, -flow_f, status,
        levels=0, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, min_active=min_active,
        escape_fail=True,
    )
    round_trip = new_points + flow_b
    dist = jnp.linalg.norm(points - round_trip, axis=-1)
    ok = status & bstatus & (dist < max_distance)
    return new_points, ok


def merged_fb(pyr_prev, pyr_cur, px, plain_mask, prior_mask, disp_prior, *,
              levels, prior_level, window, iters, eps, eig_thresh, pad,
              min_active: int = 0):
    """Forward-backward KLT with BOTH tracking families in one level cascade.

    The plain family enters at the coarsest level; the prior family is
    injected at `prior_level` with its displacement prior (reference
    map_manager.jl:458,466) — mask-equivalent to two separate batches but
    half the sequential level blocks. Failed-prior points are retried as
    plain (map_manager.jl:534-537) in a cond-skipped second cascade.

    Returns (new_px, ok).
    """
    level_fn = _select_level_fn(pad, window, True)

    def cascade(active0, inject_mask, inject_disp):
        flow = jnp.zeros_like(px)
        ok = active0
        for level in range(levels, -1, -1):
            if inject_mask is not None and level == prior_level:
                flow = jnp.where(
                    (inject_mask & ~active0)[:, None], inject_disp, flow
                )
                ok = ok | inject_mask
            d1, d2 = pyr_prev[level], pyr_cur[level]
            hw = pyramid_level_shape(d1, pad)
            p_lvl = jnp.floor(px / (2.0 ** level)).astype(jnp.int32)

            def run(args, d1=d1, d2=d2, hw=hw, p_lvl=p_lvl):
                return level_fn(
                    d1, d2, p_lvl, args[0], args[1], hw=hw, window=window,
                    iters=iters, eps=eps, eig_thresh=eig_thresh, pad=pad,
                    min_active=min_active,
                )

            flow, ok = jax.lax.cond(
                jnp.any(ok), run, lambda args: args, (flow, ok)
            )
            if level > 0:
                flow = flow * 2.0
        return flow, ok

    def backward(flow_f, st, max_fb_distance):
        flow_b, bst = lk_flow(
            pyr_cur, pyr_prev, px + flow_f, -flow_f, st,
            levels=0, window=window, iters=iters, eps=eps,
            eig_thresh=eig_thresh, pad=pad, min_active=min_active,
            escape_fail=True,
        )
        dist_fb = jnp.linalg.norm(flow_f + flow_b, axis=-1)
        return st & bst & (dist_fb < max_fb_distance)

    return cascade, backward


def fb_shadow(pyr_prev, pyr_cur, px, prior_mask, disp_prior, valid, *,
              levels, prior_level=1, window=9, iters=30, eps=1e-2,
              eig_thresh=1e-4, pad=17, max_distance=1.0, min_active=0):
    """Forward-backward KLT with the failed-prior retry as SHADOW lanes.

    The reference retries prior-tracked points that failed as plain points
    from the coarsest level (map_manager.jl:534-537) — a second full level
    cascade. Here every prior point is tracked BOTH ways simultaneously in
    one doubled (2N-lane) cascade: lanes [0, N) run the reference's main
    pass (plain from coarsest + prior injected at `prior_level`), lanes
    [N, 2N) run all prior points as plain. One backward pass checks both.
    Per-point results are identical to the sequential retry (LK iterations
    are per-point independent); the level-block count halves (the fixed
    per-block gather/setup cost dominates on TPU at production sizes).

    Returns (new_px, ok, tracked_with_prior).
    """
    n = px.shape[0]
    plain_mask = valid & ~prior_mask
    prior = valid & prior_mask

    px2 = jnp.concatenate([px, px])
    active0 = jnp.concatenate([plain_mask, prior])
    inject = jnp.concatenate([prior, jnp.zeros_like(prior)])
    disp2 = jnp.concatenate([disp_prior, jnp.zeros_like(disp_prior)])

    level_fn = _select_level_fn(pad, window, True)

    flow = jnp.zeros_like(px2)
    ok2 = active0
    for level in range(levels, -1, -1):
        if level == prior_level:
            flow = jnp.where((inject & ~active0)[:, None], disp2, flow)
            ok2 = ok2 | inject
        d1, d2 = pyr_prev[level], pyr_cur[level]
        hw = pyramid_level_shape(d1, pad)
        p_lvl = jnp.floor(px2 / (2.0 ** level)).astype(jnp.int32)

        def run(args, d1=d1, d2=d2, hw=hw, p_lvl=p_lvl):
            return level_fn(
                d1, d2, p_lvl, args[0], args[1], hw=hw, window=window,
                iters=iters, eps=eps, eig_thresh=eig_thresh, pad=pad,
                min_active=min_active,
            )

        flow, ok2 = jax.lax.cond(
            jnp.any(ok2), run, lambda args: args, (flow, ok2)
        )
        if level > 0:
            flow = flow * 2.0

    # One backward pass (level 0) over both families.
    flow_b, bst = lk_flow(
        pyr_cur, pyr_prev, px2 + flow, -flow, ok2,
        levels=0, window=window, iters=iters, eps=eps,
        eig_thresh=eig_thresh, pad=pad, min_active=min_active,
        escape_fail=True,
    )
    dist_fb = jnp.linalg.norm(flow + flow_b, axis=-1)
    okfb = ok2 & bst & (dist_fb < max_distance)

    ok_m, ok_r = okfb[:n], okfb[n:]
    flow_m, flow_r = flow[:n], flow[n:]
    retry_mask = prior & ~ok_m
    use_retry = retry_mask & ok_r
    new_px = jnp.where(use_retry[:, None], px + flow_r, px + flow_m)
    ok = (ok_m | use_retry) & valid
    return new_px, ok, prior & ok_m


# Lane budget for the compacted failed-prior retry cascade. Per-frame
# prior failures are ~30-80 at the 1000-keypoint budget; overflowing points
# simply fail (the reference retries all — measured never hit at 256).
RETRY_CAP = 256


def fb_retry_compact(pyr_prev, pyr_cur, px, prior_mask, disp_prior, valid, *,
                     levels, prior_level=1, window=9, iters=30, eps=1e-2,
                     eig_thresh=1e-4, pad=17, max_distance=1.0,
                     min_active=0, one_d=False):
    """Forward-backward KLT with the failed-prior retry COMPACTED.

    Same semantics as fb_shadow (and the reference's sequential retry,
    map_manager.jl:534-537): prior points whose forward-backward track
    failed are re-tracked as plain points from the coarsest level. But
    instead of doubling every level block to 2N lanes, the few failures are
    cumsum-compacted into a RETRY_CAP-lane second cascade — LK level cost
    is linear in lanes (~4-5 ms per 1024 lanes per block on TPU), so the
    shadow formulation paid ~22 ms/frame for lanes that were ~95% idle.

    Returns (new_px, ok, tracked_with_prior).
    """
    n = px.shape[0]
    level_fn = _select_level_fn(pad, window, True, one_d)

    def cascade(px_c, active0, inject_mask, inject_disp, m_active):
        flow = jnp.zeros_like(px_c)
        ok = active0
        for level in range(levels, -1, -1):
            if inject_mask is not None and level == prior_level:
                flow = jnp.where(
                    (inject_mask & ~active0)[:, None], inject_disp, flow
                )
                ok = ok | inject_mask
            d1, d2 = pyr_prev[level], pyr_cur[level]
            hw = pyramid_level_shape(d1, pad)
            p_lvl = jnp.floor(px_c / (2.0 ** level)).astype(jnp.int32)

            def run(args, d1=d1, d2=d2, hw=hw, p_lvl=p_lvl):
                return level_fn(
                    d1, d2, p_lvl, args[0], args[1], hw=hw, window=window,
                    iters=iters, eps=eps, eig_thresh=eig_thresh, pad=pad,
                    min_active=m_active,
                )

            flow, ok = jax.lax.cond(
                jnp.any(ok), run, lambda args: args, (flow, ok)
            )
            if level > 0:
                flow = flow * 2.0
        return flow, ok

    def backward(px_c, flow_f, st):
        flow_b, bst = lk_flow(
            pyr_cur, pyr_prev, px_c + flow_f, -flow_f, st,
            levels=0, window=window, iters=iters, eps=eps,
            eig_thresh=eig_thresh, pad=pad, min_active=min_active,
            escape_fail=True, one_d=one_d,
        )
        dist_fb = jnp.linalg.norm(flow_f + flow_b, axis=-1)
        return st & bst & (dist_fb < max_distance)

    plain = valid & ~prior_mask
    prior = valid & prior_mask

    # Main pass: plain from the coarsest level, prior injected at
    # prior_level (map_manager.jl:458,466).
    flow_m, ok_m = cascade(px, plain, prior, disp_prior, min_active)
    okfb_m = backward(px, flow_m, ok_m)

    # Compact the failed priors into RETRY_CAP lanes and re-track as plain.
    retry_mask = prior & ~okfb_m
    rank = jnp.cumsum(retry_mask) - retry_mask.astype(jnp.int32)
    in_cap = retry_mask & (rank < RETRY_CAP)
    slot = jnp.where(in_cap, rank, RETRY_CAP)
    px_r = (
        jnp.zeros((RETRY_CAP + 1, 2), px.dtype).at[slot].set(px)[:RETRY_CAP]
    )
    valid_r = (
        jnp.zeros((RETRY_CAP + 1,), bool).at[slot].set(in_cap)[:RETRY_CAP]
    )
    flow_r, ok_r = cascade(px_r, valid_r, None, None, min_active)
    okfb_r = backward(px_r, flow_r, ok_r)

    # Scatter retry results back onto their main lanes.
    gather_idx = jnp.clip(rank, 0, RETRY_CAP - 1)
    use_retry = in_cap & okfb_r[gather_idx]
    flow_back = flow_r[gather_idx]
    new_px = jnp.where(use_retry[:, None], px + flow_back, px + flow_m)
    ok = (okfb_m | use_retry) & valid
    return new_px, ok, prior & okfb_m


def fb_cascade(*args, **kw):
    """Production FB cascade: compacted retry (default) or the round-2
    shadow-lane formulation (SLAMTPU_LK_SHADOW=1, trace-time). Per-point
    results are identical below RETRY_CAP failures."""
    import os
    if os.environ.get("SLAMTPU_LK_SHADOW"):
        kw.pop("one_d", None)  # shadow path is 2D-only (A/B fallback)
        return fb_shadow(*args, **kw)
    return fb_retry_compact(*args, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "prior_level", "window", "iters", "eps", "eig_thresh",
        "pad", "max_distance", "min_active",
    ),
)
def fb_track_merged(pyr_prev, pyr_cur, px, prior_mask, disp_prior, valid, *,
                    levels, prior_level=1, window=9, iters=30, eps=1e-2,
                    eig_thresh=1e-4, pad=17, max_distance=1.0, min_active=0):
    """One-dispatch forward-backward KLT for both families + retry."""
    return fb_cascade(
        pyr_prev, pyr_cur, px, prior_mask, disp_prior, valid,
        levels=levels, prior_level=prior_level, window=window, iters=iters,
        eps=eps, eig_thresh=eig_thresh, pad=pad, max_distance=max_distance,
        min_active=min_active,
    )
