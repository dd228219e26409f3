"""Pallas TPU kernel for the pyramidal Lucas-Kanade level step.

The XLA formulation of the LK iteration (slamtpu.ops.lucas_kanade) pays for a
(N, T+1, T+1) HBM gather per solver iteration (~0.7 s per tracked frame at
KITTI scale). This kernel keeps the whole level (image, gradients) resident
in VMEM and samples windows with on-chip dynamic slices:

  - phase A (`_structure_kernel`): per point, one masked window sum over the
    sigma=4-smoothed gradient-product maps -> closed-form 2x2 pseudo-inverse
    + min-eigenvalue gate (reference lucas_kanade.jl:140-157, utils.jl:5-45).
    Like the reference's first computation, the window is clamped at the
    SOURCE point (offsets(point, point), lucas_kanade.jl:37); unlike the
    reference we do not re-clamp G when the correspondence drifts to the
    border mid-iteration (border points only; gate semantics preserved).
  - phase B (`_iterate_kernel`): per point, the damped iteration loop with a
    true per-point early exit (epsilon termination, out-of-bounds failure —
    lucas_kanade.jl:48-92), bilinear-sampling the second image from VMEM.

VMEM budget at KITTI level 0 (398 x 1263 padded f32 maps): phase A holds 3
maps (~6 MB), phase B holds 4 maps (~8 MB) — both within a v5e core's ~16 MB.

Only used on TPU backends; CPU tests exercise the XLA twin (same contract).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _structure_kernel(p_ref, flow_ref, act_ref, gyy_ref, gxx_ref, gyx_ref,
                      out_ref, *, window, hw, pad):
    w = window
    T = 2 * w + 1
    H, W = hw
    oy = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0).astype(jnp.float32) - w
    ox = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1).astype(jnp.float32) - w
    n = p_ref.shape[0]

    def body(i, _):
        py = p_ref[i, 0]
        px = p_ref[i, 1]
        active = act_ref[i] > 0

        @pl.when(active)
        def _():
            pyf = py.astype(jnp.float32)
            pxf = px.astype(jnp.float32)
            up = jnp.minimum(float(w), pyf)
            down = jnp.minimum(float(w), float(H - 1) - pyf)
            left = jnp.minimum(float(w), pxf)
            right = jnp.minimum(float(w), float(W - 1) - pxf)
            mask = (
                (oy >= -up) & (oy <= down) & (ox >= -left) & (ox <= right)
            ).astype(jnp.float32)

            y0 = py - w + pad
            x0 = px - w + pad
            syy = jnp.sum(gyy_ref[pl.ds(y0, T), pl.ds(x0, T)] * mask)
            sxx = jnp.sum(gxx_ref[pl.ds(y0, T), pl.ds(x0, T)] * mask)
            syx = jnp.sum(gyx_ref[pl.ds(y0, T), pl.ds(x0, T)] * mask)

            # Min eigenvalue gates the point; points passing the gate are
            # well-conditioned, so the reference's tolerance pseudo-inverse
            # (utils.jl:31-45) reduces to the plain adjugate inverse.
            half_tr = 0.5 * (syy + sxx)
            disc = jnp.sqrt(
                jnp.square(0.5 * (syy - sxx)) + jnp.square(syx)
            )
            s2 = half_tr - disc
            det = syy * sxx - syx * syx
            safe = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
            out_ref[i, 0] = sxx / safe
            out_ref[i, 1] = -syx / safe
            out_ref[i, 2] = syy / safe
            count = jnp.maximum(jnp.sum(mask), 1.0)
            out_ref[i, 3] = s2 / count

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[i, 0] = 0.0
            out_ref[i, 1] = 0.0
            out_ref[i, 2] = 0.0
            out_ref[i, 3] = -1.0

        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _iterate_kernel(p_ref, flow_ref, act_ref, ginv_ref, img1_ref, iy_ref,
                    ix_ref, img2_ref, oflow_ref, ook_ref, *, window, hw, pad,
                    iters, eps, eig_thresh):
    w = window
    T = 2 * w + 1
    H, W = hw
    oy = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0).astype(jnp.float32) - w
    ox = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1).astype(jnp.float32) - w
    n = p_ref.shape[0]

    def body(i, _):
        py = p_ref[i, 0]
        px = p_ref[i, 1]
        active = act_ref[i] > 0
        min_eig = ginv_ref[i, 3]
        gate = active & (min_eig >= eig_thresh)

        y0 = py - w + pad
        x0 = px - w + pad
        img1_w = img1_ref[pl.ds(y0, T), pl.ds(x0, T)]
        iy_w = iy_ref[pl.ds(y0, T), pl.ds(x0, T)]
        ix_w = ix_ref[pl.ds(y0, T), pl.ds(x0, T)]
        ia = ginv_ref[i, 0]
        ib = ginv_ref[i, 1]
        ic = ginv_ref[i, 2]
        pyf = py.astype(jnp.float32)
        pxf = px.astype(jnp.float32)

        def in_bounds(qy, qx):
            return (
                (qy >= 0.0) & (qy <= float(H - 1))
                & (qx >= 0.0) & (qx <= float(W - 1))
            )

        def cond(carry):
            it, fy, fx, ok, running = carry
            return running & (it < iters)

        def step(carry):
            it, fy, fx, ok, running = carry
            qy = pyf + fy
            qx = pxf + fx
            inb = in_bounds(qy, qx)

            up = jnp.floor(jnp.minimum(float(w), jnp.minimum(pyf, qy)))
            down = jnp.floor(
                jnp.minimum(float(w), float(H - 1) - jnp.maximum(pyf, qy))
            )
            left = jnp.floor(jnp.minimum(float(w), jnp.minimum(pxf, qx)))
            right = jnp.floor(
                jnp.minimum(float(w), float(W - 1) - jnp.maximum(pxf, qx))
            )
            mask = (
                (oy >= -up) & (oy <= down) & (ox >= -left) & (ox <= right)
            ).astype(jnp.float32)

            qyc = jnp.clip(qy, 0.0, float(H - 1))
            qxc = jnp.clip(qx, 0.0, float(W - 1))
            qy0 = jnp.floor(qyc)
            qx0 = jnp.floor(qxc)
            fyr = qyc - qy0
            fxr = qxc - qx0
            by = qy0.astype(jnp.int32) - w + pad
            bx = qx0.astype(jnp.int32) - w + pad
            big = img2_ref[pl.ds(by, T + 1), pl.ds(bx, T + 1)]
            samp = (
                (1.0 - fyr) * (1.0 - fxr) * big[:T, :T]
                + (1.0 - fyr) * fxr * big[:T, 1:]
                + fyr * (1.0 - fxr) * big[1:, :T]
                + fyr * fxr * big[1:, 1:]
            )
            diff = (img1_w - samp) * mask
            bby = jnp.sum(diff * iy_w)
            bbx = jnp.sum(diff * ix_w)
            sy = ia * bby + ib * bbx
            sx = ib * bby + ic * bbx

            converged = (jnp.abs(sy) < eps) & (jnp.abs(sx) < eps)
            nfy = fy + sy
            nfx = fx + sx
            new_inb = in_bounds(pyf + nfy, pxf + nfx)
            fail = (~inb) | (~converged & ~new_inb)

            adv = ~fail & ~converged
            fy = jnp.where(adv, nfy, fy)
            fx = jnp.where(adv, nfx, fx)
            ok = ok & ~fail
            running = ok & ~converged
            return it + 1, fy, fx, ok, running

        _, fy, fx, ok, _ = jax.lax.while_loop(
            cond, step,
            (0, flow_ref[i, 0], flow_ref[i, 1], gate, gate),
        )
        oflow_ref[i, 0] = fy
        oflow_ref[i, 1] = fx
        ook_ref[i, 0] = ok.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def lk_level_pallas(level1, level2, p_lvl, flow, active, *, hw, window,
                    iters, eps, eig_thresh, pad, interpret=False):
    """One pyramid level for all N points (Pallas twin of
    lucas_kanade._lk_level). Returns (flow, ok)."""
    n = p_lvl.shape[0]
    vm = pltpu.VMEM

    sm = pltpu.SMEM
    ginv = pl.pallas_call(
        functools.partial(
            _structure_kernel, window=window, hw=hw, pad=pad
        ),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=sm),   # p_lvl
            pl.BlockSpec(memory_space=sm),   # flow
            pl.BlockSpec(memory_space=sm),   # active
            pl.BlockSpec(memory_space=vm),   # Gyy
            pl.BlockSpec(memory_space=vm),   # Gxx
            pl.BlockSpec(memory_space=vm),   # Gyx
        ],
        out_specs=pl.BlockSpec(memory_space=sm),
        interpret=interpret,
    )(
        p_lvl, flow, active.astype(jnp.int32),
        level1["Gyy"], level1["Gxx"], level1["Gyx"],
    )

    oflow, ook = pl.pallas_call(
        functools.partial(
            _iterate_kernel, window=window, hw=hw, pad=pad, iters=iters,
            eps=eps, eig_thresh=eig_thresh,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=sm),   # p_lvl
            pl.BlockSpec(memory_space=sm),   # flow
            pl.BlockSpec(memory_space=sm),   # active
            pl.BlockSpec(memory_space=sm),   # ginv
            pl.BlockSpec(memory_space=vm),   # img1
            pl.BlockSpec(memory_space=vm),   # Iy
            pl.BlockSpec(memory_space=vm),   # Ix
            pl.BlockSpec(memory_space=vm),   # img2
        ],
        out_specs=(
            pl.BlockSpec(memory_space=sm),
            pl.BlockSpec(memory_space=sm),
        ),
        interpret=interpret,
    )(
        p_lvl, flow, active.astype(jnp.int32), ginv,
        level1["img"], level1["Iy"], level1["Ix"], level2["img"],
    )
    return oflow, ook[:, 0].astype(bool)
