"""Fused lane-major Pallas solver loop for the LK level step.

The production XLA level kernel (`lucas_kanade._lk_level_patch_lanes`)
already has the right data layout — the point axis on the 128 TPU lanes,
per-point windows gathered ONCE per level (ops/dma_gather.py), selection by
static masked shifts — but its solver `while_loop` still materializes every
per-iteration intermediate ((T+1, P, N) row selections, (T+1, T+1, N)
windows, (T, T, N) residuals: ~70-100 MB of HBM traffic per iteration at
N=1024) because XLA stages loop-carried tensors through HBM. This module
fuses the WHOLE iteration loop into one Pallas kernel with every
intermediate VMEM-resident; the arithmetic is copied op-for-op from the XLA
body, so results are bit-comparable (same order of operations) at equal
iteration counts.

Division of labour (mirrors `_lk_level_patch_lanes` exactly):
  - XLA (outside): level-stack window gather, entry-clamped window mask,
    structure tensor + 2x2 pseudo-inverse, eigenvalue gate, initial patch
    gather.  These run once per level — not worth a kernel.
  - Pallas (here): the `iters`-trip solver loop (select shifted window,
    bilinear sample, residual, normal-equation step, convergence/bounds/
    escape bookkeeping).  Runs with a grid over lane blocks of `BLOCK_N`
    points; each block's working set (~8 MB at T=19, P=32, 512 lanes)
    stays in VMEM.

No dynamic lane indexing anywhere: the per-point window selection is the
same 2R+1 static-slice masked-add cascade the XLA kernel uses (the round-2
Mosaic blocker — per-point dynamic lane loads in `ops/lk_pallas.py` — is
designed out rather than worked around).

Loop-exit semantics: fixed trip count (the early-exit while_loop's global
`sum(running)` reduction costs a device sync per iteration on the tunnel
backend anyway — see `lucas_kanade._fixed_trip_loop`); converged/failed
points stop advancing via the running mask, identical per-point results.

Reference hot loop this accelerates: src/optical_flow/lucas_kanade.jl:33-92.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .dma_gather import _round_up

# Lane-block width: one kernel instance solves BLOCK_N points. 512 lanes
# keeps the (P, P, BLOCK_N) patch + (T, T, BLOCK_N) template maps + loop
# intermediates within a v5e core's ~16 MB VMEM at T=19, P=32.
BLOCK_N = 512


def use_lanes_pallas() -> bool:
    """Trace-time switch for the fused Pallas solver loop (TPU only)."""
    if os.environ.get("SLAMTPU_NO_PALLAS_LK"):
        return False
    if os.environ.get("SLAMTPU_PALLAS_LK"):
        return True
    return False  # default off until the on-device A/B flips it


def _solver_kernel(
    img1_ref, iy_ref, ix_ref, mask_ref, patch_ref,
    ginv_ref, pf_ref, flow_ref, state_ref,
    oflow_ref, ook_ref,
    *, window, hw, pad, iters, eps, margin, escape_fail, one_d,
):
    """One lane block: run the full solver loop in VMEM.

    Shapes (B = BLOCK_N lanes):
      img1/iy/ix/mask: (T, T, B) template window, gradients, clamp mask
      patch:           (Py, Px, B) second-image patch (Py = T for one_d)
      ginv:            (4, B) ia, ib, ic, (unused)
      pf:              (2, B) integer level coords as f32 (y, x)
      flow:            (2, B) initial flow
      state:           (4, B) f32: ok0, base_y, base_x, (unused)
      oflow:           (2, B) final flow
      ook:             (1, B) f32 0/1
    """
    w = window
    T = 2 * w + 1
    R = margin
    H, W = hw

    img1_w = img1_ref[...]
    iy_w = iy_ref[...]
    ix_w = ix_ref[...]
    mask = mask_ref[...]
    patch = patch_ref[...]
    ia = ginv_ref[0, :]
    ib = ginv_ref[1, :]
    ic = ginv_ref[2, :]
    pfy = pf_ref[0, :]
    pfx = pf_ref[1, :]
    ok0 = state_ref[0, :] > 0.0
    base_y = state_ref[1, :]
    base_x = state_ref[2, :]

    def in_bounds(qy, qx):
        inb = (qx >= 0.0) & (qx <= float(W - 1))
        if not one_d:
            inb = inb & (qy >= 0.0) & (qy <= float(H - 1))
        return inb

    def select_x(rows, relx):
        # rows: (Ty, Px, B) -> (Ty, T+1, B) by static shifted slices.
        ty = rows.shape[0]
        out = jnp.zeros((ty, T + 1, rows.shape[2]), jnp.float32)
        for b in range(2 * R + 1):
            sel = (relx == b).astype(jnp.float32)[None, None, :]
            out = out + sel * rows[:, b:b + T + 1, :]
        return out

    def select_y(pat, rely):
        # (Py, Px, B) -> (T+1, Px, B)
        out = jnp.zeros((T + 1, pat.shape[1], pat.shape[2]), jnp.float32)
        for a in range(2 * R + 1):
            sel = (rely == a).astype(jnp.float32)[None, None, :]
            out = out + sel * pat[a:a + T + 1, :, :]
        return out

    def body(_, carry):
        fy, fx, running, ok = carry
        qy = pfy + fy
        qx = pfx + fx
        inb = in_bounds(qy, qx)
        fail = running & ~inb

        qy_safe = jnp.where(inb, qy, pfy)
        qx_safe = jnp.where(inb, qx, pfx)
        qx_floor = jnp.floor(qx_safe)
        fracx = qx_safe - qx_floor
        relx = qx_floor.astype(jnp.int32) - w + pad - base_x.astype(jnp.int32)
        escaped = (relx < 0) | (relx > 2 * R)

        if one_d:
            big = select_x(patch, jnp.clip(relx, 0, 2 * R))  # (T, T+1, B)
            fxb = fracx[None, None, :]
            img2_s = (1.0 - fxb) * big[:, :T, :] + fxb * big[:, 1:, :]
        else:
            qy_floor = jnp.floor(qy_safe)
            fracy = qy_safe - qy_floor
            rely = (
                qy_floor.astype(jnp.int32) - w + pad
                - base_y.astype(jnp.int32)
            )
            escaped = escaped | (rely < 0) | (rely > 2 * R)
            rows = select_y(patch, jnp.clip(rely, 0, 2 * R))
            big = select_x(rows, jnp.clip(relx, 0, 2 * R))  # (T+1, T+1, B)
            fyb = fracy[None, None, :]
            fxb = fracx[None, None, :]
            img2_s = (
                (1.0 - fyb) * (1.0 - fxb) * big[:T, :T, :]
                + (1.0 - fyb) * fxb * big[:T, 1:, :]
                + fyb * (1.0 - fxb) * big[1:, :T, :]
                + fyb * fxb * big[1:, 1:, :]
            )

        if escape_fail:
            fail = fail | (running & escaped)

        diff = (img1_w - img2_s) * mask
        bx = jnp.sum(diff * ix_w, axis=(0, 1))
        if one_d:
            step_y = jnp.zeros_like(bx)
            step_x = ic * bx  # ic carries 1/Gxx in 1D mode
            converged = jnp.abs(step_x) < eps
        else:
            by = jnp.sum(diff * iy_w, axis=(0, 1))
            step_y = ia * by + ib * bx
            step_x = ib * by + ic * bx
            converged = (jnp.abs(step_y) < eps) & (jnp.abs(step_x) < eps)

        nfy = fy + step_y
        nfx = fx + step_x
        fail = fail | (
            running & ~converged & ~in_bounds(pfy + nfy, pfx + nfx)
        )

        advance = running & ~fail & ~converged & ~escaped
        fy = jnp.where(advance, nfy, fy)
        fx = jnp.where(advance, nfx, fx)
        ok = ok & ~fail
        running = running & ok & ~converged & ~escaped
        return fy, fx, running, ok

    # Unrolled: Mosaic fails to legalize scf.for with this carry structure
    # ("failed to legalize operation 'scf.for'", measured 2026-08-18), and
    # the trip count is static anyway. Unrolling also lets the compiler
    # schedule across iterations.
    carry = (flow_ref[0, :], flow_ref[1, :], ok0, ok0)
    for it in range(iters):
        carry = body(it, carry)
    fy, fx, _, ok = carry
    oflow_ref[0, :] = fy
    oflow_ref[1, :] = fx
    ook_ref[0, :] = ok.astype(jnp.float32)


def solver_loop_pallas(
    img1_w, iy_w, ix_w, mask, patch, ia, ib, ic, p_f, flow0, ok0, base,
    *, window, hw, pad, iters, eps, margin, escape_fail, one_d,
    interpret=None,
):
    """Run the LK solver loop for all N points via the fused kernel.

    Inputs in the XLA lane-major kernel's layouts: img1_w/iy_w/ix_w/mask
    (T, T, N); patch (Py, Px, N); ia/ib/ic (N,) pinv rows ((0, 0, 1/Gxx)
    in 1D mode); p_f/flow0 (N, 2) f32; ok0 (N,) bool; base (N, 2) int32
    patch base ((y, x); y unused in 1D mode).  Returns (flow (N, 2), ok).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = img1_w.shape[0]
    n = img1_w.shape[2]
    npad = _round_up(n, BLOCK_N)
    grid = npad // BLOCK_N

    def padn(x, axis):
        pw = [(0, 0)] * x.ndim
        pw[axis] = (0, npad - n)
        return jnp.pad(x, pw) if npad != n else x

    ginv = padn(jnp.stack([ia, ib, ic, jnp.zeros_like(ia)]), 1)
    pf = padn(p_f.astype(jnp.float32).T, 1)
    fl = padn(flow0.astype(jnp.float32).T, 1)
    state = padn(
        jnp.stack([
            ok0.astype(jnp.float32),
            base[:, 0].astype(jnp.float32),
            base[:, 1].astype(jnp.float32),
            jnp.zeros((n,), jnp.float32),
        ]), 1,
    )

    py, pxx = patch.shape[0], patch.shape[1]
    lane_spec = lambda d0, d1: pl.BlockSpec(  # noqa: E731
        (d0, d1, BLOCK_N), lambda i: (0, 0, i)
    )
    row_spec = pl.BlockSpec((2, BLOCK_N), lambda i: (0, i))
    quad_spec = pl.BlockSpec((4, BLOCK_N), lambda i: (0, i))

    oflow, ook = pl.pallas_call(
        functools.partial(
            _solver_kernel, window=window, hw=hw, pad=pad, iters=iters,
            eps=eps, margin=margin, escape_fail=escape_fail, one_d=one_d,
        ),
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((2, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ),
        in_specs=[
            lane_spec(T, T),            # img1
            lane_spec(T, T),            # iy
            lane_spec(T, T),            # ix
            lane_spec(T, T),            # mask
            lane_spec(py, pxx),         # patch
            quad_spec,                  # ginv
            row_spec,                   # pf
            row_spec,                   # flow
            quad_spec,                  # state
        ],
        out_specs=(
            row_spec,
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i)),
        ),
        interpret=interpret,
    )(
        padn(img1_w, 2), padn(iy_w, 2), padn(ix_w, 2), padn(mask, 2),
        padn(patch, 2), ginv, pf, fl, state,
    )
    flow = oflow.T[:n]
    ok = ook[0, :n] > 0.0
    return flow, ok
