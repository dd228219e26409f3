"""Fused Pallas LK-pyramid level kernel.

The XLA pyramid (ops/image.py::lk_pyramid_impl) is built from grouped convs,
elementwise products, pads, and resizes — ~7 ops per level. On the tunnel
backend every full-image XLA op pays 1-2 ms of per-pass overhead regardless
of arithmetic (PERF.md cost model), so the 4-level pyramid costs ~10 ms while
moving ~30 MB. This kernel computes one whole level — Scharr gradients,
gradient products, the sigma-4 product blurs, the next level's sigma-1 image
blur, and the pad-by-11 stack assembly — in ONE Pallas launch (row-blocked,
VMEM-resident), and the inter-level bilinear downsample as two exact MXU
matmuls whose weight matrices are extracted from `jax.image.resize` itself.

Reference semantics mirrored (src/optical_flow/pyramid.jl:40-79 +
lucas_kanade.jl:112): same Scharr taps, same Gaussian taps, same zero 'SAME'
padding, same ceil-halving bilinear resize as lk_pyramid_impl; the level
dicts have identical shapes, so every consumer works unchanged. Parity is
asserted in tests/test_pyramid_pallas.py.

Layout: each level's image lives on a zero-padded internal frame
(SP + 2*M, WP): image row i at frame row i + PAD + M, image col j at frame
lane j + CP. Everything outside the image is zero by construction, so
circular lane rolls and conv taps propagate zeros exactly like XLA's
zero-padded SAME convs; the only mask needed is the final stack-region mask
(jnp.pad forces the 11-pixel apron to zero where raw convolution values
would be nonzero).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import (
    _SCHARR_DERIV,
    _SCHARR_SMOOTH,
    gaussian_kernel_1d,
    pyramid_shapes,
)

PAD = 11          # LK stack apron (ops/image.py stack padding)
M = 32            # extra frame rows above/below the stack rows (conv halo)
CP = 16           # frame lane where image column 0 sits (>= 13 halo + slack)
BR = 64           # output rows per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geom(h: int, w: int):
    """Frame geometry for a level of image size (h, w): stack rows/cols
    S/OW = h/w + 2*PAD (exact output shape); frame rows SP + 2*M with SP
    rounded up to BR so every grid block's halo read stays in bounds; frame
    lanes WP lane-tile padded."""
    s = h + 2 * PAD
    ow = w + 2 * PAD
    sp = _round_up(s, BR)
    wp = _round_up(w + CP + 13, 128)
    return s, ow, sp, wp


def _hshift(x, s: int):
    """result[..., l] = x[..., l + s] (circular; frame edges are zero)."""
    if s == 0:
        return x
    return pltpu.roll(x, shift=(-s) % x.shape[-1], axis=x.ndim - 1)


def _hconv(x, taps: np.ndarray):
    """Horizontal 'SAME' conv; zero frame edges make the circular wrap
    exact."""
    r = len(taps) // 2
    out = None
    for k, wk in enumerate(taps):
        if wk == 0.0:
            continue
        t = float(wk) * _hshift(x, k - r)
        out = t if out is None else out + t
    return out


def _vconv_slice(x, taps: np.ndarray, out_rows: int, base: int):
    """Vertical 'SAME' conv via static sublane slices:
    result[j] = sum_k taps[k] * x[base + j + k], j in [0, out_rows)."""
    out = None
    for k, wk in enumerate(taps):
        if wk == 0.0:
            continue
        t = float(wk) * jax.lax.slice_in_dim(
            x, base + k, base + k + out_rows, axis=x.ndim - 2
        )
        out = t if out is None else out + t
    return out


def _level_kernel(frame_ref, stack_ref, blur_ref, buf, sem, *,
                  h, w, ow, wp, gk, lk, last):
    """One row block of one pyramid level.

    frame (SP + 2M, WP) ANY: zero-padded level image (see _geom).
    stack (6, S, OW) VMEM block (6, BR, OW): [img, Iy, Ix, Gyy, Gxx, Gyx],
      == jnp.pad of the level maps by PAD (ops/image.py:160-163).
    blur (S, OW) VMEM block: sigma-1-blurred image in the same padded
      layout (the next level's resize input; absent on the last level).
    buf: VMEM scratch (BR + 26, WP) for the DMA'd frame rows.
    """
    b = pl.program_id(0)
    o = b * BR
    # Stack rows [o, o + BR) need image rows [o - PAD - 13, o - PAD + BR + 13)
    # = frame rows [o + M - 13, o + M + BR + 13). Mosaic DMA slices must be
    # sublane-aligned (offset and length multiples of 8), so copy the
    # enclosing aligned window: frame rows [o + 16, o + 16 + BR + 32) —
    # image row t lands at buf index t - (o - PAD - 16).
    cp = pltpu.make_async_copy(
        frame_ref.at[pl.ds(o + 16, BR + 32)], buf, sem
    )
    cp.start()
    cp.wait()
    img = buf[:]               # image row t at index t - (o - PAD - 16)

    # Scharr (reference pyramid.jl:98-103): iy = deriv_y (x) smooth_x,
    # ix = smooth_y (x) deriv_x. Vertical pass over buf rows [3, BR + 27):
    # covers image rows [o - PAD - 12, o - PAD + BR + 12).
    gr = BR + 24
    iy = _hconv(_vconv_slice(img, _SCHARR_DERIV, gr, 3), _SCHARR_SMOOTH)
    ix = _hconv(_vconv_slice(img, _SCHARR_SMOOTH, gr, 3), _SCHARR_DERIV)

    # Gradient products, sigma-4 blur (reference lucas_kanade.jl:112).
    # The XLA pipeline blurs products that are zero outside the (h, w)
    # image, but Scharr of the zero-padded frame is nonzero one pixel
    # beyond the border — mask the products to the image region first
    # (prods row r here = image row o - PAD - 12 + r).
    prows = (o - PAD - 12) + jax.lax.broadcasted_iota(
        jnp.int32, (BR + 24, wp), 0
    )
    planes = jax.lax.broadcasted_iota(jnp.int32, (BR + 24, wp), 1)
    pmask = (
        (prows >= 0) & (prows < h) & (planes >= CP) & (planes < CP + w)
    ).astype(img.dtype)
    prods = jnp.stack([iy * iy, ix * ix, iy * ix]) * pmask[None]
    g = _hconv(_vconv_slice(prods, gk, BR, 0), gk)  # rows [o-PAD, o-PAD+BR)

    # Output row r of this block = stack row o + r = image row o + r - PAD;
    # image row t sits at buf index t - (o - PAD - 16).
    img_rows = jax.lax.slice_in_dim(img, 16, 16 + BR, axis=0)
    iy_rows = jax.lax.slice_in_dim(iy, 12, 12 + BR, axis=0)
    ix_rows = jax.lax.slice_in_dim(ix, 12, 12 + BR, axis=0)

    # jnp.pad semantics: the PAD apron is zero even where the raw conv
    # values are not. Valid region in frame coords: image rows [0, h) ->
    # stack rows [PAD, PAD + h), image lanes [CP, CP + w).
    rows_abs = o + jax.lax.broadcasted_iota(jnp.int32, (BR, wp), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BR, wp), 1)
    row_ok = (rows_abs >= PAD) & (rows_abs < PAD + h)
    lane_ok = (lanes >= CP) & (lanes < CP + w)
    mask = (row_ok & lane_ok).astype(img.dtype)

    out = jnp.stack([
        img_rows, iy_rows, ix_rows, g[0], g[1], g[2]
    ]) * mask[None]
    # Stack lane j = image col j - PAD = frame lane j + CP - PAD: shift left
    # by CP - PAD so stack col 0 lands on lane 0, then crop to OW.
    out = _hshift(out, CP - PAD)
    stack_ref[...] = jax.lax.slice_in_dim(out, 0, ow, axis=2)

    if not last:
        bl = _hconv(_vconv_slice(img, lk, BR, 13), lk)  # rows [o-PAD, ...)
        bl = _hshift(bl * mask, CP - PAD)
        blur_ref[...] = jax.lax.slice_in_dim(bl, 0, ow, axis=1)


def _resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) weight matrix M with M @ x == jax.image.resize(
    x, (n_out, ...), 'linear') along the leading axis — the antialiased
    triangle kernel with per-output normalization (numpy, so it stays a
    compile-time constant inside traced programs; parity asserted in
    tests/test_pyramid_pallas.py::test_resize_matrix_matches_jax)."""
    inv = n_in / n_out
    sample_f = (np.arange(n_out, dtype=np.float64) + 0.5) * inv - 0.5
    kscale = max(inv, 1.0)
    x = np.abs(
        sample_f[:, None] - np.arange(n_in, dtype=np.float64)[None, :]
    ) / kscale
    wts = np.maximum(0.0, 1.0 - x)
    wts /= wts.sum(axis=1, keepdims=True)
    return wts


@functools.lru_cache(maxsize=None)
def _resize_matrices(h: int, w: int, hn: int, wn: int, spn: int, wpn: int):
    """Weight matrices for the (h, w) -> (hn, wn) ceil-halving resize, with
    this kernel's layout offsets embedded: ry (SPN + 2M, S) reads the
    blurred stack rows [PAD, PAD + h) and writes image rows at frame rows
    [M + PAD, ...); rx (OW, WPN) reads stack lanes [PAD, PAD + w) and
    writes frame lanes [CP, CP + wn)."""
    ry = np.zeros((spn + 2 * M, h + 2 * PAD), np.float32)
    ry[M + PAD:M + PAD + hn, PAD:PAD + h] = _resize_weights(h, hn)
    rx = np.zeros((w + 2 * PAD, wpn), np.float32)
    rx[PAD:PAD + w, CP:CP + wn] = _resize_weights(w, wn).T
    return ry, rx


def _pyr_level(frame, h: int, w: int, *, gk: np.ndarray, lk: np.ndarray,
               last: bool, interpret: bool):
    s, ow, sp, wp = _geom(h, w)
    out_shapes = [jax.ShapeDtypeStruct((6, s, ow), jnp.float32)]
    out_specs = [pl.BlockSpec((6, BR, ow), lambda b: (0, b, 0))]
    if not last:
        out_shapes.append(jax.ShapeDtypeStruct((s, ow), jnp.float32))
        out_specs.append(pl.BlockSpec((BR, ow), lambda b: (b, 0)))
    kernel = functools.partial(
        _level_kernel, h=h, w=w, ow=ow, wp=wp, gk=gk, lk=lk, last=last
    )
    if last:
        def kernel2(frame_ref, stack_ref, buf, sem):
            return kernel(frame_ref, stack_ref, None, buf, sem)
    else:
        kernel2 = kernel
    res = pl.pallas_call(
        kernel2,
        grid=(pl.cdiv(s, BR),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((BR + 32, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(frame)
    return res if not last else (res[0], None)


def lk_pyramid_pallas_impl(image, *, levels: int, sigma: float = 1.0,
                           pad: int = PAD, product_sigma: float = 4.0,
                           interpret: bool | None = None):
    """Drop-in for ops/image.py::lk_pyramid_impl (pad must be 11): the same
    level-dict pytree with identical shapes/semantics."""
    if pad != PAD:
        raise ValueError("pallas pyramid is specialized to pad=11")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gk = gaussian_kernel_1d(product_sigma)
    lk = gaussian_kernel_1d(sigma)
    shapes = pyramid_shapes(image.shape[0], image.shape[1], levels)

    h, w = shapes[0]
    _, _, sp, wp = _geom(h, w)
    frame = jnp.zeros((sp + 2 * M, wp), jnp.float32)
    frame = jax.lax.dynamic_update_slice(
        frame, image.astype(jnp.float32), (M + PAD, CP)
    )

    out = []
    for level in range(levels + 1):
        h, w = shapes[level]
        last = level == levels
        stack, blur = _pyr_level(
            frame, h, w, gk=gk, lk=lk, last=last, interpret=interpret
        )
        out.append({
            "stack": stack,
            "img": stack[0],
            "Iy": stack[1],
            "Ix": stack[2],
            "Gyy": stack[3],
            "Gxx": stack[4],
            "Gyx": stack[5],
        })
        if not last:
            hn, wn = shapes[level + 1]
            _, _, spn, wpn = _geom(hn, wn)
            ry, rx = _resize_matrices(h, w, hn, wn, spn, wpn)
            # Two exact MXU passes: rows then cols; HIGHEST precision keeps
            # the f32 weights/data off the bf16 path (PERF.md precision
            # notes).
            frame = jax.lax.dot(
                jax.lax.dot(
                    jnp.asarray(ry), blur,
                    precision=jax.lax.Precision.HIGHEST,
                ),
                jnp.asarray(rx), precision=jax.lax.Precision.HIGHEST,
            )
    return tuple(out)


def use_pallas_pyramid() -> bool:
    """Trace-time switch (SLAMTPU_PALLAS_PYR=1; TPU, or interpreter under SLAMTPU_PALLAS_INTERPRET=1)."""
    if os.environ.get("SLAMTPU_PALLAS_PYR") != "1":
        return False
    # TPU only — except under the explicit SLAMTPU_PALLAS_INTERPRET test
    # override, which runs the kernels in interpreter mode so CPU e2e
    # tests can exercise the full gated configuration.
    if os.environ.get("SLAMTPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu"
