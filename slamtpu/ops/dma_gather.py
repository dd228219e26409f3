"""Pipelined-DMA window gather for per-point image slices.

The LK level kernels (ops/lucas_kanade.py) open each level by gathering an
(C, T, T) window per keypoint from the level's map stack — the TPU-native
equivalent of the reference's per-point window views
(src/optical_flow/lucas_kanade.jl:37-45, 199-208). XLA lowers the vmapped
`dynamic_slice` to a serialized per-point copy loop (~2.5 ms at N=1024 for
the 6-map stack, scripts/gather_bench.py) — per-copy latency, ~1% of HBM
bandwidth.

Two-stage replacement:

1. `dma_span_gather` (Pallas): per point, copy the (C, T1, 2, 128) slab
   covering the window's rows and the two 128-lane tiles its columns span.
   TPU DMA requires lane-tile-aligned lane slices; viewing the (C, H, W)
   stack as (C, H, W // 128, 128) makes the lane tiles an indexable
   dimension, so row offsets stay arbitrary and no row padding is needed.
   The kernel keeps `NBUF` async copies in flight so per-copy latency
   overlaps (measured ~0.15 ms for 1024 spans); it does no compute at all.
2. Extraction of the T2-wide window at lane remainder xr in [0, 128):
   either per-point one-hot matmuls on the MXU (`extract_windows_mxu`,
   exact: each output is 1.0 * one input) or a coarse/fine masked-shift
   cascade (`extract_windows`, used under the CPU interpreter).

The composition matches
`vmap(lambda s: dynamic_slice(src, (0, s0, s1), (C, t1, t2)))(start)`
including dynamic_slice's start clamping.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane span: one 128-lane tile of remainder + one tile of window width.
# Window widths up to 128 are supported (production T=19, P=32).
SPAN = 256

# In-flight DMA budget. Each transfer is ~10-60 KB; 8 in flight covers the
# issue-to-completion latency at HBM throughput.
NBUF = 8


def _span_kernel(idx_ref, src_ref, out_ref, sem):
    """idx (N, 2) SMEM int32 = (y0, x_tile_index); src (C, Hp, Wt, 128) ANY;
    out (N, C, T1, 2, 128) ANY."""
    n, _, t1, _, _ = out_ref.shape

    def dma(i):
        y0 = idx_ref[i, 0]
        xbt = idx_ref[i, 1]
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(y0, t1), pl.ds(xbt, 2), :],
            out_ref.at[i],
            sem.at[i % NBUF],
        )

    for j in range(min(NBUF, n)):
        dma(j).start()

    def body(i, _):
        # Wait slot i before reusing its semaphore for transfer i + NBUF.
        dma(i).wait()

        @pl.when(i + NBUF < n)
        def _():
            dma(i + NBUF).start()

        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dma_span_gather(src, start, t1: int, t2: int, *,
                    interpret: bool | None = None):
    """src (C, H, W), start (N, 2) int32 ->
    (spans (N, C, t1, SPAN), xr (N,)).

    spans[i, :, :, xr[i] : xr[i] + t2] equals the XLA gather
    dynamic_slice(src, (0, start[i, 0], start[i, 1]), (C, t1, t2)) with
    dynamic_slice's start clamping. xr is in [0, 128).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, h, w = src.shape
    n = start.shape[0]
    # One trailing tile of slack guarantees xbt + 2 <= wt.
    wp = _round_up(w, 128) + 128
    wt = wp // 128
    src_wide = jnp.pad(src, ((0, 0), (0, 0), (0, wp - w))).reshape(
        c, h, wt, 128
    )

    # dynamic_slice clamps starts unsigned-style: negatives land at the HIGH
    # end (observed XLA behavior; production starts are never negative).
    def clamp(v, hi):
        return jnp.where(v < 0, hi, jnp.minimum(v, hi)).astype(jnp.int32)

    y0 = clamp(start[:, 0], h - t1)
    x0 = clamp(start[:, 1], w - t2)
    xbt = x0 // 128
    xr = x0 - 128 * xbt
    idx = jnp.stack([y0, xbt], axis=-1)
    spans = pl.pallas_call(
        _span_kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, t1, 2, 128), src.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        interpret=interpret,
    )(idx, src_wide)
    return spans.reshape(n, c, t1, SPAN), xr


def extract_windows(spans, xr, t2: int):
    """(N, C, T1, SPAN), (N,) -> (N, C, T1, t2): per-point lane extraction
    via a coarse (xr // 8) + fine (xr % 8) masked-shift cascade."""
    coarse = xr // 8
    fine = xr - 8 * coarse
    wide = t2 + 7
    r = jnp.zeros(spans.shape[:3] + (wide,), spans.dtype)
    for k in range(16):
        sel = (coarse == k).astype(spans.dtype)[:, None, None, None]
        r = r + sel * jax.lax.slice_in_dim(spans, 8 * k, 8 * k + wide, axis=3)
    out = jnp.zeros(spans.shape[:3] + (t2,), spans.dtype)
    for k in range(8):
        sel = (fine == k).astype(spans.dtype)[:, None, None, None]
        out = out + sel * jax.lax.slice_in_dim(r, k, k + t2, axis=3)
    return out


def extract_windows_mxu(spans, xr, t2: int):
    """(N, C, T1, SPAN), (N,) -> (N, C, T1, t2) via per-point one-hot
    matmuls: out[n, c, y, j] = spans[n, c, y, xr[n] + j]. Each output
    element is 1.0 * one input element (all other addends are exactly 0),
    but the MXU's default bf16 passes would truncate the VALUE — HIGHEST
    precision keeps f32 data intact (the f32x6 decomposition)."""
    n, c, t1, span = spans.shape
    lanes = jnp.arange(span, dtype=jnp.int32)
    cols = xr[:, None, None] + jnp.arange(t2, dtype=jnp.int32)[None, None, :]
    onehot = (lanes[None, :, None] == cols).astype(spans.dtype)  # (N, S, t2)
    return jax.lax.dot_general(
        spans.reshape(n, c * t1, span), onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(n, c, t1, t2)


def gather_windows(src, start, t1: int, t2: int, *,
                   interpret: bool | None = None, mxu: bool | None = None):
    """Drop-in for `vmap(dynamic_slice)`: src (C, H, W), start (N, 2) ->
    (N, C, t1, t2), executed as pipelined DMAs + vector extraction."""
    spans, xr = dma_span_gather(src, start, t1, t2, interpret=interpret)
    if mxu is None:
        mxu = jax.default_backend() == "tpu"
    if mxu:
        return extract_windows_mxu(spans, xr, t2)
    return extract_windows(spans, xr, t2)


def use_dma_gather() -> bool:
    """Trace-time switch: DMA gather on TPU backends (default), XLA
    elsewhere; SLAMTPU_NO_DMA_GATHER=1 forces the XLA path."""
    if os.environ.get("SLAMTPU_NO_DMA_GATHER"):
        return False
    return jax.default_backend() == "tpu"
