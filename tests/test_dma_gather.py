"""Parity of the pipelined-DMA window gather (ops/dma_gather.py) with the
XLA vmapped dynamic_slice it replaces — including dynamic_slice's start
clamping, edge-of-image spans, and the LK level kernel end to end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slamtpu.ops import dma_gather
from slamtpu.ops.dma_gather import dma_span_gather, extract_windows, gather_windows


def _xla_gather(src, start, t1, t2):
    def one(s):
        return jax.lax.dynamic_slice(
            src, (0, s[0], s[1]), (src.shape[0], t1, t2)
        )
    return jax.vmap(one)(start)


@pytest.mark.parametrize("shape,t", [((6, 60, 300), 19), ((1, 47, 131), 32)])
def test_gather_windows_matches_dynamic_slice(shape, t):
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    # Starts beyond every boundary to exercise the clamp.
    start = jnp.asarray(
        rng.integers(-10, max(shape[1], shape[2]) + 10, size=(53, 2)).astype(
            np.int32
        )
    )
    out = gather_windows(src, start, t, t, interpret=True)
    ref = _xla_gather(src, start, t, t)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_span_extraction_identity():
    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.standard_normal((2, 40, 500)).astype(np.float32))
    start = jnp.asarray(
        np.stack([rng.integers(0, 21, 64), rng.integers(0, 481, 64)], -1)
        .astype(np.int32)
    )
    spans, xr = dma_span_gather(src, start, 19, 19, interpret=True)
    assert int(jnp.max(xr)) < 128 and int(jnp.min(xr)) >= 0
    out = extract_windows(spans, xr, 19)
    ref = _xla_gather(src, start, 19, 19)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_lk_level_with_dma_gather_matches_xla(monkeypatch):
    """The lane-major LK level kernel produces identical flow with the DMA
    gather path (interpret mode) and the XLA gather path.

    Uses the unjitted lk_flow (fb_track's jit trace cache would otherwise
    pin whichever gather path was traced first)."""
    import slamtpu.ops.lucas_kanade as lk
    from slamtpu.ops.image import build_lk_pyramid
    from slamtpu.ops.lucas_kanade import lk_pad

    h, w, n = 64, 96, 32
    window, levels = 4, 1
    pad = lk_pad(window)
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    pts = []
    for _ in range(n):
        cy, cx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        img += rng.uniform(0.5, 1.0) * np.exp(
            -(((yy - cy) ** 2) + (xx - cx) ** 2) / (2 * 2.0 ** 2)
        )
        pts.append((cy, cx))
    img = (img / img.max()).astype(np.float32)
    img2 = np.roll(img, (1, -2), (0, 1))

    pyr1 = build_lk_pyramid(jnp.asarray(img), levels=levels, pad=pad)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=levels, pad=pad)
    px = jnp.asarray(np.asarray(pts, np.float32))
    disp = jnp.zeros_like(px)
    valid = jnp.ones(n, bool)

    kw = dict(
        levels=levels, window=window, iters=20, eps=1e-2, eig_thresh=1e-4,
        pad=pad,
    )
    ref_flow, ref_ok = lk.lk_flow(pyr1, pyr2, px, disp, valid, **kw)

    # Force the DMA path regardless of backend (interpret on CPU).
    monkeypatch.setattr(lk, "use_dma_gather", lambda: True)
    out_flow, out_ok = lk.lk_flow(pyr1, pyr2, px, disp, valid, **kw)

    np.testing.assert_array_equal(np.asarray(ref_ok), np.asarray(out_ok))
    # The two graphs fuse differently; allow float reassociation noise.
    np.testing.assert_allclose(
        np.asarray(ref_flow), np.asarray(out_flow), atol=1e-4
    )
