import jax
import numpy as np

import jax.numpy as jnp

from slamtpu.ops.features import (
    CELL_TOPK,
    brief_describe,
    brief_pattern,
    detect_keypoints,
    hamming_distance,
    pack_descriptor_bits,
)


def checkerboard(h, w, square=16):
    yy, xx = np.mgrid[0:h, 0:w]
    board = (((yy // square) + (xx // square)) % 2).astype(np.float32)
    return board


def test_detect_finds_checker_corners():
    h, w = 128, 160
    img = checkerboard(h, w)
    occupied = jnp.zeros((4, 2), jnp.float32)
    occ_valid = jnp.zeros((4,), bool)
    vals, ys, xs = detect_keypoints(
        jnp.asarray(img), occupied, occ_valid, cell_size=32, radius=8
    )
    vals, ys, xs = np.asarray(vals), np.asarray(ys), np.asarray(xs)
    found = vals > 1e-4
    assert found.sum() >= 20
    # Every detection should land near a checker corner (multiple of 16).
    dy = np.minimum(ys[found] % 16, 16 - ys[found] % 16)
    dx = np.minimum(xs[found] % 16, 16 - xs[found] % 16)
    assert np.percentile(dy, 90) <= 2
    assert np.percentile(dx, 90) <= 2


def test_detect_respects_occupancy_mask():
    h, w = 128, 160
    img = checkerboard(h, w)
    # Occupy the whole left half with existing keypoints.
    pts = []
    for y in range(0, h, 8):
        for x in range(0, 80, 8):
            pts.append([y, x])
    occupied = jnp.asarray(np.array(pts, np.float32))
    occ_valid = jnp.ones((len(pts),), bool)
    vals, ys, xs = detect_keypoints(
        jnp.asarray(img), occupied, occ_valid, cell_size=32, radius=8
    )
    vals, xs = np.asarray(vals), np.asarray(xs)
    assert (xs[vals > 1e-4] >= 72).all()


def test_detect_returns_sorted_per_cell():
    h, w = 96, 96
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(h, w)).astype(np.float32)
    vals, _, _ = detect_keypoints(
        jnp.asarray(img), jnp.zeros((1, 2), jnp.float32),
        jnp.zeros((1,), bool), cell_size=32, radius=8,
    )
    vals = np.asarray(vals)
    assert vals.shape == (9, CELL_TOPK)
    assert (np.diff(vals, axis=1) <= 1e-7).all()


def test_brief_descriptor_stable_and_discriminative():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(128, 128)).astype(np.float32)
    pattern = jnp.asarray(brief_pattern())
    kps = jnp.asarray(
        np.array([[40.0, 40.0], [40.2, 40.1], [90.0, 90.0]], np.float32)
    )
    bits, ok = brief_describe(
        jnp.asarray(img), kps, jnp.ones((3,), bool), pattern
    )
    assert np.asarray(ok).all()
    packed = pack_descriptor_bits(np.asarray(bits))
    d_same = hamming_distance(packed[0], packed[1])
    d_diff = hamming_distance(packed[0], packed[2])
    assert d_same < 40
    assert d_diff > 80


def test_brief_border_rejection():
    img = np.zeros((64, 64), np.float32)
    pattern = jnp.asarray(brief_pattern())
    kps = jnp.asarray(np.array([[2.0, 30.0], [32.0, 32.0]], np.float32))
    _, ok = brief_describe(jnp.asarray(img), kps, jnp.ones((2,), bool), pattern)
    ok = np.asarray(ok)
    assert not ok[0] and ok[1]


def test_subpixel_refine_recovers_parabola_vertex():
    """A synthetic quadratic peak at a known fractional position is
    recovered by the parabola-vertex fit to < 0.02 px; border and
    non-maximum entries return the integer position unchanged."""
    from slamtpu.ops.features import subpixel_refine

    h, w = 40, 60
    ty, tx = 17.3, 25.6   # true subpixel peak
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    resp = jnp.asarray(10.0 - (yy - ty) ** 2 - (xx - tx) ** 2)

    ys = jnp.asarray(np.array([[17], [0], [30]], np.int32))
    xs = jnp.asarray(np.array([[26], [5], [59]], np.int32))
    ysf, xsf = jax.jit(subpixel_refine)(resp, ys, xs)
    ysf, xsf = np.asarray(ysf), np.asarray(xsf)
    assert abs(ysf[0, 0] - ty) < 0.02 and abs(xsf[0, 0] - tx) < 0.02
    # border row: no refinement
    assert ysf[1, 0] == 0.0
    # interior non-peak: offsets clamped to [-0.5, 0.5] of the integer
    assert abs(ysf[2, 0] - 30.0) <= 0.5 and abs(xsf[2, 0] - 59.0) <= 0.5


def test_detect_subpix_near_integer_detection():
    """subpix=True returns the integer detections displaced by at most
    0.5 px, with identical response ranking."""
    from slamtpu.ops.features import detect_keypoints

    rng = np.random.default_rng(8)
    img = np.zeros((64, 96), np.float32)
    for _ in range(25):
        cy_, cx_ = rng.uniform(8, 56), rng.uniform(8, 88)
        yy, xx = np.mgrid[0:64, 0:96].astype(np.float64)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -((yy - cy_) ** 2 + (xx - cx_) ** 2) / (2 * 1.6 ** 2)
        )
    img = jnp.asarray(np.clip(img, 0, 1).astype(np.float32))
    occ = jnp.zeros((8, 2), jnp.float32)
    val = jnp.zeros((8,), bool)
    v0, y0, x0 = detect_keypoints(
        img, occ, val, cell_size=16, radius=5, subpix=False
    )
    v1, y1, x1 = detect_keypoints(
        img, occ, val, cell_size=16, radius=5, subpix=True
    )
    v0, y0, x0, v1, y1, x1 = map(np.asarray, (v0, y0, x0, v1, y1, x1))
    np.testing.assert_array_equal(v0, v1)
    sel = v0 > 1e-4
    assert np.abs(y1[sel] - y0[sel]).max() <= 0.5
    assert np.abs(x1[sel] - x0[sel]).max() <= 0.5
    # Gaussian blobs at fractional centers: refinement must actually move
    # a majority of the detections off the integer grid.
    assert np.mean(np.abs(y1[sel] - y0[sel]) > 0.01) > 0.5
