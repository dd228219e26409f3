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
