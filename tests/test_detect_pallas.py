"""Parity of the fused detection kernel (ops/detect_pallas.py) with the
XLA scatter + dilate + reduce_window tail — interpreter mode on CPU; the
TPU smoke suite re-checks on the real backend."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slamtpu.ops.detect_pallas import suppress_and_nms
from slamtpu.ops.features import _dilate, detect_keypoints


def _xla_tail(resp, yx, valid, radius, min_response):
    h, w = resp.shape
    occ = jnp.zeros((h, w), jnp.float32).at[yx[:, 0], yx[:, 1]].max(
        valid.astype(jnp.float32)
    )
    r = jnp.where(_dilate(occ, radius) > 0.0, 0.0, resp)
    pooled = jax.lax.reduce_window(
        r, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((r >= pooled) & (r > min_response), r, 0.0)


@pytest.mark.parametrize("radius", [3, 17])
def test_suppress_and_nms_matches_xla(radius):
    h, w = 96, 200
    rng = np.random.default_rng(0)
    resp = rng.uniform(0, 1, (h, w)).astype(np.float32)
    n = 40
    yx = np.stack(
        [rng.integers(0, h, n), rng.integers(0, w, n)], axis=-1
    ).astype(np.int32)
    valid = rng.uniform(size=n) > 0.3

    ref = np.asarray(_xla_tail(
        jnp.asarray(resp), jnp.asarray(yx), jnp.asarray(valid),
        radius, 0.01,
    ))
    out = np.asarray(suppress_and_nms(
        jnp.asarray(resp), jnp.asarray(yx), jnp.asarray(valid),
        radius=radius, min_response=0.01,
    ))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)


def test_detect_keypoints_flag_parity(monkeypatch):
    """detect_keypoints end to end with the fused kernel == without."""
    h, w = 96, 128
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for _ in range(120):
        cy_, cx_ = rng.uniform(8, h - 8), rng.uniform(8, w - 8)
        s = rng.uniform(1.0, 2.0)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -(((yy - cy_) ** 2) + (xx - cx_) ** 2) / (2 * s * s)
        )
    img = (img / img.max()).astype(np.float32)
    occ_px = np.stack(
        [rng.uniform(0, h - 1, 24), rng.uniform(0, w - 1, 24)], -1
    ).astype(np.float32)
    occ_valid = np.ones(24, bool)

    monkeypatch.delenv("SLAMTPU_PALLAS_DETECT", raising=False)
    v0, y0, x0 = [np.asarray(a) for a in detect_keypoints(
        jnp.asarray(img), jnp.asarray(occ_px), jnp.asarray(occ_valid),
        cell_size=32, radius=9, min_response=1e-4,
    )]
    monkeypatch.setenv("SLAMTPU_PALLAS_DETECT", "1")
    detect_keypoints.clear_cache()  # env gate is read at trace time
    try:
        v1, y1, x1 = [np.asarray(a) for a in detect_keypoints(
            jnp.asarray(img), jnp.asarray(occ_px), jnp.asarray(occ_valid),
            cell_size=32, radius=9, min_response=1e-4,
        )]
    finally:
        detect_keypoints.clear_cache()
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_array_equal(x0, x1)
