"""Parity tests for the fused Pallas pyramid (ops/pyramid_pallas.py) against
the XLA reference implementation (ops/image.py::lk_pyramid_impl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamtpu.ops.image import lk_pyramid_impl
from slamtpu.ops.pyramid_pallas import (
    _resize_weights,
    lk_pyramid_pallas_impl,
)


def _rand_image(h, w, seed=3):
    rng = np.random.default_rng(seed)
    # Smoothly varying + texture, like a normalized camera image.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        0.5
        + 0.3 * np.sin(yy / 13.0) * np.cos(xx / 9.0)
        + 0.2 * rng.standard_normal((h, w)).astype(np.float32)
    )
    return np.clip(img, 0.0, 1.0).astype(np.float32)


@pytest.mark.parametrize("n_in,n_out", [
    (376, 188), (188, 94), (94, 47), (47, 24),
    (1241, 621), (621, 311), (311, 156), (64, 32), (45, 23),
])
def test_resize_matrix_matches_jax(n_in, n_out):
    """The numpy weight matrix reproduces jax.image.resize linear
    (antialiased) along one axis. Not bitwise: jax computes the triangle
    weights in f32 (odd sizes hit representation error in the scale), the
    matrix in f64 — the ~1e-4 relative gap is far below the pipeline's f16
    image quantization (params.image_dtype)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_in, 5)).astype(np.float32)
    want = np.asarray(jax.image.resize(jnp.asarray(x), (n_out, 5), "linear"))
    got = _resize_weights(n_in, n_out).astype(np.float32) @ x
    assert np.abs(got - want).max() < 2.5e-4 * max(1.0, np.abs(want).max())


@pytest.mark.parametrize("h,w,levels", [(48, 64, 3), (45, 57, 2)])
def test_pyramid_parity(h, w, levels):
    """Every level map matches lk_pyramid_impl within f32 reassociation
    noise; shapes are identical."""
    img = jnp.asarray(_rand_image(h, w))
    want = jax.jit(
        lambda x: lk_pyramid_impl(x, levels=levels)
    )(img)
    got = jax.jit(
        lambda x: lk_pyramid_pallas_impl(x, levels=levels, interpret=True)
    )(img)
    assert len(got) == len(want)
    for lvl, (g, wnt) in enumerate(zip(got, want)):
        assert g["stack"].shape == wnt["stack"].shape, lvl
        gs = np.asarray(g["stack"])
        ws = np.asarray(wnt["stack"])
        scale = max(1.0, np.abs(ws).max())
        err = np.abs(gs - ws).max()
        # Level 0 shares the exact input; deeper levels ride the resize
        # tolerance (see test_resize_matrix_matches_jax).
        tol = 5e-5 if lvl == 0 else 1e-3
        assert err < tol * scale, (lvl, err, scale)


def test_pyramid_parity_kitti_shape():
    """One full-size level-0 check (row blocking + partial blocks at the
    production 376x1241 shape); levels=1 keeps the test fast."""
    img = jnp.asarray(_rand_image(376, 1241, seed=5))
    want = jax.jit(lambda x: lk_pyramid_impl(x, levels=1))(img)
    got = jax.jit(
        lambda x: lk_pyramid_pallas_impl(x, levels=1, interpret=True)
    )(img)
    for lvl in range(2):
        gs = np.asarray(got[lvl]["stack"])
        ws = np.asarray(want[lvl]["stack"])
        scale = max(1.0, np.abs(ws).max())
        tol = 5e-5 if lvl == 0 else 1e-3
        assert np.abs(gs - ws).max() < tol * scale, lvl
