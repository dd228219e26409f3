"""Batched small-linalg kernels vs numpy references."""
import numpy as np
import jax.numpy as jnp

from slamtpu.ops.smallalg import (
    inv3x3,
    polar_rotation3x3,
    smallest_eigvec_psd,
    solve_psd,
)


def test_smallest_eigvec_matches_eigh():
    rng = np.random.default_rng(0)
    B = rng.normal(size=(64, 3, 4)).astype(np.float32)  # rank-3 4x4 PSD
    M = np.einsum("nij,nik->njk", B, B)
    v = np.asarray(smallest_eigvec_psd(jnp.asarray(M)))
    _, V = np.linalg.eigh(M)
    dots = np.abs(np.einsum("ni,ni->n", v, V[:, :, 0]))
    assert dots.min() > 1 - 1e-4


def test_smallest_eigvec_9x9():
    rng = np.random.default_rng(1)
    B = rng.normal(size=(32, 8, 9)).astype(np.float32)
    M = np.einsum("nij,nik->njk", B, B)
    v = np.asarray(smallest_eigvec_psd(jnp.asarray(M)))
    _, V = np.linalg.eigh(M)
    dots = np.abs(np.einsum("ni,ni->n", v, V[:, :, 0]))
    assert dots.min() > 1 - 1e-4


def test_inv3x3():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(128, 3, 3)).astype(np.float32)
    A += 3.0 * np.eye(3)  # keep well-conditioned
    Ainv, det = inv3x3(jnp.asarray(A))
    np.testing.assert_allclose(
        np.asarray(Ainv), np.linalg.inv(A), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(det), np.linalg.det(A), rtol=1e-3
    )


def test_polar_rotation_recovers_rotation():
    rng = np.random.default_rng(3)
    errs = []
    for i in range(16):
        # Random rotation composed with a mild PSD stretch: polar factor
        # must recover the rotation.
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        S = np.eye(3) + 0.3 * np.diag(rng.uniform(0, 1, 3))
        H = (R @ S).astype(np.float32)
        Rp, det = polar_rotation3x3(jnp.asarray(H))
        assert float(det) > 0
        errs.append(np.abs(np.asarray(Rp) - R).max())
    assert max(errs) < 1e-4


def test_solve_psd():
    rng = np.random.default_rng(4)
    for k in (3, 6, 9, 30):
        B = rng.normal(size=(8, k, k + 2)).astype(np.float32)
        A = np.einsum("nij,nkj->nik", B, B) + 0.1 * np.eye(k)
        b = rng.normal(size=(8, k)).astype(np.float32)
        x = np.asarray(solve_psd(jnp.asarray(A), jnp.asarray(b)))
        x_ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x, x_ref, rtol=2e-2, atol=2e-3)
