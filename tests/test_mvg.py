import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slamtpu import hostmath as hm
from slamtpu.ops.mvg import essential_ransac, triangulate_points
from slamtpu.ops.pnp import p3p_ransac, pnp_refine, solve_quartic


def synthetic_scene(seed=0, n=200, noise=0.0):
    """Random 3D points seen by two cameras with known relative pose."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-5, 5, n),
            rng.uniform(-3, 3, n),
            rng.uniform(6, 20, n),
        ],
        axis=-1,
    )
    w = rng.normal(size=3)
    w = 0.08 * w / np.linalg.norm(w)
    R = hm.so3_exp(w)
    t = np.array([0.6, 0.05, 0.1])
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])

    pc1 = pts
    pc2 = pts @ R.T + t

    def proj(pc):
        px = pc[:, :2] / pc[:, 2:3]
        px_pix = px * [fx, fy] + [cx, cy]
        if noise > 0:
            px_pix = px_pix + rng.normal(0, noise, px_pix.shape)
        return px_pix, (px_pix - [cx, cy]) / [fx, fy]

    px1, pd1 = proj(pc1)
    px2, pd2 = proj(pc2)
    intr = np.array([fx, fy, cx, cy], dtype=np.float32)
    return pts, R, t, px1, px2, pd1, pd2, intr


def test_triangulate_exact():
    pts, R, t, px1, px2, pd1, pd2, intr = synthetic_scene()
    P1 = np.eye(4, dtype=np.float32)
    P2 = np.eye(4, dtype=np.float32)
    P2[:3, :3] = R
    P2[:3, 3] = t
    X = triangulate_points(
        jnp.asarray(pd1, jnp.float32), jnp.asarray(pd2, jnp.float32),
        jnp.asarray(P1), jnp.asarray(P2),
    )
    X = np.asarray(X)
    Xc = X[:, :3] / X[:, 3:4]
    assert np.median(np.linalg.norm(Xc - pts, axis=-1)) < 2e-2


def test_essential_ransac_recovers_pose():
    pts, R, t, px1, px2, pd1, pd2, intr = synthetic_scene(noise=0.3)
    n = len(pts)
    # Add outliers.
    rng = np.random.default_rng(1)
    n_out = 40
    px2_o = px2.copy()
    px2_o[:n_out] += rng.uniform(20, 80, (n_out, 2))
    pd2_o = (px2_o - intr[2:]) / intr[:2]

    res = essential_ransac(
        jnp.asarray(pd1, jnp.float32), jnp.asarray(pd2_o, jnp.float32),
        jnp.asarray(px1, jnp.float32), jnp.asarray(px2_o, jnp.float32),
        jnp.ones((n,), bool), jnp.int32(n),
        jnp.asarray(intr), jax.random.PRNGKey(0),
        hypotheses=256, threshold=3.0,
    )
    inliers = np.asarray(res["inliers"])
    assert inliers[n_out:].mean() > 0.9
    assert inliers[:n_out].mean() < 0.2

    pose = np.asarray(res["pose"])
    R_est, t_est = pose[:3, :3], pose[:3, 3]
    assert np.allclose(R_est, R, atol=2e-2)
    t_dir = t / np.linalg.norm(t)
    assert np.dot(t_est, t_dir) > 0.99  # unit translation, right direction


def test_solve_quartic_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        roots_true = np.sort(rng.uniform(-3, 3, 4))
        c = np.poly(roots_true)  # leading coeff 1
        roots, valid = solve_quartic(
            *[jnp.asarray(np.float32(ci)) for ci in c]
        )
        roots = np.sort(np.asarray(roots)[np.asarray(valid)])
        assert len(roots) == 4
        assert np.allclose(roots, roots_true, atol=1e-3)


def test_solve_quartic_two_real():
    # (x^2 + 1)(x - 1)(x - 2): two real roots.
    c = np.array([1.0, -3.0, 3.0, -3.0, 2.0])
    roots, valid = solve_quartic(*[jnp.asarray(np.float32(ci)) for ci in c])
    roots = np.asarray(roots)[np.asarray(valid)]
    assert np.allclose(np.sort(roots), [1.0, 2.0], atol=1e-3)


def test_p3p_ransac():
    pts, R, t, px1, px2, pd1, pd2, intr = synthetic_scene(seed=3, noise=0.2)
    n = len(pts)
    # Solve pose of camera 2 from world points + pixel obs in cam 2.
    bearings = np.concatenate([pd2, np.ones((n, 1))], axis=-1)
    bearings /= np.linalg.norm(bearings, axis=-1, keepdims=True)
    # Outliers.
    rng = np.random.default_rng(2)
    px2_o = px2.copy()
    px2_o[:30] += rng.uniform(25, 60, (30, 2))

    res = p3p_ransac(
        jnp.asarray(pts, jnp.float32), jnp.asarray(px2_o, jnp.float32),
        jnp.asarray(bearings, jnp.float32),
        jnp.ones((n,), bool), jnp.int32(n), jnp.asarray(intr),
        jax.random.PRNGKey(1), hypotheses=256, threshold=3.0,
    )
    cw = np.asarray(res["cw"])
    assert int(res["n_inliers"]) > 0.8 * (n - 30)
    assert np.allclose(cw[:3, :3], R, atol=5e-3)
    assert np.allclose(cw[:3, 3], t, atol=5e-2)


def test_pnp_refine_improves_pose():
    pts, R, t, px1, px2, pd1, pd2, intr = synthetic_scene(seed=5, noise=0.1)
    n = len(pts)
    cw = np.eye(4)
    cw[:3, :3] = R
    cw[:3, 3] = t
    theta_true = hm.pose_to_theta(cw)
    theta0 = theta_true + np.array([0.01, -0.01, 0.005, 0.05, -0.04, 0.06])
    pixels_yx = px2[:, ::-1].copy()

    res = pnp_refine(
        jnp.asarray(theta0, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(pixels_yx, jnp.float32),
        jnp.ones((n,), bool), jnp.asarray(intr),
        iters1=5, iters2=10, repr_eps=3.0,
    )
    theta = np.asarray(res["theta"])
    assert float(res["final_error"]) < float(res["initial_error"])
    assert np.allclose(theta[:3], theta_true[:3], atol=2e-3)
    assert np.allclose(theta[3:], theta_true[3:], atol=2e-2)


def test_pnp_analytic_jacobian_matches_jacfwd():
    """The closed-form LM Jacobian (ops/pnp.py::_pnp_jacobian) equals the
    autodiff Jacobian of the weighted residuals."""
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.pnp import _pnp_jacobian, _pnp_residuals

    rng = np.random.default_rng(12)
    n = 50
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    rng.uniform(5, 20, n)], axis=-1).astype(np.float32)
    theta = jnp.asarray(
        np.concatenate([rng.normal(0, 0.3, 3), rng.normal(0, 0.5, 3)]),
        jnp.float32,
    )
    intr = jnp.asarray(np.array([450.0, 440.0, 320.0, 240.0], np.float32))
    weights = jnp.asarray(
        (rng.uniform(size=n) > 0.2).astype(np.float32)
    )
    pix = jnp.asarray(rng.uniform(0, 480, (n, 2)).astype(np.float32))

    def flat(th):
        r, _ = _pnp_residuals(th, jnp.asarray(pts), pix, intr)
        return r * weights[:, None]

    J_ad = np.asarray(jax.jacfwd(flat)(theta))        # (N, 2, 6)
    J_an = np.asarray(
        _pnp_jacobian(theta, jnp.asarray(pts), weights, intr)
    )
    scale = np.abs(J_ad).max()
    assert np.abs(J_an - J_ad).max() < 1e-3 * scale
