"""Nister 5-point minimal solver: exact-geometry recovery + planar scenes."""
import numpy as np
import jax.numpy as jnp

from slamtpu.ops.fivepoint import five_point_candidates


def _random_rt(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0.05, 0.3)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    return R, t


def _project_pair(pts, R, t):
    pd1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    pd2 = pc2[:, :2] / pc2[:, 2:3]
    return pd1.astype(np.float32), pd2.astype(np.float32)


def _essential(R, t):
    tx = np.array([
        [0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0],
    ])
    E = tx @ R
    return E / np.linalg.norm(E)


def _best_candidate_err(E_true, E_cand, valid):
    errs = []
    for r in range(E_cand.shape[0]):
        if not valid[r]:
            continue
        Ec = E_cand[r] / np.linalg.norm(E_cand[r])
        errs.append(min(np.abs(Ec - E_true).max(),
                        np.abs(Ec + E_true).max()))
    return min(errs) if errs else np.inf


def test_five_point_exact_general_scene():
    rng = np.random.default_rng(0)
    n_ok = 0
    for trial in range(8):
        R, t = _random_rt(rng)
        pts = rng.uniform(-2, 2, (5, 3))
        pts[:, 2] = rng.uniform(4, 10, 5)
        pd1, pd2 = _project_pair(pts, R, t)
        E, valid = five_point_candidates(
            jnp.asarray(pd1[None]), jnp.asarray(pd2[None])
        )
        err = _best_candidate_err(
            _essential(R, t), np.asarray(E[0]), np.asarray(valid[0])
        )
        if err < 2e-2:
            n_ok += 1
    assert n_ok >= 6  # exact minimal data; allow rare bracketing misses


def test_five_point_planar_scene():
    """Dominant-plane geometry: 8-point's linear system is degenerate, the
    5-point solver must still produce the true essential matrix."""
    rng = np.random.default_rng(1)
    n_ok = 0
    for trial in range(8):
        R, t = _random_rt(rng)
        # All 5 points on one plane z = 5 + 0.3 x + 0.1 y.
        xy = rng.uniform(-2, 2, (5, 2))
        z = 5.0 + 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
        pts = np.concatenate([xy, z[:, None]], axis=1)
        pd1, pd2 = _project_pair(pts, R, t)
        E, valid = five_point_candidates(
            jnp.asarray(pd1[None]), jnp.asarray(pd2[None])
        )
        err = _best_candidate_err(
            _essential(R, t), np.asarray(E[0]), np.asarray(valid[0])
        )
        if err < 2e-2:
            n_ok += 1
    assert n_ok >= 6
