"""Parity tests for the fused Pallas PnP refinement (ops/pnp_pallas.py)
against the XLA two-phase LM (ops/pnp.py::pnp_refine)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamtpu.hostmath import rot_zyx as host_rot
from slamtpu.ops.pnp import pnp_refine
from slamtpu.ops.pnp_pallas import pnp_refine_pallas


def _problem(seed, n=256, noise=0.3, outlier_frac=0.05):
    rng = np.random.default_rng(seed)
    intr = np.array([450.0, 440.0, 320.0, 240.0], np.float32)
    th_true = np.concatenate(
        [rng.normal(0, 0.2, 3), rng.normal(0, 0.4, 3)]
    ).astype(np.float32)
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
         rng.uniform(6, 25, n)], axis=-1
    ).astype(np.float32)
    R = host_rot(th_true[:3].astype(np.float64))
    pc = pts @ R.T + th_true[3:]
    px = np.stack(
        [intr[1] * pc[:, 1] / pc[:, 2] + intr[3],
         intr[0] * pc[:, 0] / pc[:, 2] + intr[2]], axis=-1
    ).astype(np.float32)
    px += rng.normal(0, noise, px.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    px[:n_out] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    th0 = th_true + np.concatenate(
        [rng.normal(0, 0.01, 3), rng.normal(0, 0.05, 3)]
    ).astype(np.float32)
    return th0, pts, px, valid, intr, th_true


@pytest.mark.parametrize("seed", [3, 5, 9])
def test_pnp_pallas_matches_xla(seed):
    th0, pts, px, valid, intr, th_true = _problem(seed)
    args = (jnp.asarray(th0), jnp.asarray(pts), jnp.asarray(px),
            jnp.asarray(valid), jnp.asarray(intr))
    want = jax.device_get(pnp_refine(*args))
    got = jax.device_get(jax.jit(
        lambda *a: pnp_refine_pallas(*a, interpret=True)
    )(*args))

    # The LM paths are not bitwise identical (dot/reduction order) but must
    # find the same optimum and the same outlier set.
    np.testing.assert_array_equal(got["outliers"], want["outliers"])
    assert abs(float(got["final_error"]) - float(want["final_error"])) \
        < 0.02 * (1.0 + float(want["final_error"]))
    np.testing.assert_allclose(got["theta"], want["theta"], atol=2e-4)
    # And both recover the true pose (bound set by the 0.3 px noise and
    # the sub-gate residual outliers, not the solver).
    assert np.abs(got["theta"][:3] - th_true[:3]).max() < 2e-2
    assert np.abs(got["theta"][3:] - th_true[3:]).max() < 1e-1


def test_pnp_pallas_improves_initial_error():
    th0, pts, px, valid, intr, _ = _problem(11, noise=0.1)
    got = jax.device_get(pnp_refine_pallas(
        jnp.asarray(th0), jnp.asarray(pts), jnp.asarray(px),
        jnp.asarray(valid), jnp.asarray(intr), interpret=True,
    ))
    assert float(got["final_error"]) < float(got["initial_error"])
    assert int(got["n_outliers"]) == int(np.sum(got["outliers"]))


def test_masked_median_pallas_matches_xla():
    from slamtpu.ops.frontend_step import _masked_median
    from slamtpu.ops.scalar_pallas import masked_median_pallas

    rng = np.random.default_rng(3)
    for trial in range(4):
        v = jnp.asarray(rng.normal(0, 30, 512).astype(np.float32))
        m = jnp.asarray(rng.uniform(size=512) > [0.3, 0.05, 0.97, 1.1][trial])
        want = float(_masked_median(v, m))
        got = float(masked_median_pallas(v, m, interpret=True))
        assert abs(got - want) < 1e-4 * (1.0 + abs(want)), trial


def test_dlt_pallas_matches_xla():
    """Pallas DLT triangulation vs mvg.triangulate_points: same inverse-
    iteration arithmetic (factor-once vs refactor-per-step reassociation
    only), both shared and per-point P2."""
    from slamtpu.hostmath import rot_zyx as host_rot
    from slamtpu.ops.dlt_pallas import triangulate_points_pallas
    from slamtpu.ops.mvg import triangulate_points

    rng = np.random.default_rng(5)
    n = 300
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-2, 2, n),
                    rng.uniform(5, 25, n)], axis=-1)
    P1 = np.eye(4, dtype=np.float32)
    R = host_rot(np.array([0.05, -0.03, 0.02]))
    P2m = np.eye(4); P2m[:3, :3] = R; P2m[:3, 3] = [0.5, 0.05, 0.02]
    def proj(P, X):
        pc = X @ P[:3, :3].T + P[:3, 3]
        return (pc[:, :2] / pc[:, 2:3]).astype(np.float32)
    px1 = proj(P1, pts) + rng.normal(0, 1e-3, (n, 2))
    px2 = proj(P2m, pts) + rng.normal(0, 1e-3, (n, 2))
    a1, a2 = jnp.asarray(px1, jnp.float32), jnp.asarray(px2, jnp.float32)

    for P2 in (jnp.asarray(P2m, jnp.float32),
               jnp.broadcast_to(jnp.asarray(P2m, jnp.float32), (n, 4, 4))):
        want = np.asarray(triangulate_points(a1, a2, jnp.asarray(P1), P2))
        got = np.asarray(triangulate_points_pallas(
            a1, a2, jnp.asarray(P1), P2, interpret=True
        ))
        # Null vectors are sign-ambiguous; compare the dehomogenized points.
        w_w = np.where(np.abs(want[:, 3:]) < 1e-12, 1e-12, want[:, 3:])
        g_w = np.where(np.abs(got[:, 3:]) < 1e-12, 1e-12, got[:, 3:])
        np.testing.assert_allclose(
            got[:, :3] / g_w, want[:, :3] / w_w, rtol=0, atol=2e-3
        )


def test_eig_pallas_matches_xla():
    """smallest_eigvec_pallas vs smallalg.smallest_eigvec_psd for the k=4
    (DLT) and k=9 (8-point) systems: same inverse-iteration arithmetic up
    to factor-once reassociation; vectors compared modulo sign."""
    from slamtpu.ops.eig_pallas import smallest_eigvec_pallas
    from slamtpu.ops.smallalg import smallest_eigvec_psd

    rng = np.random.default_rng(7)
    for k, n in ((4, 200), (9, 128), (10, 64)):
        # PSD with a known, well-separated near-null eigenvector.
        Q, _ = np.linalg.qr(rng.normal(size=(n, k, k)))
        lam = np.concatenate(
            [np.full((n, 1), 1e-6), rng.uniform(0.5, 3.0, (n, k - 1))],
            axis=-1,
        )
        M = np.einsum("nik,nk,njk->nij", Q, lam, Q).astype(np.float32)
        Mj = jnp.asarray(M)
        want = np.asarray(smallest_eigvec_psd(Mj))
        got = np.asarray(smallest_eigvec_pallas(Mj, interpret=True))
        true = Q[..., 0].astype(np.float32)
        for name, vec in (("xla", want), ("pallas", got)):
            sign = np.sign(np.sum(vec * true, axis=-1, keepdims=True))
            np.testing.assert_allclose(
                vec * sign, true, rtol=0, atol=2e-3, err_msg=f"{name} k={k}"
            )
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, rtol=0, atol=2e-3)


def test_solve_psd_pallas_matches_xla():
    from slamtpu.ops.scalar_pallas import solve_psd_pallas
    from slamtpu.ops.smallalg import solve_psd

    rng = np.random.default_rng(13)
    for k in (12, 48):
        Q = rng.normal(size=(k, k)).astype(np.float32)
        A = Q @ Q.T + k * np.eye(k, dtype=np.float32)
        b = rng.normal(size=k).astype(np.float32)
        want = np.asarray(solve_psd(jnp.asarray(A), jnp.asarray(b)))
        got = np.asarray(solve_psd_pallas(
            jnp.asarray(A), jnp.asarray(b), interpret=True
        ))
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-4 * (
            1.0 + np.abs(want).max()
        ))


def test_p3p_pallas_matches_xla():
    """p3p_grunert_pallas vs _p3p_grunert on exact triads: identical
    formulas lane-major; poses compared where both mark the root valid."""
    from slamtpu.hostmath import rot_zyx as host_rot
    from slamtpu.ops.p3p_pallas import p3p_grunert_pallas
    from slamtpu.ops.pnp import _p3p_grunert

    rng = np.random.default_rng(21)
    m = 64
    X = np.stack([
        rng.uniform(-3, 3, (m, 3)),
        rng.uniform(-2, 2, (m, 3)),
        rng.uniform(6, 20, (m, 3)),
    ], axis=-1).astype(np.float32)              # (m, 3pts, 3)
    th = np.concatenate([rng.normal(0, 0.3, 3), [0.2, -0.1, 0.4]])
    R_true = host_rot(th[:3])
    t_true = th[3:]
    Y = X @ R_true.T + t_true                   # camera-frame points
    f = (Y / np.linalg.norm(Y, axis=-1, keepdims=True)).astype(np.float32)

    Rx, tx, okx = map(np.asarray, _p3p_grunert(
        jnp.asarray(X), jnp.asarray(f)
    ))
    Rp, tp, okp = map(np.asarray, p3p_grunert_pallas(
        jnp.asarray(X), jnp.asarray(f), interpret=True
    ))

    # Both must contain the true pose among their valid candidates for
    # (nearly) every triad.
    def hit_rate(R, t, ok):
        dR = np.abs(R - R_true[None, None]).max(axis=(-1, -2))
        dt = np.abs(t - t_true[None, None]).max(axis=-1)
        return np.mean(((dR < 5e-3) & (dt < 5e-2) & ok).any(axis=1))

    assert hit_rate(Rx, tx, okx) > 0.9
    assert hit_rate(Rp, tp, okp) > 0.9

    # Candidate agreement where both flag valid: the vast majority match
    # to f32 noise; a few ill-conditioned SPURIOUS roots polish to
    # different (equally legitimate) fixed points because the kernel's
    # cbrt is exp(log/3) — RANSAC scoring filters those either way.
    both = okx & okp
    dR = np.abs(Rp - Rx).max(axis=(-1, -2))
    assert np.mean(dR[both] < 5e-3) > 0.9
    assert np.mean(okx == okp) > 0.95


def test_admit_rows_matches_scatter():
    """Sort+gather admission (_admit_rows) vs the .at[].set scatter form."""
    from slamtpu.ops.keyframe_step import _admit_rows

    rng = np.random.default_rng(17)
    cap, d = 64, 160
    flat = rng.uniform(size=d) > 0.7
    before = np.cumsum(flat) - flat
    slot = (10 + before).astype(np.int32)     # unique targets
    flat = flat & (slot < cap)
    scatter_idx = np.where(flat, slot, cap).astype(np.int32)
    base = rng.normal(size=(cap, 2)).astype(np.float32)
    values = rng.normal(size=(d, 2)).astype(np.float32)
    base1 = rng.normal(size=(cap, 2)).astype(np.float32)
    values1 = rng.normal(size=(d, 2)).astype(np.float32)

    ext = np.concatenate([base, np.zeros((1, 2), np.float32)])
    ext[scatter_idx] = values
    want = ext[:cap]
    mask_want = np.zeros(cap + 1, bool)
    mask_want[scatter_idx] = flat
    mask_want = mask_want[:cap]

    (got, got1), mask_got = _admit_rows(
        jnp.asarray(scatter_idx), cap, jnp.asarray(flat),
        [(jnp.asarray(base), jnp.asarray(values)),
         (jnp.asarray(base1), jnp.asarray(values1))],
    )
    np.testing.assert_array_equal(np.asarray(mask_got), mask_want)
    np.testing.assert_array_equal(np.asarray(got), want)
    ext1 = np.concatenate([base1, np.zeros((1, 2), np.float32)])
    ext1[scatter_idx] = values1
    np.testing.assert_array_equal(np.asarray(got1), ext1[:cap])
