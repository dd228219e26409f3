"""NumPy reference oracles for device kernels + determinism under fixed
PRNG keys (SURVEY.md section 4 items (b) and (d))."""
import numpy as np

import jax
import jax.numpy as jnp

from slamtpu import hostmath as hm
from slamtpu.ops.image import (
    build_lk_pyramid,
    gaussian_kernel_1d,
    scharr_gradients,
)
from slamtpu.ops.mvg import essential_ransac, triangulate_points
from slamtpu.ops.pnp import p3p_ransac


def test_scharr_oracle():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 40)).astype(np.float32)
    iy, ix = jax.device_get(scharr_gradients(jnp.asarray(img)))
    # NumPy oracle: separable [3,10,3]/16 smoothing x [-1,0,1]/2 derivative.
    smooth = np.array([3, 10, 3]) / 16.0
    deriv = np.array([-1, 0, 1]) / 2.0

    def conv1d(a, k, axis):
        out = np.zeros_like(a)
        pad = len(k) // 2
        padded = np.pad(a, [(pad, pad) if i == axis else (0, 0)
                            for i in range(2)])
        for i, kv in enumerate(k):  # XLA convs are correlations (no flip)
            sl = [slice(None)] * 2
            sl[axis] = slice(i, i + a.shape[axis])
            out += kv * padded[tuple(sl)]
        return out

    iy_ref = conv1d(conv1d(img, deriv, 0), smooth, 1)
    ix_ref = conv1d(conv1d(img, smooth, 0), deriv, 1)
    assert np.allclose(iy, iy_ref, atol=1e-5)
    assert np.allclose(ix, ix_ref, atol=1e-5)


def test_gaussian_kernel_normalized():
    k = gaussian_kernel_1d(1.0)
    assert np.isclose(k.sum(), 1.0, atol=1e-6)
    assert k[len(k) // 2] == k.max()


def test_triangulation_oracle():
    rng = np.random.default_rng(1)
    X = np.array([0.5, -0.3, 8.0])
    P1 = np.eye(4)
    P2 = hm.rt_to_4x4(hm.so3_exp([0.02, -0.01, 0.03]), [0.4, 0.0, 0.1])
    x1 = X[:2] / X[2]
    pc2 = P2[:3, :3] @ X + P2[:3, 3]
    x2 = pc2[:2] / pc2[2]
    out = np.asarray(triangulate_points(
        jnp.asarray([x1], jnp.float32), jnp.asarray([x2], jnp.float32),
        jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32),
    ))[0]
    est = out[:3] / out[3]
    # NumPy oracle: least-squares nullspace of the same DLT system.
    A = np.stack([
        x1[0] * P1[2] - P1[0],
        x1[1] * P1[2] - P1[1],
        x2[0] * P2[2] - P2[0],
        x2[1] * P2[2] - P2[1],
    ])
    _, _, vh = np.linalg.svd(A)
    ref = vh[-1]
    ref = ref[:3] / ref[3]
    assert np.allclose(est, ref, atol=1e-3)
    assert np.allclose(est, X, atol=1e-3)


def _scene(seed=0, n=150):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    rng.uniform(6, 18, n)], -1)
    R = hm.so3_exp(0.05 * rng.normal(size=3))
    t = np.array([0.5, 0.05, 0.1])
    intr = np.array([500.0, 500.0, 320.0, 240.0], np.float32)
    pc1, pc2 = pts, pts @ R.T + t
    pd1 = pc1[:, :2] / pc1[:, 2:3]
    pd2 = pc2[:, :2] / pc2[:, 2:3]
    px1 = pd1 * 500 + [320, 240]
    px2 = pd2 * 500 + [320, 240]
    return pts, R, t, pd1, pd2, px1, px2, intr


def test_ransac_deterministic_under_fixed_key():
    pts, R, t, pd1, pd2, px1, px2, intr = _scene()
    n = len(pts)
    args = (
        jnp.asarray(pd1, jnp.float32), jnp.asarray(pd2, jnp.float32),
        jnp.asarray(px1, jnp.float32), jnp.asarray(px2, jnp.float32),
        jnp.ones((n,), bool), jnp.int32(n), jnp.asarray(intr),
    )
    r1 = jax.device_get(essential_ransac(
        *args, jax.random.PRNGKey(7), hypotheses=128, threshold=3.0))
    r2 = jax.device_get(essential_ransac(
        *args, jax.random.PRNGKey(7), hypotheses=128, threshold=3.0))
    assert np.array_equal(r1["pose"], r2["pose"])
    assert np.array_equal(r1["inliers"], r2["inliers"])

    bear = np.concatenate([pd2, np.ones((n, 1))], -1)
    bear /= np.linalg.norm(bear, axis=-1, keepdims=True)
    pargs = (
        jnp.asarray(pts, jnp.float32), jnp.asarray(px2, jnp.float32),
        jnp.asarray(bear, jnp.float32), jnp.ones((n,), bool), jnp.int32(n),
        jnp.asarray(intr),
    )
    q1 = jax.device_get(p3p_ransac(
        *pargs, jax.random.PRNGKey(3), hypotheses=128, threshold=3.0))
    q2 = jax.device_get(p3p_ransac(
        *pargs, jax.random.PRNGKey(3), hypotheses=128, threshold=3.0))
    assert np.array_equal(q1["cw"], q2["cw"])


def test_pipeline_deterministic():
    """Two identical runs produce identical trajectories (fixed seeds)."""
    from slamtpu import Params
    from slamtpu.datasets.synthetic import make_scene
    from slamtpu.io.saver import ReplaySaver
    from slamtpu.models.slam_manager import SlamManager

    def run():
        scene = make_scene(n_frames=8, height=160, width=224, n_points=900,
                           stereo=True, baseline=0.5, seed=9)
        params = Params(stereo=True, max_nb_keypoints=400, max_distance=24,
                        keypoint_capacity=512, initial_parallax=8.0,
                        sequential=True)
        saver = ReplaySaver()
        sm = SlamManager(params, scene.camera,
                         right_camera=scene.right_camera, slam_io=saver)
        for i in range(len(scene)):
            left, right = scene.frame(i)
            sm.add_stereo_image(left, right, float(scene.timestamps[i]))
        return saver.trajectory_xyz()

    t1 = run()
    t2 = run()
    assert np.array_equal(t1, t2)
