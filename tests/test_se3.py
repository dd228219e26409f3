import numpy as np
import pytest

import jax.numpy as jnp

from slamtpu import hostmath as hm
from slamtpu.ops import se3


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@pytest.mark.parametrize("seed", range(5))
def test_host_se3_exp_log_roundtrip(seed):
    rng = np.random.default_rng(seed)
    xi = rng.normal(size=6)
    # log returns the principal rotation (angle <= pi); keep the test there.
    xi[:3] *= 0.8 / np.linalg.norm(xi[:3])
    T = hm.se3_exp(xi)
    # Valid rigid transform.
    assert np.allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-10)
    assert np.allclose(hm.se3_log(T), xi, atol=1e-8)


def test_host_se3_inv():
    rng = np.random.default_rng(0)
    T = hm.se3_exp(rng.normal(size=6))
    assert np.allclose(T @ hm.se3_inv(T), np.eye(4), atol=1e-12)


@pytest.mark.parametrize("seed", range(5))
def test_host_euler_zyx_roundtrip(seed):
    rng = np.random.default_rng(seed)
    R = random_rotation(rng)
    theta = hm.rot_to_zyx(R)
    assert np.allclose(hm.rot_zyx(theta), R, atol=1e-10)


def test_host_euler_zyx_composition():
    # RotZYX(a,b,c) = Rz(a) @ Ry(b) @ Rx(c).
    a, b, c = 0.3, -0.4, 1.1
    Rz = hm.rot_zyx([a, 0, 0])
    Ry = hm.rot_zyx([0, b, 0])
    Rx = hm.rot_zyx([0, 0, c])
    assert np.allclose(hm.rot_zyx([a, b, c]), Rz @ Ry @ Rx, atol=1e-12)


@pytest.mark.parametrize("seed", range(3))
def test_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    xi = rng.normal(size=6) * 0.5
    T_host = hm.se3_exp(xi)
    T_dev = np.asarray(se3.se3_exp(jnp.asarray(xi, dtype=jnp.float32)))
    assert np.allclose(T_dev, T_host, atol=1e-4)

    xi_back = np.asarray(se3.se3_log(jnp.asarray(T_host, dtype=jnp.float32)))
    assert np.allclose(xi_back, xi, atol=1e-4)

    R = random_rotation(rng)
    th_dev = np.asarray(se3.rot_to_zyx(jnp.asarray(R, dtype=jnp.float32)))
    assert np.allclose(th_dev, hm.rot_to_zyx(R), atol=1e-5)
    R_dev = np.asarray(se3.rot_zyx(jnp.asarray(th_dev)))
    assert np.allclose(R_dev, R, atol=1e-5)


def test_device_small_angle():
    xi = jnp.asarray([1e-6, -1e-6, 1e-7, 0.1, 0.2, 0.3], dtype=jnp.float32)
    T = se3.se3_exp(xi)
    assert np.allclose(np.asarray(T[:3, 3]), [0.1, 0.2, 0.3], atol=1e-6)
    assert np.allclose(np.asarray(se3.se3_log(T)), np.asarray(xi), atol=1e-5)


def test_motion_model_identity_chain():
    # predict(wc, t) = wc @ exp(log(inv(prev_wc) @ wc) * dt) round trip.
    rng = np.random.default_rng(1)
    prev = hm.se3_exp(rng.normal(size=6) * 0.1)
    cur = hm.se3_exp(rng.normal(size=6) * 0.1)
    vel = hm.se3_log(hm.se3_inv(prev) @ cur)
    pred = cur @ hm.se3_exp(vel)
    expected = cur @ hm.se3_inv(prev) @ cur
    assert np.allclose(pred, expected, atol=1e-8)
