"""SE(3) / SO(3) primitives for the device compute path (JAX, float32).

TPU-native replacement for the reference's Manifolds.jl / Rotations.jl usage
(reference: src/SLAM.jl:28, src/motion_model.jl:37-58, src/frame.jl:432-450).
All functions are pure, jit-safe, and batch-friendly (leading dims broadcast
via vmap at call sites).

Conventions (shared with the reference):
  - Poses are 4x4 homogeneous matrices.
  - `cw` transforms world -> camera, `wc` camera -> world.
  - The bundle-adjustment pose parameterization is Euler ZYX + translation:
    R = Rz(a) @ Ry(b) @ Rx(c), theta = (a, b, c)  (reference frame.jl:432-450).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues formula: (3,) axis-angle -> (3, 3) rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    # Taylor-safe coefficients.
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation matrix -> axis-angle (3,)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w_raw = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # theta / (2 sin theta), Taylor for small angles.
    scale = jnp.where(
        jnp.abs(sin_t) < 1e-6,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * sin_t + _EPS),
    )
    w = scale[..., None] * w_raw
    # Near theta == pi the above is ill-conditioned; use diagonal extraction.
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + _EPS), 0.0, None)
    axis = jnp.sqrt(axis2)
    signs = jnp.sign(
        jnp.where(jnp.abs(w_raw) > 1e-12, w_raw, jnp.ones_like(w_raw))
    )
    w_pi = theta[..., None] * axis * signs
    return jnp.where(near_pi[..., None], w_pi, w)


def _left_jacobian(w):
    """SO(3) left Jacobian V used in SE(3) exp."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta).clip(_EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inv(w):
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    half = theta * 0.5
    cot = jnp.cos(half) / jnp.sin(half).clip(_EPS)
    c = (1.0 - half * cot) / theta2.clip(_EPS * _EPS)
    c = jnp.where(theta2 < 1e-8, 1.0 / 12.0 + theta2 / 720.0, c)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + c[..., None, None] * W2


def se3_exp(xi):
    """se(3) twist (6,) = (w, v) -> 4x4 homogeneous transform."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_left_jacobian(w) @ v[..., None])[..., 0]
    return rt_to_4x4(R, t)


def se3_log(T):
    """4x4 transform -> se(3) twist (6,) = (w, v)."""
    w = so3_log(T[..., :3, :3])
    v = (_left_jacobian_inv(w) @ T[..., :3, 3:])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def se3_inv(T):
    """Inverse of a rigid transform (exploits orthogonality)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_4x4(Rt, -(Rt @ t[..., None])[..., 0])


def rt_to_4x4(R, t):
    """(3,3) + (3,) -> 4x4 (reference SLAM.jl:61-67 `to_4x4`)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def mat3_to_4x4(M):
    """3x3 -> 4x4 with identity bottom-right (reference SLAM.jl:47-53)."""
    out = jnp.zeros(M.shape[:-2] + (4, 4), dtype=M.dtype)
    out = out.at[..., :3, :3].set(M)
    return out.at[..., 3, 3].set(1.0)


# ---------------------------------------------------------------------------
# Euler ZYX (the BA pose parameterization, reference frame.jl:432-450,
# bundle_adjustment.jl:25,103,118: RotZYX(t1,t2,t3) = Rz(t1) Ry(t2) Rx(t3)).
# ---------------------------------------------------------------------------

def rot_zyx(theta):
    """(..., 3) Euler angles (z, y, x) -> (..., 3, 3) rotation."""
    a, b, c = theta[..., 0], theta[..., 1], theta[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    r00 = ca * cb
    r01 = ca * sb * sc - sa * cc
    r02 = ca * sb * cc + sa * sc
    r10 = sa * cb
    r11 = sa * sb * sc + ca * cc
    r12 = sa * sb * cc - ca * sc
    r20 = -sb
    r21 = cb * sc
    r22 = cb * cc
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_zyx(R):
    """(..., 3, 3) rotation -> (..., 3) Euler (z, y, x) angles."""
    a = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    b = jnp.arctan2(
        -R[..., 2, 0], jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2)
    )
    c = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([a, b, c], axis=-1)


def pose_to_theta(T):
    """4x4 cw pose -> 6-vector (euler_zyx, t) used by BA."""
    return jnp.concatenate([rot_to_zyx(T[..., :3, :3]), T[..., :3, 3]], axis=-1)


def theta_to_pose(theta):
    """6-vector (euler_zyx, t) -> 4x4 pose."""
    return rt_to_4x4(rot_zyx(theta[..., :3]), theta[..., 3:])


def to_homogeneous(p):
    """(..., 3) -> (..., 4) with 1 appended (reference SLAM.jl:34)."""
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
