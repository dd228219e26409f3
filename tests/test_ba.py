import numpy as np

import jax.numpy as jnp

from slamtpu import hostmath as hm
from slamtpu.ops.ba import local_bundle_adjustment


def make_ba_problem(seed=0, n_poses=4, n_points=60, noise_px=0.3,
                    perturb=True):
    rng = np.random.default_rng(seed)
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    intr = np.array([fx, fy, cx, cy], np.float32)

    points = np.stack(
        [
            rng.uniform(-6, 6, n_points),
            rng.uniform(-4, 4, n_points),
            rng.uniform(8, 25, n_points),
        ],
        axis=-1,
    )
    poses_cw = []
    for i in range(n_poses):
        w = rng.normal(size=3)
        w = 0.02 * i * w / np.linalg.norm(w)
        t = np.array([0.4 * i, 0.02 * i, 0.05 * i])
        poses_cw.append(hm.rt_to_4x4(hm.so3_exp(w), t))

    obs_pose, obs_point, obs_px = [], [], []
    for pi, cw in enumerate(poses_cw):
        pc = points @ cw[:3, :3].T + cw[:3, 3]
        px = np.stack(
            [fy * pc[:, 1] / pc[:, 2] + cy, fx * pc[:, 0] / pc[:, 2] + cx],
            axis=-1,
        )
        px += rng.normal(0, noise_px, px.shape)
        for xi in range(n_points):
            obs_pose.append(pi)
            obs_point.append(xi)
            obs_px.append(px[xi])

    thetas = np.stack([hm.pose_to_theta(cw) for cw in poses_cw])
    points_in = points.copy()
    if perturb:
        # Perturb non-constant poses and all points (mild: in the pipeline BA
        # always starts from near-converged estimates).
        thetas[1:] += rng.normal(0, 0.005, thetas[1:].shape)
        points_in = points + rng.normal(0, 0.04, points.shape)

    return {
        "thetas_true": np.stack([hm.pose_to_theta(cw) for cw in poses_cw]),
        "thetas0": thetas,
        "points_true": points,
        "points0": points_in,
        "obs_pose": np.array(obs_pose, np.int32),
        "obs_point": np.array(obs_point, np.int32),
        "obs_px": np.array(obs_px, np.float32),
        "intr": intr,
    }


def run_ba(prob, pose_const, outlier_frac=0.0, seed=1):
    obs_px = prob["obs_px"].copy()
    n_obs = len(obs_px)
    is_out = np.zeros(n_obs, bool)
    if outlier_frac > 0:
        rng = np.random.default_rng(seed)
        k = int(outlier_frac * n_obs)
        sel = rng.choice(n_obs, k, replace=False)
        obs_px[sel] += rng.uniform(8, 25, (k, 2))
        is_out[sel] = True

    res = local_bundle_adjustment(
        jnp.asarray(prob["thetas0"], jnp.float32),
        jnp.asarray(pose_const),
        jnp.asarray(prob["points0"], jnp.float32),
        jnp.asarray(prob["obs_pose"]),
        jnp.asarray(prob["obs_point"]),
        jnp.asarray(obs_px, jnp.float32),
        jnp.ones((n_obs,), bool),
        jnp.asarray(prob["intr"]),
        iters1=5, iters2=10, repr_eps=5.0,
    )
    return res, is_out


def reproj_rmse(thetas, points, prob):
    err = []
    for o in range(len(prob["obs_pose"])):
        th = thetas[prob["obs_pose"][o]]
        pt = points[prob["obs_point"][o]]
        cw = hm.theta_to_pose(th)
        pc = cw[:3, :3] @ pt + cw[:3, 3]
        px = np.array(
            [
                prob["intr"][1] * pc[1] / pc[2] + prob["intr"][3],
                prob["intr"][0] * pc[0] / pc[2] + prob["intr"][2],
            ]
        )
        err.append(np.sum((px - prob["obs_px"][o]) ** 2))
    return np.sqrt(np.mean(err))


def test_ba_reduces_error_and_respects_constants():
    prob = make_ba_problem()
    # Two constant poses pin the monocular gauge (global scale).
    pose_const = np.zeros(4, bool)
    pose_const[0] = True
    pose_const[1] = True
    prob["thetas0"][1] = prob["thetas_true"][1]

    rmse0 = reproj_rmse(prob["thetas0"], prob["points0"], prob)
    res, _ = run_ba(prob, pose_const)
    thetas = np.asarray(res["poses"])
    points = np.asarray(res["points"])
    rmse1 = reproj_rmse(thetas, points, prob)

    assert rmse1 < rmse0 * 0.5
    assert rmse1 < 1.0  # close to the noise floor
    # Constant poses untouched.
    assert np.allclose(thetas[0], prob["thetas0"][0])
    assert np.allclose(thetas[1], prob["thetas0"][1])
    # Free poses moved toward truth.
    assert np.abs(thetas[2:] - prob["thetas_true"][2:]).max() < 0.02


def test_ba_flags_outliers():
    # In the pipeline, BA observations already passed FB-tracking + RANSAC +
    # triangulation gates, so outliers are few — phase-1 is pure L2 like the
    # reference and cannot stay unbiased under heavy contamination.
    prob = make_ba_problem(seed=2)
    pose_const = np.zeros(4, bool)
    pose_const[0] = True
    res, is_out = run_ba(prob, pose_const, outlier_frac=0.03)
    flagged = np.asarray(res["outliers"])
    # Most injected outliers flagged; few false positives.
    assert flagged[is_out].mean() > 0.9
    assert flagged[~is_out].mean() < 0.12


def test_ba_handles_padding():
    prob = make_ba_problem(seed=3, n_poses=3, n_points=40)
    pose_const = np.zeros(5, bool)
    pose_const[0] = True
    pose_const[3:] = True  # padded pose slots marked constant

    n_obs = len(prob["obs_pose"])
    pad_obs = 32
    pad_pts = 16
    obs_pose = np.concatenate([prob["obs_pose"], np.zeros(pad_obs, np.int32)])
    obs_point = np.concatenate(
        [prob["obs_point"], np.zeros(pad_obs, np.int32)]
    )
    obs_px = np.concatenate(
        [prob["obs_px"], np.zeros((pad_obs, 2), np.float32)]
    )
    obs_valid = np.concatenate([np.ones(n_obs, bool), np.zeros(pad_obs, bool)])
    thetas0 = np.concatenate(
        [prob["thetas0"], np.zeros((2, 6), np.float32)]
    )
    points0 = np.concatenate(
        [prob["points0"], np.zeros((pad_pts, 3), np.float32)]
    )

    res = local_bundle_adjustment(
        jnp.asarray(thetas0, jnp.float32),
        jnp.asarray(pose_const),
        jnp.asarray(points0, jnp.float32),
        jnp.asarray(obs_pose), jnp.asarray(obs_point),
        jnp.asarray(obs_px, jnp.float32), jnp.asarray(obs_valid),
        jnp.asarray(prob["intr"]),
        iters1=5, iters2=10, repr_eps=5.0,
    )
    thetas = np.asarray(res["poses"])[:3]
    points = np.asarray(res["points"])[:40]
    rmse = reproj_rmse(thetas, points, prob)
    assert rmse < 1.0
    assert np.isfinite(np.asarray(res["final_cost"]))
