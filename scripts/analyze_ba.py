"""Analyze captured BA runs: TPU output vs CPU-jax output vs host f64
reference (scipy), pose deltas, outlier behavior.

Run on CPU: JAX_PLATFORMS=cpu python scripts/analyze_ba.py
(reads /tmp/ba_runs.pkl captured on the TPU backend)
"""
import pickle
import sys

sys.path.insert(0, ".")

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from slamtpu.ops.ba import local_bundle_adjustment

with open("/tmp/ba_runs.pkl", "rb") as f:
    data = pickle.load(f)


def rot_zyx_np(t):
    cz, sz = np.cos(t[0]), np.sin(t[0])
    cy, sy = np.cos(t[1]), np.sin(t[1])
    cx, sx = np.cos(t[2]), np.sin(t[2])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    return Rz @ Ry @ Rx


def cost_np(poses, points, obs_pose, obs_point, obs_px, w, intr):
    p = poses[obs_pose]
    x = points[obs_point]
    out = np.zeros(len(obs_pose))
    fy, fx, cy, cx = intr[1], intr[0], intr[3], intr[2]
    for i in range(len(obs_pose)):
        R = rot_zyx_np(p[i, :3])
        pc = R @ x[i] + p[i, 3:]
        z = pc[2] if abs(pc[2]) > 1e-12 else 1e-12
        proj = np.array([fy * pc[1] / z + cy, fx * pc[0] / z + cx])
        r = obs_px[i] - proj
        out[i] = np.dot(r, r) * w[i] * w[i]
    return out


for ri, run in enumerate(data["runs"]):
    (poses0, pose_const, points0, obs_pose, obs_point, obs_px, obs_valid,
     intr) = run["inputs"]
    out = run["out"]
    n_poses = int((np.abs(poses0).sum(axis=1) > 0).sum()) + 1
    n_obs = int(obs_valid.sum())
    dp = np.linalg.norm(out["poses"][:, 3:] - poses0[:, 3:], axis=1)
    dx = np.linalg.norm(out["points"] - points0, axis=1)
    n_out = int(out["outliers"].sum())
    w = obs_valid.astype(np.float64)
    c0 = cost_np(poses0.astype(np.float64), points0.astype(np.float64),
                 obs_pose, obs_point, obs_px.astype(np.float64), w, intr)
    print(f"run {ri}: P={poses0.shape[0]} const={pose_const[:6].astype(int)} "
          f"X={points0.shape[0]} O={n_obs} outliers={n_out} "
          f"cost0={c0.sum():.1f}")
    print(f"   TPU  |dt| per pose: {np.array2string(dp[:6], precision=3)} "
          f"max|dx|={dx.max():.3f} final_cost={float(out['final_cost']):.2f}")

    # Re-run the identical jitted program on CPU.
    res_cpu = jax.device_get(local_bundle_adjustment(
        poses0, pose_const, points0, obs_pose, obs_point, obs_px, obs_valid,
        intr, **run["kw"]))
    dpc = np.linalg.norm(res_cpu["poses"][:, 3:] - poses0[:, 3:], axis=1)
    dxc = np.linalg.norm(res_cpu["points"] - points0, axis=1)
    print(f"   CPU  |dt| per pose: {np.array2string(dpc[:6], precision=3)} "
          f"max|dx|={dxc.max():.3f} "
          f"final_cost={float(res_cpu['final_cost']):.2f} "
          f"outliers={int(res_cpu['outliers'].sum())}")
    # Disagreement between backends on identical inputs:
    dd = np.linalg.norm(res_cpu["poses"] - out["poses"], axis=1)
    print(f"   CPU-vs-TPU pose param diff: {np.array2string(dd[:6], precision=4)}")
