"""Capture the first few BA problem instances from a live run, with GT.

Writes /tmp/ba_runs.pkl: list of dicts with the padded device inputs and
the resulting outputs, plus frame GT for offline analysis.
Run: python scripts/capture_ba.py [n_frames]
Env: DIAG_CPU=1 to force CPU backend.
"""
import os
import pickle
import sys

sys.path.insert(0, ".")

if os.environ.get("DIAG_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax

import slamtpu.ops.ba as ba_mod

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10

orig_ba = ba_mod.local_bundle_adjustment
runs = []


def hook(poses0, pose_const, points0, obs_pose, obs_point, obs_px,
         obs_valid, intrinsics, **kw):
    res = orig_ba(poses0, pose_const, points0, obs_pose, obs_point, obs_px,
                  obs_valid, intrinsics, **kw)
    if len(runs) < 6:
        runs.append({
            "inputs": jax.device_get((poses0, pose_const, points0, obs_pose,
                                      obs_point, obs_px, obs_valid,
                                      intrinsics)),
            "kw": dict(kw),
            "out": jax.device_get(res),
        })
    return res


# Patch at the call site (estimator imported the symbol directly).
import slamtpu.models.estimator as es_mod

es_mod.local_bundle_adjustment = hook

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene

scene = make_scene(n_frames=n_frames, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7)
saver = ReplaySaver()
sm = SlamManager(Params(stereo=True), scene.camera,
                 right_camera=scene.right_camera, slam_io=saver)
for i in range(len(scene)):
    l, r = scene.frame(i)
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
sm.finish()

with open("/tmp/ba_runs.pkl", "wb") as f:
    pickle.dump({"runs": runs,
                 "gt": np.stack([p[:3, 3] for p in scene.poses_wc]),
                 "poses_wc": scene.poses_wc}, f)
print(f"captured {len(runs)} BA runs -> /tmp/ba_runs.pkl")
