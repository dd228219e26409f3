"""Per-frame diagnostic run: pose error vs GT, tracked counts, P3P/BA
internals — to locate where a trajectory run leaves the good basin.

Usage: python scripts/diag_run.py [n_frames]
Env: DIAG_CPU=1 to force the CPU backend.
"""
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("DIAG_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import slamtpu.models.front_end as fe_mod
import slamtpu.models.estimator as es_mod

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10

# --- instrument the fused apply: log P3P/PnP internals ---------------------
orig_apply = fe_mod.FrontEnd._apply_fused
frame_stats = {}


def apply_hook(self, res, ids, attempted, has_mp, frame, prev_kf,
               time, slam_io=None):
    per_kp, scalars = res
    frame_stats[frame.id] = {
        "n_ok": int((per_kp[:, 7] > 0).sum()),
        "n_p3p": int(scalars[43]),
        "p3p_n_inliers": int(scalars[44]),
        "ess_n_inliers": int(scalars[42]),
        "pnp_err0": float(scalars[45]),
        "pnp_err1": float(scalars[46]),
        "pnp_n_out": int(scalars[47]),
        "med_par": float(scalars[38]),
    }
    return orig_apply(self, res, ids, attempted, has_mp, frame,
                      prev_kf, time, slam_io)


fe_mod.FrontEnd._apply_fused = apply_hook

# --- instrument BA ----------------------------------------------------------
orig_ba = es_mod.Estimator.local_bundle_adjustment
ba_log = []


def ba_hook(self, new_frame):
    out = orig_ba(self, new_frame)
    ba_log.append(new_frame.kfid)
    return out


es_mod.Estimator.local_bundle_adjustment = ba_hook

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene
from slamtpu.eval.ate import ate_rmse
import slamtpu.hostmath as hm

scene = make_scene(n_frames=n_frames, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7)
saver = ReplaySaver()
sm = SlamManager(Params(stereo=True), scene.camera,
                 right_camera=scene.right_camera, slam_io=saver)
gt = np.stack([p[:3, 3] for p in scene.poses_wc])

for i in range(len(scene)):
    l, r = scene.frame(i)
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
    # Current frame pose error right now (before later BA corrections).
    wc = sm.current_frame.wc
    err = np.linalg.norm(wc[:3, 3] - gt[i])
    st = frame_stats.get(i, {})
    print(
        f"f{i:02d} err={err:7.4f} kf={sm.current_frame.kfid} " +
        " ".join(f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                 for k, v in st.items()),
        flush=True,
    )
sm.finish()

est = saver.trajectory_xyz().astype(np.float64)
ate = ate_rmse(est, gt[: len(est)], align_scale=False)
per_frame = np.linalg.norm(est - gt[: len(est)], axis=1)
print("per-frame |est-gt| (post-BA):",
      np.array2string(per_frame, precision=4))
print(f"ATE {ate:.4f} m   n_ba_runs={len(ba_log)}")
