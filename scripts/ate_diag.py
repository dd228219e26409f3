"""Accuracy diagnostic: run the bench scene end-to-end (any backend) and
break the ATE down — per-frame translation error before/after Umeyama
alignment, keyframe indices, scale drift, and the final map size.

Usage:  JAX_PLATFORMS=cpu python scripts/ate_diag.py [n_frames]
Env knobs mirror bench.py (BENCH_ASYNC_KF, BENCH_DEPTH, ...).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pre-imports jax, so the env var alone is too late.
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    os.environ.setdefault("BENCH_FRAMES", str(n_frames))

    from slamtpu import Params
    from slamtpu.eval.ate import ate_rmse
    from slamtpu.io.saver import ReplaySaver
    from slamtpu.models.slam_manager import SlamManager
    from slamtpu.datasets.synthetic import make_scene

    scene = make_scene(
        n_frames=n_frames, height=376, width=1241, n_points=6000,
        stereo=True, baseline=0.54, seed=7,
        layout=os.environ.get("BENCH_LAYOUT", "city"),
    )
    frames = [scene.frame(i) for i in range(len(scene))]
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])

    params = Params(stereo=True, do_local_bundle_adjustment=True,
                    map_filtering=True, sequential=True)
    if os.environ.get("BENCH_ASYNC_KF"):
        params.async_keyframe = os.environ["BENCH_ASYNC_KF"] == "1"
    if os.environ.get("BENCH_DEPTH"):
        params.pipeline_depth = int(os.environ["BENCH_DEPTH"])
    if os.environ.get("BENCH_PIPELINED"):
        params.pipelined = os.environ["BENCH_PIPELINED"] == "1"
    if os.environ.get("BENCH_LK_ITERS"):
        params.lk_iterations = int(os.environ["BENCH_LK_ITERS"])
    if os.environ.get("BENCH_HYP"):
        params.ransac_essential_hypotheses = int(os.environ["BENCH_HYP"])
        params.ransac_pnp_hypotheses = int(os.environ["BENCH_HYP"])
    if os.environ.get("BENCH_BA_ITERS2"):
        params.ba_phase2_iterations = int(os.environ["BENCH_BA_ITERS2"])
    if os.environ.get("BENCH_STEREO_1D"):
        params.stereo_klt_1d = os.environ["BENCH_STEREO_1D"] == "1"
    saver = ReplaySaver()
    sm = SlamManager(params, scene.camera, right_camera=scene.right_camera,
                     slam_io=saver)
    kf_at = []
    for i, (left, right) in enumerate(frames):
        n_kf0 = sm.map_manager.nb_keyframes
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
        if sm.map_manager.nb_keyframes > n_kf0:
            kf_at.append(i)
    sm.wait()

    est = saver.trajectory_xyz().astype(np.float64)
    assert len(est) == len(gt), (len(est), len(gt))

    # Raw (unaligned) per-frame error: est frame 0 == gt frame 0 by
    # construction, so raw error ~ drift accumulation.
    raw_err = np.linalg.norm(est - gt, axis=1)

    ate = ate_rmse(est, gt, align_scale=False)
    ate_s = ate_rmse(est, gt, align_scale=True)

    # Path-length based scale estimate: est/gt cumulative path ratio.
    def pathlen(p):
        return float(np.linalg.norm(np.diff(p, axis=0), axis=1).sum())

    out = {
        "frames": len(est),
        "ate_rmse_m": round(float(ate), 4),
        "ate_rmse_scale_aligned_m": round(float(ate_s), 4),
        "scale_est_over_gt": round(pathlen(est) / max(pathlen(gt), 1e-9), 4),
        "raw_err_final_m": round(float(raw_err[-1]), 4),
        "raw_err_max_m": round(float(raw_err.max()), 4),
        "n_keyframes": sm.map_manager.nb_keyframes,
        "kf_at": kf_at,
        "n_map_points_3d": int(sm.map_manager.nb_map_points_3d)
        if hasattr(sm.map_manager, "nb_map_points_3d") else -1,
    }
    print(json.dumps(out))
    print("raw per-frame err (m):",
          " ".join(f"{e:.3f}" for e in raw_err), file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
