"""Mono scale-drift diagnosis (VERDICT r5 item 4).

Runs the 60-frame synthetic city scene monocular and decomposes the
scale-aligned ATE into per-step scale drift: for each frame, the ratio of
estimated step length to ground-truth step length. A flat ratio means pure
gauge (alignment absorbs it); a drifting ratio is the shape error the
aligned ATE measures.

Also reports per-keyframe triangulation depth consistency: the median
ratio of triangulated depths to ground-truth depths for new map points
(requires the synthetic scene's exact geometry).

Usage: JAX_PLATFORMS=cpu python scripts/mono_drift.py [n_frames]
"""
import logging
import sys

import numpy as np

sys.path.insert(0, ".")

import os

import jax

# Default CPU (deterministic, no tunnel); MD_TPU=1 runs on the real chip —
# the same backend the bench's mono block measures, and ~10x faster per
# 60-frame run for knob A/Bs (but do NOT run concurrently with a bench:
# single-CPU contention, PERF.md r5).
if not os.environ.get("MD_TPU"):
    jax.config.update("jax_platforms", "cpu")
logging.basicConfig(level=logging.WARNING, format="%(name)s %(message)s")

from slamtpu import Params, ReplaySaver, SlamManager  # noqa: E402
from slamtpu.datasets.synthetic import make_scene  # noqa: E402
from slamtpu.eval.ate import ate_rmse  # noqa: E402


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    scene = make_scene(
        n_frames=n_frames, height=376, width=1241, n_points=6000,
        stereo=True, baseline=0.54, seed=7, layout="city",
    )
    saver = ReplaySaver()
    import os

    params = Params(stereo=False, do_local_bundle_adjustment=True,
                    map_filtering=True)
    if os.environ.get("MD_LOCAL_MATCHING"):
        params.do_local_matching = os.environ["MD_LOCAL_MATCHING"] == "1"
    if os.environ.get("MD_KF3D"):
        params.kf_emergency_3d = int(os.environ["MD_KF3D"])
    if os.environ.get("MD_MIN_TRI_PARALLAX"):
        params.min_triangulation_parallax = float(
            os.environ["MD_MIN_TRI_PARALLAX"]
        )
    print("config: local_matching=%s kf_emergency_3d=%d min_tri_par=%.1f"
          % (params.do_local_matching, params.kf_emergency_3d,
             params.min_triangulation_parallax))
    sm = SlamManager(params, scene.camera, slam_io=saver)
    kf_frames = []
    for i in range(len(scene)):
        left, _ = scene.frame(i)
        n_kf0 = sm.map_manager.nb_keyframes
        sm.add_image(left, float(scene.timestamps[i]))
        if sm.map_manager.nb_keyframes > n_kf0:
            kf_frames.append(i)
    sm.finish()
    sm.wait()
    print("KF landed at feed frames:", kf_frames)

    est = saver.trajectory_xyz().astype(np.float64)
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])[: est.shape[0]]

    steps_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
    steps_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1)
    ratio = steps_est / np.maximum(steps_gt, 1e-12)
    print("per-step scale ratio (est/gt):")
    for k in range(0, len(ratio), 5):
        blk = ratio[k:k + 5]
        print(f"  frames {k:3d}-{k + len(blk) - 1:3d}: "
              + " ".join(f"{r:6.3f}" for r in blk))
    print(f"ratio first5={ratio[:5].mean():.3f} last5={ratio[-5:].mean():.3f}"
          f" (drift x{ratio[-5:].mean() / max(ratio[:5].mean(), 1e-12):.2f})")

    # Correlate spikes with the pose source per frame (front_end.pose_trace:
    # fid, source, n_p3p_candidates, n_inliers, n_pnp_outliers). Steps are
    # est[k]→est[k+1] so a bad pose at frame k spikes ratio[k-1] and
    # ratio[k].
    trace = {fid: rest for fid, *rest in sm.front_end.pose_trace}
    med = np.median(ratio[np.isfinite(ratio)])
    spikes = [k for k, r in enumerate(ratio) if r > 2.5 * med]
    print(f"median ratio {med:.3f}; spike steps (>2.5x median): {spikes}")

    # Per-frame aligned position error + PnP residual: separates "pose
    # noisy at this frame" from "scale drifted here".
    from slamtpu.eval.ate import umeyama_alignment

    s_al, R_al, t_al = umeyama_alignment(est, gt, with_scale=True)
    est_al = (s_al * (R_al @ est.T)).T + t_al
    perr = np.linalg.norm(est_al - gt, axis=1)
    print("per-frame aligned position error / PnP final residual:")
    for k in range(len(perr)):
        if k in trace:
            src, n_cand, n_inl, n_out, e0, e1 = trace[k]
            flag = " <SPIKE" if (k in spikes or k - 1 in spikes) else ""
            print(f"  f{k:3d} err={perr[k]:7.4f} cand={n_cand:4d} "
                  f"inl={n_inl:4d} out={n_out:3d} pnp_res={e1:9.3f} "
                  f"(init {e0:9.3f}){flag}")

    # Per-anchor-KF local map scale: similarity-align the trajectory, map
    # the 3D points through it, associate each to the nearest GT scene
    # point, and compare KF-centered ranges (est/gt). A per-KF median
    # climbing with kfid is the triangulation-depth bias driving the
    # gradual drift; a flat one exonerates triangulation.
    try:
        from scipy.spatial import cKDTree

        gt_pts = np.asarray(scene.points, np.float64)
        tree = cKDTree(gt_pts)
        mm2 = sm.map_manager
        kf_pos_est = {}
        for kfid, kf in mm2.frames_map.items():
            kf_pos_est[kfid] = (s_al * (R_al @ kf.wc[:3, 3])) + t_al
        by_kf = {}
        for mp in mm2.map_points.values():
            if not mp.is_3d or mp.kfid not in kf_pos_est:
                continue
            p_al = (s_al * (R_al @ np.asarray(mp.position))) + t_al
            d, j = tree.query(p_al)
            c = kf_pos_est[mp.kfid]
            r_est = np.linalg.norm(p_al - c)
            r_gt = np.linalg.norm(gt_pts[j] - c)
            if r_gt > 1e-6:
                by_kf.setdefault(mp.kfid, []).append(
                    (r_est / r_gt, d)
                )
        print("per-anchor-KF map scale (aligned est range / gt range), "
              "NN dist:")
        for kfid in sorted(by_kf):
            rr = np.array([v[0] for v in by_kf[kfid]])
            dd = np.array([v[1] for v in by_kf[kfid]])
            print(f"  kf {kfid:3d}: n={len(rr):4d} scale_med="
                  f"{np.median(rr):.4f} p10={np.percentile(rr, 10):.4f} "
                  f"p90={np.percentile(rr, 90):.4f} "
                  f"nn_med={np.median(dd):.4f}")
    except Exception as e:  # pragma: no cover - diagnostic only
        print("per-KF scale audit skipped:", e)

    n_src = {}
    for fid, (src, *_rest) in trace.items():
        n_src[src] = n_src.get(src, 0) + 1
    print("pose sources:", n_src)

    ate_aligned = ate_rmse(est, gt, align_scale=True)
    ate_raw = ate_rmse(est, gt, align_scale=False)
    print(f"ATE aligned={ate_aligned:.4f} raw={ate_raw:.4f} "
          f"KFs={sm.map_manager.nb_keyframes}")

    # Triangulated depth consistency: compare map-point positions against
    # the nearest ground-truth scene point (exact association is unknown,
    # so report the distribution of distances in GT units after applying
    # the global alignment scale).
    mm = sm.map_manager
    pts = np.array([mp.position for mp in mm.map_points.values()
                    if mp.is_3d], np.float64)
    if len(pts):
        from scipy.spatial import cKDTree  # noqa: F401

    print(f"n3d={sum(1 for mp in mm.map_points.values() if mp.is_3d)}")


if __name__ == "__main__":
    main()
