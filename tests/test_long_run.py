"""Long-run trajectory regression guard.

The unit and short e2e tests are insensitive to slow drift regressions
(seen with matmul-precision changes and the fused stereo step); this test
bounds metric ATE over a 40-frame stereo sequence.
"""
import numpy as np
import pytest

from slamtpu import Params
from slamtpu.datasets.synthetic import make_scene
from slamtpu.eval.ate import ate_rmse
from slamtpu.io.saver import ReplaySaver
from slamtpu.models.slam_manager import SlamManager


@pytest.mark.slow
def test_long_run_drift_bound():
    scene = make_scene(
        n_frames=40, height=192, width=256, n_points=1500, stereo=True,
        baseline=0.5, seed=17,
    )
    params = Params(
        stereo=True, max_nb_keypoints=400, max_distance=24,
        keypoint_capacity=512, initial_parallax=8.0,
        do_local_bundle_adjustment=True, map_filtering=True,
        sequential=True,
    )
    saver = ReplaySaver()
    sm = SlamManager(params, scene.camera, right_camera=scene.right_camera,
                     slam_io=saver)
    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()

    est = saver.trajectory_xyz()
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])
    assert len(est) == len(gt)
    err = ate_rmse(est.astype(np.float64), gt, align_scale=False)
    span = np.linalg.norm(gt[-1] - gt[0])
    # Healthy runs measure ~2%; the regressions this guards against hit
    # 15-35%+.
    assert err < 0.08 * span, f"metric ATE {err:.3f} m over {span:.2f} m"
