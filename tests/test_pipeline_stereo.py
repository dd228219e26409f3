"""End-to-end stereo pipeline on a synthetic rendered scene.

Stereo matching fixes the scale (no mono gauge freedom), so the trajectory
is compared against ground truth WITHOUT scale alignment.
"""
import numpy as np
import pytest

from slamtpu import Params
from slamtpu.datasets.synthetic import make_scene
from slamtpu.eval.ate import ate_rmse
from slamtpu.io.saver import ReplaySaver
from slamtpu.models.slam_manager import SlamManager


@pytest.mark.slow
def test_stereo_pipeline_metric_scale():
    scene = make_scene(
        n_frames=10, height=160, width=224, n_points=900, stereo=True,
        baseline=0.5, seed=9,
    )
    params = Params(
        stereo=True,
        max_nb_keypoints=400,
        max_distance=24,
        keypoint_capacity=512,
        initial_parallax=8.0,
        do_local_bundle_adjustment=True,
        sequential=True,
    )
    saver = ReplaySaver()
    sm = SlamManager(
        params, scene.camera, right_camera=scene.right_camera, slam_io=saver
    )

    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()  # drain the tracking pipeline + deferred BA

    assert not params.reset_required
    assert sm.map_manager.nb_keyframes >= 2
    n_3d = sum(1 for mp in sm.map_manager.map_points.values() if mp.is_3d)
    assert n_3d > 50

    est = saver.trajectory_xyz()
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])
    assert len(est) == len(gt)
    # Metric ATE (no scale alignment) — stereo pins the scale.
    err = ate_rmse(est.astype(np.float64), gt, align_scale=False)
    total = np.linalg.norm(gt[-1] - gt[0])
    assert err < 0.15 * total


@pytest.mark.slow
def test_stereo_pipeline_1d_klt():
    """Same e2e scene with the disparity-only stereo matcher
    (Params.stereo_klt_1d): metric accuracy within the same bound and a
    comparable 3D map size."""
    scene = make_scene(
        n_frames=10, height=160, width=224, n_points=900, stereo=True,
        baseline=0.5, seed=9,
    )
    params = Params(
        stereo=True,
        max_nb_keypoints=400,
        max_distance=24,
        keypoint_capacity=512,
        initial_parallax=8.0,
        do_local_bundle_adjustment=True,
        sequential=True,
        stereo_klt_1d=True,
    )
    saver = ReplaySaver()
    sm = SlamManager(
        params, scene.camera, right_camera=scene.right_camera, slam_io=saver
    )

    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()

    assert not params.reset_required
    assert sm.map_manager.nb_keyframes >= 2
    n_3d = sum(1 for mp in sm.map_manager.map_points.values() if mp.is_3d)
    assert n_3d > 50

    est = saver.trajectory_xyz()
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])
    err = ate_rmse(est.astype(np.float64), gt, align_scale=False)
    total = np.linalg.norm(gt[-1] - gt[0])
    assert err < 0.15 * total


@pytest.mark.slow
def test_stereo_pipeline_city_layout():
    """End-to-end on the surface-based 'city' layout (ground plane + far
    wall + mid facades) — the KITTI-realism scene the bench uses: feature
    churn comes only from facade-edge occlusions, not blob crossings."""
    scene = make_scene(
        n_frames=10, height=160, width=224, n_points=1200, stereo=True,
        baseline=0.5, seed=4, layout="city",
    )
    params = Params(
        stereo=True,
        max_nb_keypoints=400,
        max_distance=24,
        keypoint_capacity=512,
        initial_parallax=8.0,
        do_local_bundle_adjustment=True,
        sequential=True,
    )
    saver = ReplaySaver()
    sm = SlamManager(
        params, scene.camera, right_camera=scene.right_camera, slam_io=saver
    )
    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()

    assert not params.reset_required
    assert sm.map_manager.nb_keyframes >= 2
    est = saver.trajectory_xyz()
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])
    err = ate_rmse(est.astype(np.float64), gt, align_scale=False)
    total = np.linalg.norm(gt[-1] - gt[0])
    assert err < 0.15 * total


@pytest.mark.slow
def test_stereo_pipeline_subpixel_detect():
    """End-to-end with subpixel corner refinement on: the pipeline runs and
    metric ATE stays at least as good as the quantized-detection bound."""
    scene = make_scene(
        n_frames=10, height=160, width=224, n_points=900, stereo=True,
        baseline=0.5, seed=9,
    )
    params = Params(
        stereo=True,
        max_nb_keypoints=400,
        max_distance=24,
        keypoint_capacity=512,
        initial_parallax=8.0,
        do_local_bundle_adjustment=True,
        sequential=True,
        subpixel_detect=True,
    )
    saver = ReplaySaver()
    sm = SlamManager(
        params, scene.camera, right_camera=scene.right_camera, slam_io=saver
    )
    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()

    assert not params.reset_required
    assert sm.map_manager.nb_keyframes >= 2
    est = saver.trajectory_xyz()
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])
    err = ate_rmse(est.astype(np.float64), gt, align_scale=False)
    total = np.linalg.norm(gt[-1] - gt[0])
    assert err < 0.15 * total
