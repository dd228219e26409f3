"""Workload-config coverage (BASELINE.json configs): deep pyramid,
keypoint budgets at/above device capacity, wide BA window."""
import numpy as np
import pytest

from slamtpu import Params
from slamtpu.datasets.synthetic import make_scene
from slamtpu.models.slam_manager import SlamManager


@pytest.mark.slow
def test_high_density_deep_pyramid():
    """2000-keypoint budget, 4-level pyramid, 30-KF BA window (scaled-down
    image for CPU). Exercises the capacity-overflow path: per-cell ceil
    budgets can over-detect past max_nb_keypoints."""
    scene = make_scene(
        n_frames=8, height=192, width=256, n_points=2500, stereo=True,
        baseline=0.5, seed=3, sigma_range=(1.5, 5.0),
    )
    params = Params(
        stereo=True,
        max_nb_keypoints=600,
        keypoint_capacity=512,   # BELOW the budget: must clamp, not crash
        max_distance=16,
        pyramid_levels=4,
        ba_window=30,
        initial_parallax=8.0,
        sequential=True,
    )
    sm = SlamManager(params, scene.camera, right_camera=scene.right_camera)
    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.finish()
    assert sm.map_manager.nb_keyframes >= 2
    n_3d = sum(1 for mp in sm.map_manager.map_points.values() if mp.is_3d)
    assert n_3d > 30


def test_extraction_respects_budget():
    """Detections are capped at the global budget (extractor.jl:76 per-cell
    ceil rounding would otherwise overshoot)."""
    scene = make_scene(n_frames=1, height=192, width=256, n_points=2500,
                       seed=3)
    params = Params(max_nb_keypoints=100, keypoint_capacity=256,
                    max_distance=16)
    sm = SlamManager(params, scene.camera)
    sm.add_image(scene.frame(0)[0], 0.0)
    assert sm.current_frame.nb_keypoints <= 100


def test_f32_matmul_precision_default():
    """Constructing a SlamManager must pin jax_default_matmul_precision to
    f32 (utils/jaxcache.py). The backend's default bf16 matmul passes add
    ~1 px reprojection noise against the 3 px outlier gate, double the
    keyframe cadence, and regress ATE (PERF.md round 4) — this guards the
    production numeric configuration against accidental rollback."""
    import jax

    from slamtpu import Camera, Params, SlamManager

    SlamManager(Params(), Camera(100.0, 100.0, 32.0, 32.0, 64, 64))
    assert jax.config.jax_default_matmul_precision == "float32"
