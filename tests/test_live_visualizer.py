"""Live visualizer: renders during a run, assembles a replayable GIF."""
import os

import numpy as np

from slamtpu import Params, ReplaySaver, SlamManager
from slamtpu.datasets.synthetic import make_scene
from slamtpu.io.live_visualizer import LiveVisualizer


def test_live_visualizer_renders(tmp_path):
    scene = make_scene(n_frames=6, height=120, width=160, n_points=400,
                       stereo=True, baseline=0.3, seed=3)
    sm = SlamManager(
        Params(stereo=True, max_nb_keypoints=150, max_distance=16,
               keypoint_capacity=256),
        scene.camera, right_camera=scene.right_camera,
        slam_io=ReplaySaver(),
    )
    viz = LiveVisualizer(out_dir=str(tmp_path / "viz"), every=2)
    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
        viz.update(sm, left)
    assert os.path.exists(tmp_path / "viz" / "live.png")
    assert len(viz._frame_paths) >= 2
    gif = viz.finish(gif=True)
    assert gif is not None and os.path.exists(gif)
