import os

import numpy as np

from slamtpu.io.saver import ReplaySaver
from slamtpu.io.visualizer import plot_trajectory, replay


def _make_saver(n=20):
    s = ReplaySaver()
    for i in range(n):
        wc = np.eye(4)
        wc[:3, 3] = [0.1 * i, 0.0, 0.02 * i]
        s.set_frame_wc(i + 1, wc)
    return s


def test_plot_trajectory(tmp_path):
    s = _make_saver()
    gt = s.trajectory_xyz() + 0.05
    out = plot_trajectory(
        s, gt=gt, map_points=np.random.default_rng(0).normal(size=(100, 3)),
        out_path=str(tmp_path / "traj.png"),
    )
    assert os.path.isfile(out)
    assert os.path.getsize(out) > 1000


def test_replay(tmp_path):
    s = _make_saver()
    s.save(str(tmp_path))
    out = replay(str(tmp_path), out_path=str(tmp_path / "replay.png"))
    assert os.path.isfile(out)
