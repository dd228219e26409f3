"""KITTI odometry reader on a synthetic on-disk fixture (calib/times/poses
parsing incl. the stereo extrinsic Ti0 = K1^-1 @ (K T2), kitty.jl:61-62)."""
import os

import numpy as np
import pytest

from slamtpu.datasets.kitti import load_kitti


@pytest.fixture
def kitti_dir(tmp_path):
    seq = tmp_path / "sequences" / "07"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    (tmp_path / "poses").mkdir()

    fx = fy = 718.856
    cx, cy = 607.1928, 185.2157
    baseline_term = -386.1448  # = -fx * baseline (KITTI P1 convention)
    p0 = f"{fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0"
    p1 = f"{fx} 0 {cx} {baseline_term} 0 {fy} {cy} 0 0 0 1 0"
    (seq / "calib.txt").write_text(f"P0: {p0}\nP1: {p1}\n")
    (seq / "times.txt").write_text("0.0\n0.1\n")

    pose0 = "1 0 0 0 0 1 0 0 0 0 1 0"
    pose1 = "1 0 0 1.5 0 1 0 0 0 0 1 0.2"
    (tmp_path / "poses" / "07.txt").write_text(f"{pose0}\n{pose1}\n")

    from PIL import Image
    rng = np.random.default_rng(0)
    for d in ("image_0", "image_1"):
        for i in range(2):
            img = (rng.uniform(size=(376, 1241)) * 255).astype(np.uint8)
            Image.fromarray(img).save(seq / d / f"{i:06d}.png")
    return str(tmp_path)


def test_load_kitti(kitti_dir):
    ds = load_kitti(kitti_dir, "07", stereo=True)
    assert len(ds) == 2
    # Intrinsics layout: fx/fy on the diagonal, principal point in col 2.
    assert np.isclose(ds.K[0, 0], 718.856)
    assert np.isclose(ds.K[0, 2], 607.1928)
    assert np.isclose(ds.K[1, 2], 185.2157)
    # Stereo extrinsic: Ti0 = K1^-1 @ KT2 -> x-translation = -baseline.
    assert np.isclose(ds.Ti0[0, 3], -386.1448 / 718.856, atol=1e-6)
    assert np.allclose(ds.Ti0[:3, :3], np.eye(3), atol=1e-9)
    # Ground truth poses parsed.
    assert np.isclose(ds.poses[1][0, 3], 1.5)
    assert np.isclose(ds.poses[1][2, 3], 0.2)
    # Images load as f32 [0, 1].
    left, right = ds[0]
    assert left.shape == (376, 1241) and left.dtype == np.float32
    assert 0.0 <= left.min() and left.max() <= 1.0
    assert right is not None
    assert np.allclose(ds.ground_truth_positions()[1], [1.5, 0.0, 0.2])
