"""Video-frame iterator of the uni example (reference example/uni/main.jl:
grayscale conversion, [0, 1] floats, fixed fps timestamps)."""
import importlib.util
import os
import sys

import numpy as np


def _load_uni():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "uni.py",
    )
    spec = importlib.util.spec_from_file_location("uni_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_iter_video_frames(tmp_path):
    import imageio.v3 as iio

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (32, 48), dtype=np.uint8)
              for _ in range(4)]
    path = str(tmp_path / "clip.gif")
    iio.imwrite(path, frames)

    uni = _load_uni()
    out = list(uni.iter_video_frames(path))
    assert len(out) == 4
    for f in out:
        assert f.shape == (32, 48)
        assert f.dtype == np.float32
        assert 0.0 <= f.min() and f.max() <= 1.0
