"""Split Extractor.detect's ex.fetch into: input-ready wait, program
execution, and the device_get RPC — to find where the 1.9 s goes.

Run: python scripts/probe_extract_fetch.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from slamtpu.models import extractor as extractor_mod
from slamtpu.ops.features import detect_keypoints

orig_detect = extractor_mod.Extractor.detect


def probed_detect(self, image_dev, current_points):
    if len(current_points) >= self.max_points:
        return []
    t0 = time.perf_counter()
    jax.block_until_ready(image_dev)
    t1 = time.perf_counter()
    occ, val = self._pad_points(current_points)
    jax.block_until_ready((occ, val))
    t2 = time.perf_counter()
    vals, ys, xs = detect_keypoints(
        image_dev, occ, val,
        cell_size=self.cell_size, radius=self.radius,
        min_response=self.min_response,
    )
    t3 = time.perf_counter()
    jax.block_until_ready((vals, ys, xs))
    t4 = time.perf_counter()
    vals, ys, xs = jax.device_get((vals, ys, xs))
    t5 = time.perf_counter()
    print(
        f"[probe] input_wait={1e3*(t1-t0):8.1f}  pad={1e3*(t2-t1):6.1f}  "
        f"dispatch={1e3*(t3-t2):6.1f}  exec={1e3*(t4-t3):8.1f}  "
        f"get={1e3*(t5-t4):6.1f} ms",
        flush=True,
    )
    import math
    n_cells = self.grid_resolution[0] * self.grid_resolution[1]
    n_detect = self.max_points - len(current_points)
    n_cell_detect = math.ceil(n_detect / n_cells)
    out = []
    k = min(n_cell_detect, vals.shape[1])
    for c in range(vals.shape[0]):
        for j in range(k):
            if vals[c, j] <= self.min_response:
                break
            out.append((int(ys[c, j]), int(xs[c, j])))
    return out


extractor_mod.Extractor.detect = probed_detect

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene

scene = make_scene(n_frames=12, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7)
saver = ReplaySaver()
sm = SlamManager(Params(stereo=True), scene.camera,
                 right_camera=scene.right_camera, slam_io=saver)
t_start = time.perf_counter()
for i in range(len(scene)):
    l, r = scene.frame(i)
    f0 = time.perf_counter()
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
    print(f"frame {i}: {1e3*(time.perf_counter()-f0):7.1f} ms", flush=True)
sm.finish()
print(f"total {time.perf_counter()-t_start:.2f} s")
