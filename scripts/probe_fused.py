"""Per-frame wall-time probe for the v2 fused front end.

Runs a short synthetic stereo sequence and prints each frame's wall time
plus the accumulated stage timers (fe.fused.assemble / dispatch / fetch,
mapper/estimator stages). Run: python scripts/probe_fused.py [n_frames]
"""
import sys
import time

sys.path.insert(0, ".")

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene
from slamtpu.utils.profiling import TIMERS

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 14

scene = make_scene(n_frames=n_frames, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7)
saver = ReplaySaver()
sm = SlamManager(Params(stereo=True), scene.camera,
                 right_camera=scene.right_camera, slam_io=saver)
t_start = time.perf_counter()
for i in range(len(scene)):
    l, r = scene.frame(i)
    f0 = time.perf_counter()
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
    print(f"frame {i}: {1e3 * (time.perf_counter() - f0):7.1f} ms",
          flush=True)
sm.finish()
print(f"total {time.perf_counter() - t_start:.2f} s")
print("stage timers:", TIMERS.summary())
