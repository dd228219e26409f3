"""Track a keyframe's nb_3d_kpts through mapper processing.

Run: python scripts/diag_kf3d.py [n_frames]
"""
import sys

sys.path.insert(0, ".")

import slamtpu.models.mapper as mp_mod

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 14

orig_kf = mp_mod.Mapper.process_keyframe if hasattr(
    mp_mod.Mapper, "process_keyframe") else None

# Find the mapper's per-keyframe entry point generically.
entry = None
for name in ("process_keyframe", "process", "handle_keyframe"):
    if hasattr(mp_mod.Mapper, name):
        entry = name
        break
orig = getattr(mp_mod.Mapper, entry)


def hook(self, *a, **k):
    mm = self.map_manager
    kfid = max(mm.frames_map.keys()) if mm.frames_map else -1
    kf = mm.frames_map.get(kfid)
    before = kf.nb_3d_kpts if kf else -1
    out = orig(self, *a, **k)
    after = kf.nb_3d_kpts if kf else -1
    cur = mm.current_frame.nb_3d_kpts
    print(f"  [map] kf{kfid}: 3d before={before} after={after} "
          f"current_frame 3d={cur}", flush=True)
    return out


setattr(mp_mod.Mapper, entry, hook)
print("hooked Mapper." + entry)

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene

scene = make_scene(n_frames=n_frames, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7)
saver = ReplaySaver()
sm = SlamManager(Params(stereo=True), scene.camera,
                 right_camera=scene.right_camera, slam_io=saver)
for i in range(len(scene)):
    l, r = scene.frame(i)
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
sm.finish()
print("n_keyframes:", len(sm.map_manager.frames_map))
