"""Log every keyframe decision's inputs over a short run.

Run: python scripts/diag_kf.py [n_frames]
"""
import sys

sys.path.insert(0, ".")

import numpy as np

import slamtpu.models.front_end as fe_mod

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20

orig = fe_mod.FrontEnd.check_new_kf_required


def hook(self, median_parallax=None):
    frame = self.current_frame
    p = self.params
    prev_kf = self.map_manager.frames_map.get(frame.kfid)
    out = orig(self, median_parallax)
    if prev_kf is not None:
        c1 = frame.nb_3d_kpts < 0.75 * prev_kf.nb_3d_kpts
        print(
            f"  [kf?] f{frame.id} kf{frame.kfid} -> {out} "
            f"par={median_parallax if median_parallax is not None else -1:.1f} "
            f"3d={frame.nb_3d_kpts} prev3d={prev_kf.nb_3d_kpts} "
            f"occ={frame.nb_occupied_cells} c1={c1} "
            f"ba_on={p.local_ba_on}",
            flush=True,
        )
    return out


fe_mod.FrontEnd.check_new_kf_required = hook

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
