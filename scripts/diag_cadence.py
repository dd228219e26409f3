"""Dump every keyframe-decision input over a bench-scale run to JSON.

Diffing the CPU- and TPU-backend dumps locates the 21-vs-9 keyframe
cadence gap (VERDICT r3 missing #3): same program, different backend.

Usage:
    DIAG_CPU=1 python scripts/diag_cadence.py /tmp/cad_cpu.json
    python scripts/diag_cadence.py /tmp/cad_tpu.json       # TPU/tunnel
Env: BENCH_LAYOUT (default city), DIAG_FRAMES (default 60).
NOTE: JAX_PLATFORMS is pinned to `axon` by the environment's sitecustomize;
only jax.config.update("jax_platforms", ...) actually switches backends.
"""
import json
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("DIAG_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("DIAG_MM_PRECISION"):  # e.g. "float32", "tensorfloat32"
    import jax
    prec = os.environ["DIAG_MM_PRECISION"]
    jax.config.update("jax_default_matmul_precision", prec)
    # SlamManager.__init__ -> enable_compilation_cache() re-applies the
    # SLAMTPU_MM_PRECISION default (float32) on top of whatever we set
    # here; forward the knob so the A/B actually measures `prec`.
    # jaxcache spells bf16-passes-allowed as "default".
    os.environ["SLAMTPU_MM_PRECISION"] = (
        "default" if prec in ("bfloat16", "default") else prec
    )

import numpy as np

import slamtpu.models.front_end as fe_mod

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cadence.json"
n_frames = int(os.environ.get("DIAG_FRAMES", "60"))

orig = fe_mod.FrontEnd.check_new_kf_required
rows = []


def hook(self, median_parallax=None):
    frame = self.current_frame
    p = self.params
    prev_kf = self.map_manager.frames_map.get(frame.kfid)
    out = orig(self, median_parallax)
    if prev_kf is not None:
        par = median_parallax
        if par is None:
            par = self.compute_parallax(
                prev_kf.kfid, compensate_rotation=True, only_2d=False)
        rows.append({
            "fid": frame.id, "kfid": frame.kfid, "decision": bool(out),
            "par": round(float(par), 3),
            "nb_3d": frame.nb_3d_kpts, "prev_3d": prev_kf.nb_3d_kpts,
            "nb_occ": frame.nb_occupied_cells,
            "nb_kpts": frame.nb_keypoints,
            "delta": frame.id - prev_kf.id,
            "ba_on": bool(p.local_ba_on),
            "c0": bool(par >= p.initial_parallax),
            "c1": bool(frame.nb_3d_kpts < 0.75 * prev_kf.nb_3d_kpts),
            "c2": bool(frame.nb_occupied_cells < 0.5 * p.max_nb_keypoints
                       and frame.nb_3d_kpts < 0.85 * prev_kf.nb_3d_kpts
                       and not p.local_ba_on),
            "cx": bool(par >= p.initial_parallax / 2.0
                       or (p.stereo and p.kf_parallax_bypass_stereo)),
        })
    return out


fe_mod.FrontEnd.check_new_kf_required = hook

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene
from slamtpu.eval.ate import ate_rmse

layout = os.environ.get("BENCH_LAYOUT", "city")
scene = make_scene(n_frames=n_frames, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7, layout=layout)
saver = ReplaySaver()
params = Params(stereo=True, do_local_bundle_adjustment=True,
                map_filtering=True, sequential=True)
sm = SlamManager(params, scene.camera, right_camera=scene.right_camera,
                 slam_io=saver)
for i in range(len(scene)):
    l, r = scene.frame(i)
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
sm.wait()

gt = np.stack([p[:3, 3] for p in scene.poses_wc])
ate = None
if len(saver.trajectory_xyz()) == len(gt):
    ate = round(ate_rmse(saver.trajectory_xyz().astype(np.float64), gt,
                         align_scale=False), 4)
import jax
result = {
    "backend": jax.default_backend(),
    "layout": layout,
    "n_keyframes": sm.map_manager.nb_keyframes,
    "kf_fids": [r["fid"] for r in rows if r["decision"]],
    "ate": ate,
    "rows": rows,
}
with open(out_path, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({k: v for k, v in result.items() if k != "rows"}))
