"""Capture real frontend_step inputs from a live run for offline ablation.

Writes /tmp/fused_args.npz at a steady tracked frame.
Run: python scripts/capture_fused_args.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax

import slamtpu.ops.frontend_step as fs_mod

orig = fs_mod.frontend_step
captured = {}


def wrapper(pyr_prev, pyr_cur, *args, **kwargs):
    if "args" not in captured and len(captured.get("count", [])) == []:
        pass
    captured.setdefault("n", 0)
    captured["n"] += 1
    if captured["n"] == 6:  # a steady tracked frame
        captured["pyr_prev"] = jax.device_get(pyr_prev)
        captured["pyr_cur"] = jax.device_get(pyr_cur)
        captured["args"] = jax.device_get(args)
        captured["kwargs"] = kwargs
    return orig(pyr_prev, pyr_cur, *args, **kwargs)


fs_mod.frontend_step = wrapper
import slamtpu.models.front_end as fe_mod

fe_mod_frontend = fe_mod  # front_end imports inside the function; patching
# the module attribute above is enough because _dispatch_fused does
# `from ..ops.frontend_step import frontend_step` at call time.

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene

scene = make_scene(n_frames=10, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7)
saver = ReplaySaver()
sm = SlamManager(Params(stereo=True), scene.camera,
                 right_camera=scene.right_camera, slam_io=saver)
for i in range(len(scene)):
    l, r = scene.frame(i)
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
sm.finish()

import pickle

with open("/tmp/fused_args.pkl", "wb") as f:
    pickle.dump(
        {
            "pyr_prev": captured["pyr_prev"],
            "pyr_cur": captured["pyr_cur"],
            "args": captured["args"],
            "kwargs": captured["kwargs"],
        },
        f,
    )
print("captured frontend_step call #6 ->", "/tmp/fused_args.pkl")
