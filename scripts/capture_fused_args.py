"""Capture real frontend_step inputs from a live run for offline ablation.

Writes /tmp/fused_args.npz at a steady tracked frame.
Run: python scripts/capture_fused_args.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax

import slamtpu.ops.frontend_step as fs_mod

# v2 path: wrap the OUTER jitted entry (frontend_step_v2) — the inner
# frontend_step now runs under jit where device_get on tracers would fail.
orig = fs_mod.frontend_step_v2
captured = {}


def wrapper(image, pyr_prev, *args, **kwargs):
    captured.setdefault("n", 0)
    captured["n"] += 1
    out = orig(image, pyr_prev, *args, **kwargs)
    if captured["n"] == 6:  # a steady tracked frame
        captured["image"] = jax.device_get(image)
        captured["pyr_prev"] = jax.device_get(pyr_prev)
        captured["args"] = jax.device_get(args)
        captured["kwargs"] = kwargs
    return out


fs_mod.frontend_step_v2 = wrapper
import slamtpu.models.front_end as fe_mod

fe_mod_frontend = fe_mod  # front_end imports inside the function; patching
# the module attribute above is enough because _dispatch_fused does
# `from ..ops.frontend_step import frontend_step_v2` at call time.

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

with open("/tmp/fused_args_v2.pkl", "wb") as f:
    pickle.dump(
        {
            "image": captured["image"],
            "pyr_prev": captured["pyr_prev"],
            "args": captured["args"],
            "kwargs": captured["kwargs"],
        },
        f,
    )
print("captured frontend_step_v2 call #6 ->", "/tmp/fused_args_v2.pkl")
