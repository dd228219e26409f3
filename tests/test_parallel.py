"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip():
    from slamtpu.parallel.multi import dryrun

    info = dryrun(8)
    assert info["mesh"] == {"data": 4, "model": 2}
    assert info["tracked"] > 0
    assert all(np.isfinite(c) for c in info["cost"])


def test_graft_entry_single():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import importlib
    mod = importlib.import_module("__graft_entry__")
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    new_points, ok = out
    assert new_points.shape == args[2].shape
    # Identical images: points should track to themselves.
    ok = np.asarray(ok)
    assert ok.mean() > 0.5
    moved = np.linalg.norm(np.asarray(new_points)[ok] - args[2][ok], axis=-1)
    assert np.median(moved) < 0.5
