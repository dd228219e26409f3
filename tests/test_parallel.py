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


def test_frontend_mesh_step_matches_unsharded():
    """The PRODUCTION fused frontend program sharded over ("data", "model")
    must reproduce the single-device result (VERDICT round 2 item 6)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from slamtpu.parallel.multi import (
        frontend_mesh_step, make_frontend_inputs, make_mesh,
    )

    batch, n_points, height, width = 4, 64, 48, 64  # data=4, model=2
    args = make_frontend_inputs(batch, n_points, height, width, seed=3)

    mesh = make_mesh(8)
    sharded = frontend_mesh_step(mesh)
    out_s = jax.device_get(sharded(*[jnp.asarray(a) for a in args]))

    # Unsharded reference: same program on a 1x1 mesh (device 0).
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                 ("data", "model"))
    single = frontend_mesh_step(mesh1)
    out_1 = jax.device_get(single(*[jnp.asarray(a) for a in args]))

    new_px_s, ok_s = out_s[0], out_s[1]
    new_px_1, ok_1 = out_1[0], out_1[1]
    assert np.array_equal(ok_s, ok_1)
    np.testing.assert_allclose(new_px_s[ok_s], new_px_1[ok_1],
                               rtol=0, atol=1e-3)
    # Pose paths agree (reduction reorder can move f32 bits, not answers).
    np.testing.assert_allclose(out_s[4], out_1[4], atol=1e-2)  # pnp_theta
    assert np.array_equal(out_s[6], out_1[6])  # p3p inlier counts


def test_graft_entry_single():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import importlib
    mod = importlib.import_module("__graft_entry__")
    fn, args = mod.entry()
    per_kp, scalars, kp_next, misc_next = jax.jit(fn)(*args)
    kp_in = args[1]
    n = int((kp_in[:, 9] > 0).sum())  # FL_VALID rows
    ok = np.asarray(per_kp)[:n, 7] > 0
    # Identical image pair: points should track to themselves.
    assert ok.mean() > 0.5
    moved = np.linalg.norm(
        np.asarray(per_kp)[:n, 0:2][ok] - kp_in[:n, 0:2][ok], axis=-1
    )
    assert np.median(moved) < 0.5
    assert np.isfinite(np.asarray(scalars)).all()
    assert np.isfinite(np.asarray(misc_next)).all()
