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


def test_ba_mesh_step_matches_unsharded():
    """The PRODUCTION Schur-complement local BA with the observation axis
    sharded across all 8 virtual devices solves the problem exactly as well
    as the single-device run. Parameters are NOT compared bitwise: f32
    reduction reorder flips near-equal LM damping decisions, so the two
    runs take different (equally valid) LM paths — the test pins identical
    outlier sets and equal recovery of the known ground truth."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from slamtpu.parallel.multi import ba_mesh_step, make_ba_inputs, make_mesh

    args, gt_poses, gt_points = make_ba_inputs(
        n_poses=6, n_points=64, n_obs=320, seed=2
    )

    mesh = make_mesh(8)
    out_s = jax.device_get(ba_mesh_step(mesh)(*[jnp.asarray(a) for a in args]))

    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                 ("data", "model"))
    out_1 = jax.device_get(ba_mesh_step(mesh1)(*[jnp.asarray(a) for a in args]))

    np.testing.assert_array_equal(out_s["outliers"], out_1["outliers"])
    np.testing.assert_allclose(
        out_s["final_cost"], out_1["final_cost"], rtol=0.05
    )
    err_s = np.abs(out_s["poses"] - gt_poses).max()
    err_1 = np.abs(out_1["poses"] - gt_poses).max()
    err_in = np.abs(args[0] - gt_poses).max()
    # Both runs improve the perturbed poses and land equally close to GT.
    assert err_s < 0.6 * err_in and err_1 < 0.6 * err_in
    assert err_s < 1.6 * err_1 + 1e-4


def test_dryrun_ba():
    from slamtpu.parallel.multi import dryrun_ba

    info = dryrun_ba(8)
    assert info["mesh"] == {"data": 4, "model": 2}


def test_mapper_offload_parity():
    """The PRODUCTION keyframe program on a SECOND device, overlapping a
    track_step on device 0, must bit-match the device-0 run (VERDICT r5
    item 6: the mapper-offload multi-chip configuration)."""
    from slamtpu.parallel.multi import dryrun_mapper_offload

    info = dryrun_mapper_offload(2)  # asserts parity internally
    assert info["kf_device"] != info["track_device"]
    assert info["tracked_overlap"] > 0
