"""Multi-chip scaling: data-parallel multi-sequence tracking with a
keypoint-sharded estimation step over a jax.sharding.Mesh.

The reference is a single-process shared-memory system (SURVEY.md section
2.3); its scale axes are keypoint count and map size. On TPU the natural
multi-chip layout for a fleet of SLAM sessions is:

  - mesh axis "data": independent sequences (batch of SLAM sessions), no
    cross-talk — pure DP;
  - mesh axis "model": the keypoint axis of each sequence is sharded across
    chips (images replicated) — the LK windowed gathers are local per shard,
    and the pose-estimation normal equations (sum over keypoints) become an
    XLA all-reduce over ICI that the compiler inserts from the sharding
    annotations alone.

`multi_sequence_step` is the jitted "training step": forward-backward KLT on
every sequence + one Gauss-Newton pose update from the tracked 3D points.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.image import build_lk_pyramid
from ..ops.lucas_kanade import fb_track, lk_pad
from ..ops.se3 import rot_zyx


def make_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(
            f"make_mesh({n_devices}) needs {n_devices} devices but the "
            f"process sees {len(devs)}. For a virtual CPU mesh set "
            "JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={n_devices} before jax initializes (see "
            "__graft_entry__.dryrun_multichip)."
        )
    if n_devices >= 4 and n_devices % 2 == 0:
        shape = (n_devices // 2, 2)
    else:
        shape = (n_devices, 1)
    return Mesh(np.asarray(devs).reshape(shape), ("data", "model"))


def _pose_gauss_newton(theta, points3d, pixels_yx, weights, intrinsics):
    """One GN step on the 6-DoF pose from weighted reprojection residuals.

    The sum over the (possibly model-sharded) keypoint axis is where XLA
    inserts the cross-chip all-reduce.
    """
    def resid(th, pt, px):
        R = rot_zyx(th[:3])
        pc = R @ pt + th[3:]
        z = jnp.where(jnp.abs(pc[2]) < 1e-9, 1e-9, pc[2])
        proj = jnp.stack(
            [intrinsics[1] * pc[1] / z + intrinsics[3],
             intrinsics[0] * pc[0] / z + intrinsics[2]]
        )
        return px - proj

    r = jax.vmap(lambda pt, px: resid(theta, pt, px))(points3d, pixels_yx)
    J = jax.vmap(
        lambda pt, px: jax.jacfwd(lambda th: resid(th, pt, px))(theta)
    )(points3d, pixels_yx)
    w = weights[:, None]
    r = r * w
    J = J * w[:, :, None]
    H = jnp.einsum("nia,nib->ab", J, J) + 1e-6 * jnp.eye(6)
    g = jnp.einsum("nia,ni->a", J, r)
    from ..ops.smallalg import solve_psd
    return theta - solve_psd(H, g), jnp.sum(r * r)


def _one_sequence(img_prev, img_cur, points, points3d, theta, valid,
                  intrinsics, *, levels, window):
    pyr_prev = build_lk_pyramid(img_prev, levels=levels, pad=lk_pad(window))
    pyr_cur = build_lk_pyramid(img_cur, levels=levels, pad=lk_pad(window))
    new_points, ok = fb_track(
        pyr_prev, pyr_cur, points, jnp.zeros_like(points), valid,
        levels=levels, window=window, max_distance=1.0, pad=lk_pad(window),
    )
    weights = ok.astype(jnp.float32)
    new_theta, cost = _pose_gauss_newton(
        theta, points3d, new_points, weights, intrinsics
    )
    return new_points, ok, new_theta, cost


def multi_sequence_step(mesh: Mesh, *, levels: int = 2, window: int = 5):
    """Build the jitted sharded step: (B, ...) batch over ("data", "model")."""
    data_img = NamedSharding(mesh, P("data", None, None))
    data_pts = NamedSharding(mesh, P("data", "model", None))
    data_msk = NamedSharding(mesh, P("data", "model"))
    data_vec = NamedSharding(mesh, P("data", None))
    data_scalar = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    fn = jax.vmap(
        functools.partial(_one_sequence, levels=levels, window=window),
        in_axes=(0, 0, 0, 0, 0, 0, None),
    )

    return jax.jit(
        fn,
        in_shardings=(data_img, data_img, data_pts, data_pts, data_vec,
                      data_msk, repl),
        out_shardings=(data_pts, data_msk, data_vec, data_scalar),
    )


def frontend_mesh_step(mesh: Mesh, *, levels: int = 2, window: int = 5,
                       essential_hypotheses: int = 64,
                       pnp_hypotheses: int = 64):
    """The PRODUCTION fused per-frame program (ops/frontend_step.py —
    pyramid + KLT + epipolar filter + P3P + PnP), batched over sequences on
    the "data" mesh axis with the keypoint axis sharded on "model".

    Images/pyramids are replicated within a sequence; the per-keypoint LK
    solve and RANSAC scoring are shard-local, and the cross-keypoint
    reductions (inlier counts, structure sums, median bisection) become XLA
    all-reduces over ICI inserted from the sharding annotations alone.
    """
    from ..ops.frontend_step import frontend_step
    from ..ops.image import lk_pyramid_impl

    pad = lk_pad(window)

    def one_seq(img_prev, img_cur, px, valid, prior, disp, mp_pos, has_mp,
                prev_und_xy, prev_bear_xy, has_join, R_comp, theta_pred,
                intrinsics, dist, key):
        pyr1 = lk_pyramid_impl(img_prev, levels=levels, pad=pad)
        pyr2 = lk_pyramid_impl(img_cur, levels=levels, pad=pad)
        n = px.shape[0]
        res = frontend_step(
            pyr1, pyr2, px, valid, prior, disp, mp_pos, has_mp,
            jnp.arange(n, dtype=jnp.int32), has_join & valid,
            prev_und_xy, prev_bear_xy, R_comp, theta_pred,
            intrinsics, dist, key,
            levels=levels, window=window, pad=pad,
            essential_hypotheses=essential_hypotheses,
            pnp_hypotheses=pnp_hypotheses,
        )
        return (
            res["new_px"], res["ok"], res["ess_outlier"], res["p3p_inliers"],
            res["pnp_theta"], res["median_parallax"],
            res["p3p_n_inliers"].astype(jnp.int32),
        )

    fn = jax.vmap(
        one_seq,
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None, 0),
    )

    img_s = NamedSharding(mesh, P("data", None, None))
    kp2_s = NamedSharding(mesh, P("data", "model", None))
    kp1_s = NamedSharding(mesh, P("data", "model"))
    vec_s = NamedSharding(mesh, P("data", None))
    mat_s = NamedSharding(mesh, P("data", None, None))
    scal_s = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    return jax.jit(
        fn,
        in_shardings=(img_s, img_s, kp2_s, kp1_s, kp1_s, kp2_s, kp2_s,
                      kp1_s, kp2_s, kp2_s, kp1_s, mat_s, vec_s, repl, repl,
                      vec_s),
        out_shardings=(kp2_s, kp1_s, kp1_s, kp1_s, vec_s, scal_s, scal_s),
    )


def make_frontend_inputs(batch: int, n_points: int, height: int, width: int,
                         seed: int = 0):
    """Synthetic batched inputs for the production frontend step: a blob
    scene observed from an identity pose with known 3D points (so P3P/PnP
    have a consistent geometry)."""
    rng = np.random.default_rng(seed)
    fx = fy = 0.9 * width
    cx, cy = width / 2.0, height / 2.0
    intrinsics = np.array([fx, fy, cx, cy], np.float32)
    dist = np.zeros(4, np.float32)

    imgs_prev = np.zeros((batch, height, width), np.float32)
    px = np.zeros((batch, n_points, 2), np.float32)
    mp_pos = np.zeros((batch, n_points, 3), np.float32)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    for b in range(batch):
        img = np.zeros((height, width))
        pts = np.stack(
            [
                rng.uniform(10, height - 10, n_points),
                rng.uniform(10, width - 10, n_points),
            ],
            axis=-1,
        )
        for (py, pxx) in pts:
            s = rng.uniform(1.2, 2.2)
            img += rng.uniform(0.4, 1.0) * np.exp(
                -(((yy - py) ** 2) + (xx - pxx) ** 2) / (2 * s * s)
            )
        imgs_prev[b] = (img / max(img.max(), 1e-6)).astype(np.float32)
        px[b] = pts
        z = rng.uniform(5.0, 15.0, n_points)
        mp_pos[b] = np.stack(
            [(pts[:, 1] - cx) / fx * z, (pts[:, 0] - cy) / fy * z, z],
            axis=-1,
        )
    imgs_cur = imgs_prev.copy()

    valid = np.ones((batch, n_points), bool)
    has_mp = np.zeros((batch, n_points), bool)
    has_mp[:, : n_points // 2] = True
    prior = has_mp.copy()
    disp = np.zeros((batch, n_points, 2), np.float32)
    prev_und = px[..., ::-1].copy()                       # (x, y)
    prev_bear = np.stack(
        [(px[..., 1] - cx) / fx, (px[..., 0] - cy) / fy], axis=-1
    ).astype(np.float32)
    has_join = np.ones((batch, n_points), bool)
    R_comp = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))
    theta_pred = np.zeros((batch, 6), np.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(batch))
    return (imgs_prev, imgs_cur, px, valid, prior, disp, mp_pos, has_mp,
            prev_und, prev_bear, has_join, R_comp, theta_pred, intrinsics,
            dist, keys)


def ba_mesh_step(mesh: Mesh, *, iters1: int = 5, iters2: int = 10):
    """The PRODUCTION local bundle adjustment (ops/ba.py — Schur-complement
    LM, two-phase outliers) with its OBSERVATION axis sharded across every
    chip of the mesh (both named axes flattened): the per-observation
    residual/Jacobian blocks and the J^T J / J^T r accumulations are
    shard-local, and the reductions onto the (replicated) pose/point
    parameter blocks become XLA all-reduces over ICI inserted from the
    sharding annotations alone. Reference worker: estimator.jl:328-331 +
    bundle_adjustment.jl:1-55 (single-threaded LSMR there; data-parallel
    normal equations here)."""
    from ..ops.ba import local_bundle_adjustment

    obs_s = NamedSharding(mesh, P(("data", "model")))
    repl = NamedSharding(mesh, P())

    fn = functools.partial(
        local_bundle_adjustment, iters1=iters1, iters2=iters2
    )
    return jax.jit(
        fn,
        in_shardings=(repl, repl, repl, obs_s, obs_s, obs_s, obs_s, repl),
        out_shardings={
            "poses": repl, "points": repl, "outliers": obs_s,
            "final_cost": repl,
        },
    )


def make_ba_inputs(n_poses: int, n_points: int, n_obs: int, seed: int = 0):
    """Synthetic consistent BA problem: noisy poses/points observing exact
    pixels (every array padded to the given sizes)."""
    rng = np.random.default_rng(seed)
    intr = np.array([120.0, 118.0, 48.0, 36.0], np.float32)
    poses = rng.normal(0, 0.02, (n_poses, 6)).astype(np.float32)
    # Wide lateral baseline relative to the point depths: keeps every
    # point's depth well-conditioned (a short-baseline problem leaves
    # depth nearly free along the ray and LM legitimately wanders there).
    poses[:, 3] = np.arange(n_poses) * 0.8
    # Two constant poses: one pins the frame, the second pins the scale
    # gauge (projection-only observations leave global scale free
    # otherwise — estimator.jl:169-226 fixes the two oldest poses too).
    const = np.zeros(n_poses, bool)
    const[0] = const[1] = True
    pts = np.stack(
        [rng.uniform(-2, 6, n_points), rng.uniform(-2, 2, n_points),
         rng.uniform(5, 12, n_points)], axis=-1
    ).astype(np.float32)
    # Sample (pose, point) pairs WITHOUT replacement: production
    # observations are unique per (keyframe, point), which is what makes
    # K = P a hard bound for ba.py::_bucket_observations — duplicates
    # would overflow a point's bucket and silently drop observations.
    if n_obs > n_poses * n_points:
        raise ValueError("n_obs exceeds the unique (pose, point) pairs")
    pairs = rng.choice(n_poses * n_points, size=n_obs, replace=False)
    obs_pose = (pairs // n_points).astype(np.int32)
    obs_point = (pairs % n_points).astype(np.int32)
    from ..hostmath import rot_zyx as host_rot

    px = np.zeros((n_obs, 2), np.float32)
    for i in range(n_obs):
        th = poses[obs_pose[i]]
        R = host_rot(th[:3].astype(np.float64))
        pc = R @ pts[obs_point[i]].astype(np.float64) + th[3:]
        px[i] = [intr[1] * pc[1] / pc[2] + intr[3],
                 intr[0] * pc[0] / pc[2] + intr[2]]
    px += rng.normal(0, 0.1, px.shape)
    valid = np.ones(n_obs, bool)
    # Perturb the free poses/points so LM has work to do.
    poses_n = poses + rng.normal(0, 0.05, poses.shape).astype(np.float32)
    poses_n[const] = poses[const]
    pts_n = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    args = (poses_n.astype(np.float32), const, pts_n.astype(np.float32),
            obs_pose, obs_point, px.astype(np.float32), valid, intr)
    return args, poses.astype(np.float32), pts


def dryrun_ba(n_devices: int, n_poses: int = 6, n_points: int = 64,
              n_obs: int = 256):
    """Compile + run the sharded PRODUCTION local BA on tiny shapes."""
    mesh = make_mesh(n_devices)
    total = mesh.shape["data"] * mesh.shape["model"]
    n_obs = -(-n_obs // total) * total
    args, _, _ = make_ba_inputs(n_poses, n_points, n_obs)
    step = ba_mesh_step(mesh)
    out = step(*[jnp.asarray(a) for a in args])
    jax.block_until_ready(out)
    return {
        "mesh": dict(mesh.shape),
        "final_cost": float(np.asarray(out["final_cost"])),
        "outliers": int(np.asarray(out["outliers"]).sum()),
    }


def dryrun_frontend(n_devices: int, batch: int | None = None,
                    height: int = 48, width: int = 64, n_points: int = 64):
    """Compile + run the sharded PRODUCTION frontend step on tiny shapes."""
    mesh = make_mesh(n_devices)
    dp = mesh.shape["data"]
    sp = mesh.shape["model"]
    if batch is None:
        batch = dp
    n_points = -(-max(n_points, sp) // sp) * sp

    args = make_frontend_inputs(batch, n_points, height, width)
    step = frontend_mesh_step(mesh)
    out = step(*[jnp.asarray(a) for a in args])
    jax.block_until_ready(out)
    new_px, ok, ess_out, p3p_in, pnp_theta, med_par, p3p_n = out
    assert new_px.shape == args[2].shape
    return {
        "mesh": dict(mesh.shape),
        "tracked": int(np.asarray(ok).sum()),
        "p3p_inliers": [int(v) for v in np.asarray(p3p_n)],
    }


def dryrun(n_devices: int, batch: int | None = None, height: int = 48,
           width: int = 64, n_points: int = 32):
    """Compile + execute one sharded multi-sequence step on tiny shapes."""
    mesh = make_mesh(n_devices)
    dp = mesh.shape["data"]
    sp = mesh.shape["model"]
    if batch is None:
        batch = dp
    n_points = max(n_points, sp)
    n_points = -(-n_points // sp) * sp  # divisible by the model axis

    rng = np.random.default_rng(0)
    img_prev = rng.uniform(size=(batch, height, width)).astype(np.float32)
    img_cur = img_prev.copy()
    points = np.stack(
        [
            rng.uniform(8, height - 8, (batch, n_points)),
            rng.uniform(8, width - 8, (batch, n_points)),
        ],
        axis=-1,
    ).astype(np.float32)
    points3d = np.concatenate(
        [
            (points[..., ::-1] - np.array([width / 2, height / 2]))
            / (0.9 * width),
            np.ones((batch, n_points, 1)),
        ],
        axis=-1,
    ).astype(np.float32) * 10.0
    theta = np.zeros((batch, 6), np.float32)
    theta[:, 5] = 0.0
    valid = np.ones((batch, n_points), bool)
    intrinsics = np.array(
        [0.9 * width, 0.9 * width, width / 2, height / 2], np.float32
    )

    step = multi_sequence_step(mesh)
    new_points, ok, new_theta, cost = step(
        jnp.asarray(img_prev), jnp.asarray(img_cur), jnp.asarray(points),
        jnp.asarray(points3d), jnp.asarray(theta), jnp.asarray(valid),
        jnp.asarray(intrinsics),
    )
    jax.block_until_ready((new_points, ok, new_theta, cost))
    assert new_points.shape == points.shape
    assert new_theta.shape == theta.shape
    # The production fused frontend program, sharded the same way.
    frontend_info = dryrun_frontend(n_devices, batch=batch,
                                    height=height, width=width)
    # The production Schur-complement local BA, observation-axis sharded.
    ba_info = dryrun_ba(n_devices)
    # The mapper (keyframe) program offloaded to a second device while
    # tracking continues on device 0 (VERDICT r5 item 6).
    offload_info = dryrun_mapper_offload(n_devices)
    return {
        "mesh": dict(mesh.shape),
        "tracked": int(np.asarray(ok).sum()),
        "cost": [float(c) for c in np.asarray(cost)],
        "frontend": frontend_info,
        "ba": ba_info,
        "mapper_offload": offload_info,
    }


def make_offload_inputs(height: int = 64, width: int = 96, cap: int = 64,
                        n: int = 32, levels: int = 2, window: int = 5):
    """Inputs for the PRODUCTION track_step + keyframe_step_carry pair on
    tiny shapes: a blob-textured image (structured gradients survive the
    detector/LK smoothing), n seeded keypoints, and a keyframe state with
    no temporal groups and the slot tail free for detection admission
    (mirrors models/mapper.py::_pack_carry_state)."""
    from ..ops import keyframe_step as ks
    from ..ops import track_step as ts

    pad = lk_pad(window)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    img = np.zeros((height, width))
    centers = []
    for _ in range(120):
        cy, cx = rng.uniform(10, height - 10), rng.uniform(10, width - 10)
        s = rng.uniform(1.0, 2.5)
        img += rng.uniform(0.3, 1.0) * np.exp(
            -(((yy - cy) ** 2) + (xx - cx) ** 2) / (2 * s * s)
        )
        centers.append((cy, cx))
    img = (img / img.max()).astype(np.float32)

    kp = np.zeros((cap, 10), np.float32)
    kp[:n, ts.TK_PX] = np.asarray(centers[:n], np.float32)
    kp[:n, ts.TK_FLAGS] = ts.FL_VALID
    intr = np.array([0.9 * width, 0.9 * width, width / 2.0, height / 2.0],
                    np.float32)
    misc = np.zeros(48, np.float32)
    misc[ts.MS_PREV_KF_CW] = np.eye(4, dtype=np.float32).reshape(16)
    misc[ts.MS_WC] = np.eye(4, dtype=np.float32).reshape(16)
    misc[ts.MS_INTRINSICS] = intr

    pyr = build_lk_pyramid(jnp.asarray(img), levels=levels, pad=pad)
    carry = {
        "pyr": tuple(
            {k: np.asarray(v) for k, v in lvl.items()} for lvl in pyr
        ),
        "kp": kp,
        "misc": misc,
    }

    state = np.zeros((ks.state2_rows(cap), 16), np.float32)
    state[:cap, ks.KS2_GROUP] = -1.0
    state[:n, ks.KS2_UND] = kp[:n, 0:2]
    free = np.full(cap, cap, np.float32)
    free[: cap - n] = np.arange(n, cap, dtype=np.float32)
    state[:cap, ks.KS2_FREE] = free
    K4 = np.eye(4, dtype=np.float64)
    K4[0, 0], K4[1, 1] = intr[0], intr[1]
    K4[0, 2], K4[1, 2] = intr[2], intr[3]
    Ti0 = np.eye(4, dtype=np.float64)
    Ti0[0, 3] = -0.1  # stereo baseline along x
    miscs = np.zeros(ks.KS2_MISC_ROWS * 16, np.float32)
    miscs[ks.M2_P1] = K4.reshape(16)
    miscs[ks.M2_P2R] = (K4 @ Ti0).reshape(16)
    miscs[ks.M2_INTR_R] = intr
    miscs[ks.M2_INTR_L] = intr
    miscs[ks.M2_CELL_DETECT] = 2
    miscs[ks.M2_NB_DETECT] = cap - n
    miscs[ks.M2_NFREE] = cap - n
    miscs[ks.M2_TI0] = Ti0.reshape(16)
    state[cap + ks.N_GROUPS:] = miscs.reshape(ks.KS2_MISC_ROWS, 16)
    return carry, img, state, dict(levels=levels, window=window, pad=pad,
                                   height=height, width=width)


def dryrun_mapper_offload(n_devices: int):
    """The mapper-offload multi-chip configuration: the PRODUCTION
    keyframe program (ops/keyframe_step.py::keyframe_step_carry) placed on
    a SECOND device while track_step dispatches continue on device 0 —
    the configuration PERF.md's keyframe-speculation post-mortem concludes
    is the single-sequence FPS lever once a second chip exists. Validates
    that (1) the keyframe program compiles + executes off the default
    device, (2) tracking overlaps it on device 0 without contention, and
    (3) the offloaded outputs match the on-device-0 run (parity), so
    grafting the post-keyframe carry back is safe."""
    from ..ops import keyframe_step as ks
    from ..ops import track_step as ts

    devs = jax.devices()
    if len(devs) < 2:
        raise RuntimeError("dryrun_mapper_offload needs >= 2 devices")
    dev_track, dev_kf = devs[0], devs[1]

    carry, img, state, dims = make_offload_inputs()
    step = functools.partial(
        ts.track_step, essential_hypotheses=64, pnp_hypotheses=64, **dims
    )
    kf_step = functools.partial(ks.keyframe_step_carry, **dims)

    key = np.asarray(jax.random.PRNGKey(0))
    carry0 = jax.device_put(carry, dev_track)
    img0 = jax.device_put(img, dev_track)
    c1, per_kp, scalars = step(
        carry0, img0, np.float32(0.1), jax.device_put(key, dev_track)
    )

    # Offload: ship the post-track carry + right image + state to device 1
    # and run the keyframe program there...
    kf_in = jax.device_put((c1, img, state), dev_kf)
    kf_carry, kf_slot, kf_new = kf_step(*kf_in)
    # ...while device 0 keeps tracking the SAME pre-keyframe carry
    # (speculation past the keyframe, models/slam_manager.py).
    c2, per_kp2, scalars2 = step(
        c1, img0, np.float32(0.1), jax.device_put(key, dev_track)
    )
    jax.block_until_ready((kf_slot, per_kp2))
    assert kf_slot.sharding.device_set == {dev_kf}, kf_slot.sharding
    assert per_kp2.sharding.device_set == {dev_track}, per_kp2.sharding

    # Parity: the same keyframe program on device 0.
    ref_carry, ref_slot, ref_new = kf_step(c1, img0, jax.device_put(
        jnp.asarray(state), dev_track))
    np.testing.assert_array_equal(np.asarray(kf_slot), np.asarray(ref_slot))
    np.testing.assert_array_equal(np.asarray(kf_new), np.asarray(ref_new))
    np.testing.assert_array_equal(
        np.asarray(kf_carry["kp"]), np.asarray(ref_carry["kp"])
    )
    return {
        "kf_device": str(dev_kf),
        "track_device": str(dev_track),
        "n_new": int(np.asarray(kf_new)),
        "tracked_overlap": int(np.asarray(per_kp2[:, 7] > 0).sum()),
    }
