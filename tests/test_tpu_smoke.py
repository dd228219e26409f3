"""Real-TPU-backend smoke subset (VERDICT round 2 item 7).

Run with:  SLAMTPU_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Everything else in tests/ runs on a forced CPU mesh (conftest.py), which is
blind to the CPU-green/TPU-broken class: bf16 MXU matmul corruption of
small-coefficient algebra (the 5-point solver pins f32 —
ops/fivepoint.py), no-op `block_until_ready` on the tunnel backend, and
layout/precision differences in the LK kernels. These ~10 tests compile
small programs on the real backend once per round, before the bench.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if os.environ.get("SLAMTPU_TPU_TESTS") != "1":
        pytest.skip("needs SLAMTPU_TPU_TESTS=1")
    return jax.default_backend()


def test_backend_is_not_cpu(tpu_backend):
    assert tpu_backend != "cpu"


def test_fivepoint_precision(tpu_backend):
    """bf16 MXU default corrupts the 5-point algebra; the solver pins f32
    (ops/fivepoint.py) — this is the canary."""
    import jax.numpy as jnp
    from test_fivepoint import (
        _best_candidate_err, _essential, _project_pair, _random_rt,
    )

    from slamtpu.ops.fivepoint import five_point_candidates

    rng = np.random.default_rng(0)
    n_ok = 0
    for _ in range(6):
        R, t = _random_rt(rng)
        pts = rng.uniform(-2, 2, (5, 3))
        pts[:, 2] = rng.uniform(4, 10, 5)
        pd1, pd2 = _project_pair(pts, R, t)
        E, valid = five_point_candidates(
            jnp.asarray(pd1[None]), jnp.asarray(pd2[None])
        )
        err = _best_candidate_err(
            _essential(R, t), np.asarray(E[0]), np.asarray(valid[0])
        )
        n_ok += err < 2e-2
    assert n_ok >= 4


def test_lk_lane_major_matches_exact(tpu_backend):
    """Lane-major patch-cached LK vs the exact per-iteration-gather kernel
    on a synthetically shifted image (layout/precision parity on TPU)."""
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.image import build_lk_pyramid
    from slamtpu.ops.lucas_kanade import fb_track, lk_pad

    levels, window = 2, 5
    pad = lk_pad(window)
    h, w, n = 96, 128, 64
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    centers = []
    for _ in range(150):
        cy_, cx_ = rng.uniform(12, h - 12), rng.uniform(12, w - 12)
        s = rng.uniform(1.2, 2.2)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -(((yy - cy_) ** 2) + (xx - cx_) ** 2) / (2 * s * s)
        )
        centers.append((cy_, cx_))
    img = (img / img.max()).astype(np.float32)
    shift = (1.6, -2.3)
    img2 = np.roll(np.roll(img, int(round(shift[0] * 10)) // 10, 0),
                   -2, 1).astype(np.float32)
    pts = np.asarray(centers[:n], np.float32)
    valid = np.ones(n, bool)

    pyr1 = build_lk_pyramid(jnp.asarray(img), levels=levels, pad=pad)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=levels, pad=pad)

    outs = {}
    for env, name in ((None, "lane"), ("SLAMTPU_NO_PATCH_LK", "exact")):
        if env:
            os.environ[env] = "1"
        try:
            fb_track.clear_cache()  # env gate is read at trace time
            new_pts, ok = jax.device_get(fb_track(
                pyr1, pyr2, jnp.asarray(pts), jnp.zeros_like(pts),
                jnp.asarray(valid), levels=levels, window=window, pad=pad,
            ))
            outs[name] = (new_pts, ok)
        finally:
            if env:
                os.environ.pop(env, None)
    ok_both = outs["lane"][1] & outs["exact"][1]
    assert ok_both.mean() > 0.5
    diff = np.linalg.norm(
        outs["lane"][0][ok_both] - outs["exact"][0][ok_both], axis=-1
    )
    assert np.median(diff) < 0.2


def test_ba_one_window(tpu_backend):
    import jax
    import jax.numpy as jnp
    from test_ba import make_ba_problem

    from slamtpu.ops.ba import local_bundle_adjustment

    prob = make_ba_problem(seed=4, n_poses=3, n_points=40)
    pose_const = np.array([True, False, False])
    res = jax.device_get(local_bundle_adjustment(
        jnp.asarray(prob["thetas0"], jnp.float32),
        jnp.asarray(pose_const),
        jnp.asarray(prob["points0"], jnp.float32),
        jnp.asarray(prob["obs_pose"]),
        jnp.asarray(prob["obs_point"]),
        jnp.asarray(prob["obs_px"], jnp.float32),
        jnp.ones(len(prob["obs_pose"]), bool),
        jnp.asarray(prob["intr"]),
        iters1=5, iters2=10, repr_eps=5.0,
    ))
    assert np.isfinite(res["final_cost"])
    err = np.abs(res["poses"][1:] - prob["thetas_true"][1:]).max()
    assert err < 0.05


def test_pnp_recovers_pose(tpu_backend):
    import jax
    import jax.numpy as jnp

    from slamtpu import hostmath as hm
    from slamtpu.ops.pnp import pnp_refine

    rng = np.random.default_rng(5)
    fx = fy = 450.0
    cx, cy = 160.0, 120.0
    intr = jnp.asarray(np.array([fx, fy, cx, cy], np.float32))
    pts = np.stack([rng.uniform(-4, 4, 64), rng.uniform(-3, 3, 64),
                    rng.uniform(6, 20, 64)], axis=-1)
    w = np.array([0.02, -0.03, 0.01])
    t = np.array([0.3, -0.1, 0.2])
    cw = hm.rt_to_4x4(hm.so3_exp(w), t)
    pc = pts @ cw[:3, :3].T + cw[:3, 3]
    px = np.stack([fy * pc[:, 1] / pc[:, 2] + cy,
                   fx * pc[:, 0] / pc[:, 2] + cx], axis=-1)
    theta_true = hm.pose_to_theta(cw)
    theta0 = theta_true + rng.normal(0, 0.01, 6)
    res = jax.device_get(pnp_refine(
        jnp.asarray(theta0, jnp.float32),
        jnp.asarray(pts, jnp.float32), jnp.asarray(px, jnp.float32),
        jnp.ones(64, bool), intr, iters1=5, iters2=10, repr_eps=3.0,
    ))
    assert np.abs(np.asarray(res["theta"]) - theta_true).max() < 5e-3


def test_track_step_one_frame(tpu_backend):
    """The pipelined carry step (ops/track_step.py) end to end on one
    synthetic frame pair: tracked points move, carry stays finite."""
    import jax
    import jax.numpy as jnp

    from slamtpu.ops import track_step as ts
    from slamtpu.ops.image import build_lk_pyramid
    from slamtpu.ops.lucas_kanade import lk_pad

    levels, window, cap = 2, 5, 128
    pad = lk_pad(window)
    h, w = 96, 128
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    centers = []
    for _ in range(120):
        cy_, cx_ = rng.uniform(12, h - 12), rng.uniform(12, w - 12)
        s = rng.uniform(1.2, 2.2)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -(((yy - cy_) ** 2) + (xx - cx_) ** 2) / (2 * s * s)
        )
        centers.append((cy_, cx_))
    img = (img / img.max()).astype(np.float32)

    kp = np.zeros((cap, 10), np.float32)
    n = 64
    pts = np.asarray(centers[:n], np.float32)
    kp[:n, ts.TK_PX] = pts
    kp[:n, ts.TK_FLAGS] = ts.FL_VALID
    misc = np.zeros(48, np.float32)
    misc[ts.MS_PREV_KF_CW] = np.eye(4, dtype=np.float32).reshape(16)
    misc[ts.MS_WC] = np.eye(4, dtype=np.float32).reshape(16)
    fx = fy = 0.9 * w
    misc[ts.MS_INTRINSICS] = [fx, fy, w / 2, h / 2]

    carry = {
        "pyr": build_lk_pyramid(jnp.asarray(img), levels=levels, pad=pad),
        "kp": jnp.asarray(kp),
        "misc": jnp.asarray(misc),
    }
    new_carry, per_kp, scalars = ts.track_step(
        carry, jnp.asarray(img), jnp.float32(0.1), jax.random.PRNGKey(0),
        levels=levels, window=window, pad=pad, height=h, width=w,
        essential_hypotheses=64, pnp_hypotheses=64,
    )
    per_kp, scalars, kp_next = jax.device_get(
        (per_kp, scalars, new_carry["kp"])
    )
    ok = per_kp[:n, 7] > 0
    assert ok.mean() > 0.5  # identity pair: most points track to themselves
    moved = np.linalg.norm(per_kp[:n, 0:2][ok] - pts[ok], axis=-1)
    assert np.median(moved) < 0.5
    assert np.isfinite(kp_next).all() and np.isfinite(scalars).all()


def test_device_get_really_syncs(tpu_backend):
    """jax.block_until_ready is a NO-OP on the tunnel backend; device_get
    must return materialized, correct values."""
    import jax
    import jax.numpy as jnp

    x = jnp.arange(1024.0)
    y = jax.jit(lambda v: jnp.cumsum(v * 2.0))(x)
    out = jax.device_get(y)
    assert out[-1] == pytest.approx(1023.0 * 1024.0)


def test_f16_image_upcast(tpu_backend):
    """f16 uploads (params.image_dtype) must upcast losslessly enough for
    the pyramid path."""
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.image import build_lk_pyramid

    rng = np.random.default_rng(9)
    img = rng.uniform(0, 1, (64, 96)).astype(np.float32)
    p32 = jax.device_get(
        build_lk_pyramid(jnp.asarray(img), levels=1, pad=7)[0]["img"]
    )
    p16 = jax.device_get(
        build_lk_pyramid(
            jnp.asarray(img.astype(np.float16)), levels=1, pad=7
        )[0]["img"]
    )
    assert np.abs(p32 - p16).max() < 2e-3


def test_lk_1d_matches_2d_on_device(tpu_backend):
    """Disparity-only stereo LK kernel vs the 2D kernel on the real
    backend (Mosaic DMA-gather path + lane layouts)."""
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.image import build_lk_pyramid
    from slamtpu.ops.lucas_kanade import lk_flow, lk_pad

    levels, window = 2, 5
    pad = lk_pad(window)
    h, w, n = 96, 128, 64
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    centers = []
    for _ in range(150):
        cy_, cx_ = rng.uniform(12, h - 12), rng.uniform(12, w - 12)
        s = rng.uniform(1.2, 2.2)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -(((yy - cy_) ** 2) + (xx - cx_) ** 2) / (2 * s * s)
        )
        centers.append((cy_, cx_))
    img = (img / img.max()).astype(np.float32)
    # np.roll(img, -3) moves content LEFT 3 px: the right-image match of
    # left pixel x sits at x - 3, so the expected LK flow is -3.
    img_r = np.roll(img, -3, 1).astype(np.float32)
    pts = np.asarray(centers[:n], np.float32)

    pyr_l = build_lk_pyramid(jnp.asarray(img), levels=levels, pad=pad)
    pyr_r = build_lk_pyramid(jnp.asarray(img_r), levels=levels, pad=pad)
    disp = jnp.zeros((n, 2), jnp.float32)
    valid = jnp.ones((n,), bool)

    out = {}
    for name, one_d in (("2d", False), ("1d", True)):
        flow, ok = jax.device_get(lk_flow(
            pyr_l, pyr_r, jnp.asarray(pts), disp, valid,
            levels=levels, window=window, iters=30, eps=1e-2,
            eig_thresh=1e-4, pad=pad, one_d=one_d,
        ))
        out[name] = (flow, ok)
    both = out["1d"][1] & out["2d"][1]
    assert both.mean() > 0.5
    dx = np.abs(out["1d"][0][both, 1] - out["2d"][0][both, 1])
    assert np.median(dx) < 0.2
    assert np.median(np.abs(out["1d"][0][both, 1] - (-3.0))) < 0.3


def test_fused_detect_kernel_on_device(tpu_backend):
    """suppress_and_nms (SLAMTPU_PALLAS_DETECT) vs the XLA scatter +
    dilate + reduce_window tail, bit-exact on the real backend."""
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.detect_pallas import suppress_and_nms
    from slamtpu.ops.features import _dilate

    h, w = 96, 200
    rng = np.random.default_rng(17)
    resp = rng.uniform(0, 1, (h, w)).astype(np.float32)
    n = 40
    yx = np.stack(
        [rng.integers(0, h, n), rng.integers(0, w, n)], axis=-1
    ).astype(np.int32)
    valid = rng.uniform(size=n) > 0.3

    occ = jnp.zeros((h, w), jnp.float32).at[
        jnp.asarray(yx)[:, 0], jnp.asarray(yx)[:, 1]
    ].max(jnp.asarray(valid).astype(jnp.float32))
    r = jnp.where(_dilate(occ, 17) > 0.0, 0.0, jnp.asarray(resp))
    pooled = jax.lax.reduce_window(
        r, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    ref = jax.device_get(
        jnp.where((r >= pooled) & (r > 0.01), r, 0.0)
    )
    out = jax.device_get(suppress_and_nms(
        jnp.asarray(resp), jnp.asarray(yx), jnp.asarray(valid),
        radius=17, min_response=0.01,
    ))
    np.testing.assert_array_equal(out, ref)
