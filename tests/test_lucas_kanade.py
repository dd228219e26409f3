import numpy as np
import pytest

import jax.numpy as jnp

from slamtpu.ops.image import build_lk_pyramid, pyramid_shapes
from slamtpu.ops.lucas_kanade import fb_track, lk_flow, pinv2x2_sym

from slamtpu.ops.lucas_kanade import lk_pad

PAD = lk_pad(9)


def make_texture(h, w, seed=0, n_blobs=300, rng_shift=(0.0, 0.0)):
    """Random Gaussian-blob texture with an optional global sub-pixel shift."""
    rng = np.random.default_rng(seed)
    ys = rng.uniform(5, h - 5, n_blobs)
    xs = rng.uniform(5, w - 5, n_blobs)
    amp = rng.uniform(0.3, 1.0, n_blobs)
    sig = rng.uniform(1.0, 2.5, n_blobs)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for y, x, a, s in zip(ys, xs, amp, sig):
        img += a * np.exp(
            -(((yy - y - rng_shift[0]) ** 2) + (xx - x - rng_shift[1]) ** 2)
            / (2 * s * s)
        )
    img /= img.max()
    return img.astype(np.float32)


def test_pyramid_shapes():
    shapes = pyramid_shapes(376, 1241, 3)
    assert shapes == [(376, 1241), (188, 621), (94, 311), (47, 156)]


def test_pinv2x2():
    a, b, c = 4.0, 1.0, 3.0
    ia, ib, ic, s1, s2 = [
        float(v)
        for v in pinv2x2_sym(jnp.float32(a), jnp.float32(b), jnp.float32(c))
    ]
    G = np.array([[a, b], [b, c]])
    Ginv = np.array([[ia, ib], [ib, ic]])
    assert np.allclose(Ginv, np.linalg.inv(G), atol=1e-5)
    evals = np.linalg.eigvalsh(G)
    assert np.isclose(s2, evals[0], atol=1e-5)
    assert np.isclose(s1, evals[1], atol=1e-5)


@pytest.mark.parametrize("shift", [(1.3, -2.2), (4.7, 3.1)])
def test_lk_recovers_global_shift(shift):
    h, w = 120, 160
    img1 = make_texture(h, w, seed=3)
    img2 = make_texture(h, w, seed=3, rng_shift=shift)

    levels = 3
    pyr1 = build_lk_pyramid(jnp.asarray(img1), levels=levels, pad=PAD)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=levels, pad=PAD)

    rng = np.random.default_rng(0)
    n = 64
    pts = np.stack(
        [rng.uniform(25, h - 25, n), rng.uniform(25, w - 25, n)], axis=-1
    ).astype(np.float32)
    disp = jnp.zeros((n, 2), dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)

    flow, ok = lk_flow(
        pyr1, pyr2, jnp.asarray(pts), disp, valid,
        levels=levels, window=9, iters=30, eps=1e-2, eig_thresh=1e-4, pad=PAD,
    )
    flow = np.asarray(flow)
    ok = np.asarray(ok)
    assert ok.mean() > 0.7
    err = np.linalg.norm(flow[ok] - np.array(shift), axis=-1)
    assert np.median(err) < 0.25


def test_fb_track_rejects_occluded():
    h, w = 120, 160
    shift = (2.0, 1.0)
    img1 = make_texture(h, w, seed=5)
    img2 = make_texture(h, w, seed=5, rng_shift=shift)
    # Occlude a region in the second image: points there should fail FB check.
    img2[40:80, 40:80] = 0.0

    levels = 3
    pyr1 = build_lk_pyramid(jnp.asarray(img1), levels=levels, pad=PAD)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=levels, pad=PAD)

    pts_good = np.array([[20.0, 120.0], [100.0, 30.0], [25.0, 30.0]])
    pts_bad = np.array([[60.0, 60.0], [55.0, 65.0]])
    pts = np.concatenate([pts_good, pts_bad]).astype(np.float32)
    n = len(pts)

    new_pts, ok = fb_track(
        pyr1, pyr2, jnp.asarray(pts),
        jnp.zeros((n, 2), jnp.float32), jnp.ones((n,), bool),
        levels=levels, window=9, max_distance=1.0,
    )
    new_pts, ok = np.asarray(new_pts), np.asarray(ok)
    assert ok[: len(pts_good)].all()
    moved = new_pts[: len(pts_good)] - pts[: len(pts_good)]
    assert np.allclose(moved, shift, atol=0.5)


def test_lk_respects_validity_mask():
    h, w = 64, 64
    img = make_texture(h, w, seed=7)
    pyr = build_lk_pyramid(jnp.asarray(img), levels=1, pad=PAD)
    pts = np.array([[32.0, 32.0], [10.0, 10.0]], dtype=np.float32)
    valid = jnp.asarray([True, False])
    _, ok = fb_track(
        pyr, pyr, jnp.asarray(pts), jnp.zeros((2, 2), jnp.float32), valid,
        levels=1, window=9, max_distance=1.0,
    )
    ok = np.asarray(ok)
    assert not ok[1]


def test_lk_displacement_prior():
    # Big shift that plain LK at 1 level cannot find, but the prior solves.
    h, w = 120, 160
    shift = (0.0, 12.0)
    img1 = make_texture(h, w, seed=11)
    img2 = make_texture(h, w, seed=11, rng_shift=shift)
    pyr1 = build_lk_pyramid(jnp.asarray(img1), levels=1, pad=PAD)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=1, pad=PAD)

    rng = np.random.default_rng(2)
    n = 32
    pts = np.stack(
        [rng.uniform(25, h - 25, n), rng.uniform(30, w - 30, n)], axis=-1
    ).astype(np.float32)
    # Prior in coarsest-level (level 1) units: shift / 2.
    prior = jnp.tile(jnp.asarray([[0.0, 6.0]], jnp.float32), (n, 1))
    new_pts, ok = fb_track(
        pyr1, pyr2, jnp.asarray(pts), prior, jnp.ones((n,), bool),
        levels=1, window=9, max_distance=1.0,
    )
    ok = np.asarray(ok)
    assert ok.mean() > 0.6
    err = np.linalg.norm(
        np.asarray(new_pts)[ok] - (pts[ok] + np.array(shift)), axis=-1
    )
    assert np.median(err) < 0.3


def test_patch_kernel_matches_exact_at_large_drift(monkeypatch):
    """Patch-cached-kernel contract beyond the previously validated 7 px:
    forward-BACKWARD tracking at 8-24 px full-resolution shifts must
    agree with the exact per-iteration-gather kernel (SLAMTPU_NO_PATCH_LK)
    after the fb gate. Forward-only flows MAY diverge for points whose
    per-level residual leaves the cached-patch margin (the patch kernel
    freezes them by design); the escape_fail backward pass is what kills
    them — so the contract is: every point BOTH kernels pass carries the
    same, correct flow, and the patch kernel passes no point the exact
    kernel would reject with a different flow."""
    import numpy as np
    import jax.numpy as jnp

    import slamtpu.ops.lucas_kanade as lk
    from slamtpu.ops.image import build_lk_pyramid, gaussian_blur
    from slamtpu.ops.lucas_kanade import lk_pad

    fb = lk.fb_track.__wrapped__  # unjitted: the env switch is trace-time
    h, w = 128, 192
    window, levels = 4, 2
    pad = lk_pad(window)
    rng = np.random.default_rng(7)
    noise = rng.standard_normal((h, w)).astype(np.float32)
    img = np.asarray(gaussian_blur(jnp.asarray(noise), 1.5))
    img = (img - img.min()) / (img.max() - img.min())
    pts = [
        (rng.uniform(40, h - 40), rng.uniform(40, w - 40)) for _ in range(32)
    ]
    px = jnp.asarray(np.asarray(pts, np.float32))
    valid = jnp.ones(len(pts), bool)
    disp = jnp.zeros_like(px)
    kw = dict(levels=levels, window=window, iters=40, eps=1e-3,
              eig_thresh=1e-4, pad=pad, max_distance=0.7)

    pyr1 = build_lk_pyramid(jnp.asarray(img), levels=levels, pad=pad)
    # (shift, min points passing both kernels): the fb gate legitimately
    # thins weak-texture points as the drift grows (20 px is 5 px at the
    # coarsest level — at the margin with no prior); the contract under
    # test is flow CORRECTNESS and kernel agreement, not tracking rate.
    for shift, floor in ((8, 16), (14, 16), (20, 6)):
        img2 = np.roll(img, (0, shift), (0, 1))
        pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=levels, pad=pad)
        p_px, ok_p = fb(pyr1, pyr2, px, disp, valid, **kw)
        monkeypatch.setenv("SLAMTPU_NO_PATCH_LK", "1")
        e_px, ok_e = fb(pyr1, pyr2, px, disp, valid, **kw)
        monkeypatch.delenv("SLAMTPU_NO_PATCH_LK")
        p_px, ok_p = np.asarray(p_px), np.asarray(ok_p)
        e_px, ok_e = np.asarray(e_px), np.asarray(ok_e)
        both = ok_p & ok_e
        assert both.sum() >= floor, (
            f"shift {shift}: only {both.sum()}/{len(pts)} pass both kernels"
        )
        np.testing.assert_allclose(
            p_px[both], e_px[both], atol=1e-2, err_msg=f"shift {shift}"
        )
        # Flow correctness only binds while the true match is inside the
        # no-prior convergence basin (shift <= 14 -> <= 3.5 px at the
        # coarsest level). Beyond that, surviving points are dominated by
        # honest symmetric aliases to self-similar texture — BOTH kernels
        # agree on them (the allclose above proves it) and downstream
        # RANSAC owns them; what must never happen is the patch kernel
        # minting wrong-flow survivors the exact kernel does not.
        if shift <= 14:
            for mask, name in ((both, "both"), (ok_p, "patch")):
                err = np.abs(
                    p_px[mask, 1] - (np.asarray(pts)[mask, 1] + shift)
                )
                assert np.median(err) < 0.5, f"shift {shift} {name}"
                assert (err > 1.5).mean() < 0.2, (
                    f"shift {shift} {name}: {(err > 1.5).sum()} aliased"
                )
        diverge = int((ok_p != ok_e).sum())
        if shift <= 8:
            assert diverge == 0, f"shift {shift}: ok sets diverge"
        elif shift <= 14:
            # The escape_fail asymmetry (lucas_kanade.py backward pass)
            # may conservatively kill a point whose residual grazes the
            # cached-patch margin (measured: 1/32 at shift 14). The
            # direction matters: the patch kernel must never MINT a
            # survivor the exact kernel rejects.
            assert diverge <= 3, f"shift {shift}: {diverge}/32 diverge"
            assert not (ok_p & ~ok_e).any(), (
                f"shift {shift}: patch kernel minted survivors"
            )


@pytest.mark.parametrize("shift_x", [3.4, -7.6])
def test_lk_1d_recovers_horizontal_shift(shift_x):
    """Disparity-only kernel recovers a pure horizontal (stereo-like)
    shift as accurately as the 2D kernel."""
    h, w = 120, 160
    img1 = make_texture(h, w, seed=5)
    img2 = make_texture(h, w, seed=5, rng_shift=(0.0, shift_x))

    levels = 3
    pyr1 = build_lk_pyramid(jnp.asarray(img1), levels=levels, pad=PAD)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=levels, pad=PAD)

    rng = np.random.default_rng(1)
    n = 64
    pts = np.stack(
        [rng.uniform(25, h - 25, n), rng.uniform(25, w - 25, n)], axis=-1
    ).astype(np.float32)
    disp = jnp.zeros((n, 2), dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)

    flow1d, ok1d = lk_flow(
        pyr1, pyr2, jnp.asarray(pts), disp, valid,
        levels=levels, window=9, iters=30, eps=1e-2, eig_thresh=1e-4,
        pad=PAD, one_d=True,
    )
    flow1d = np.asarray(flow1d)
    ok1d = np.asarray(ok1d)
    assert ok1d.mean() > 0.7
    assert np.all(flow1d[:, 0] == 0.0)  # y pinned
    err = np.abs(flow1d[ok1d, 1] - shift_x)
    assert np.median(err) < 0.25

    # Parity with the 2D kernel's x-component on the same points.
    flow2d, ok2d = lk_flow(
        pyr1, pyr2, jnp.asarray(pts), disp, valid,
        levels=levels, window=9, iters=30, eps=1e-2, eig_thresh=1e-4,
        pad=PAD,
    )
    both = ok1d & np.asarray(ok2d)
    assert both.mean() > 0.6
    dx = np.abs(flow1d[both, 1] - np.asarray(flow2d)[both, 1])
    assert np.median(dx) < 0.2


def test_stereo_1d_fb_cascade_matches_2d():
    """fb_retry_compact with one_d=True finds the same stereo matches as
    the 2D cascade on a rectified pair with a disparity field (prior and
    plain families, row-corrected output contract)."""
    from slamtpu.ops.lucas_kanade import fb_retry_compact

    h, w = 120, 200
    img_l = make_texture(h, w, seed=9)
    # Rectified right view: horizontal shift (uniform disparity).
    d_true = 6.3
    img_r = make_texture(h, w, seed=9, rng_shift=(0.0, -d_true))

    levels = 3
    pyr_l = build_lk_pyramid(jnp.asarray(img_l), levels=levels, pad=PAD)
    pyr_r = build_lk_pyramid(jnp.asarray(img_r), levels=levels, pad=PAD)

    rng = np.random.default_rng(2)
    n = 96
    pts = np.stack(
        [rng.uniform(25, h - 25, n), rng.uniform(25, w - 25, n)], axis=-1
    ).astype(np.float32)
    valid = jnp.ones((n,), dtype=bool)
    # Half the points enter with a (noisy) disparity prior like 3D
    # keypoints do in the keyframe program.
    prior_mask = jnp.asarray(np.arange(n) % 2 == 0)
    disp = jnp.where(
        prior_mask[:, None],
        jnp.asarray(
            np.stack([np.zeros(n), np.full(n, -d_true / 2 + 0.4)], -1),
            dtype=jnp.float32,
        ),
        0.0,
    )

    out = {}
    for name, one_d in (("2d", False), ("1d", True)):
        px_new, ok, _ = fb_retry_compact(
            pyr_l, pyr_r, jnp.asarray(pts), prior_mask, disp, valid,
            levels=levels, prior_level=1, window=9, iters=30, eps=1e-2,
            eig_thresh=1e-4, pad=PAD, max_distance=1.0, one_d=one_d,
        )
        out[name] = (np.asarray(px_new), np.asarray(ok))

    px2, ok2 = out["2d"]
    px1, ok1 = out["1d"]
    # 1D keeps (nearly) the survivor set and agrees on the disparity.
    assert ok1.mean() >= ok2.mean() - 0.05
    both = ok1 & ok2
    assert both.mean() > 0.6
    assert np.median(np.abs(px1[both, 1] - px2[both, 1])) < 0.2
    assert np.median(np.abs(px1[both, 1] - (pts[both, 1] - d_true))) < 0.3
