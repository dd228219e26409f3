"""Microbenchmark: per-frame LK cascade variants on the real backend.

Times fb_track_merged (the production tracking cascade: 4 level blocks with
shadow lanes + 1 backward block) at the KITTI workload point under different
kernel selections / iteration budgets. Run EXCLUSIVELY (no other TPU
process). Usage:

    python scripts/lk_bench.py            # all variants
    SLAMTPU_NO_PATCH_LK=1 ...             # are in-program gathers fast now?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.image import build_lk_pyramid
    from slamtpu.ops.lucas_kanade import fb_track_merged, lk_pad
    from slamtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    h, w, cap = 376, 1241, 1024
    levels, window = 3, 9
    pad = lk_pad(window)
    rng = np.random.default_rng(0)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    centers = []
    for _ in range(1500):
        cy_, cx_ = rng.uniform(12, h - 12), rng.uniform(12, w - 12)
        s = rng.uniform(1.2, 3.5)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -(((yy - cy_) ** 2) + (xx - cx_) ** 2) / (2 * s * s)
        )
        centers.append((cy_, cx_))
    img = (img / img.max()).astype(np.float32)
    img2 = np.roll(img, (2, -5), (0, 1))

    pyr1 = build_lk_pyramid(jnp.asarray(img), levels=levels, pad=pad)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=levels, pad=pad)
    jax.device_get(pyr2[0]["img"])  # materialize + tunnel warm-up

    px = np.zeros((cap, 2), np.float32)
    n = min(len(centers), cap)
    px[:n] = np.asarray(centers[:n], np.float32)
    valid = np.zeros(cap, bool)
    valid[:n] = True
    prior = np.zeros(cap, bool)
    prior[: n // 2] = True  # half the batch takes the 3D-prior path
    disp = np.zeros((cap, 2), np.float32)

    def run(tag, iters, min_active):
        args = (pyr1, pyr2, jnp.asarray(px), jnp.asarray(prior),
                jnp.asarray(disp), jnp.asarray(valid))
        kw = dict(levels=levels, prior_level=1, window=window, iters=iters,
                  eps=1e-2, eig_thresh=1e-4, pad=pad, max_distance=1.0,
                  min_active=min_active)
        out = fb_track_merged(*args, **kw)
        jax.device_get(out)  # compile + warm
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = fb_track_merged(*args, **kw)
            got = jax.device_get(out)
            ts.append(time.perf_counter() - t0)
        ok = np.asarray(got[1])
        print(f"{tag:34s} median {1e3 * sorted(ts)[len(ts) // 2]:7.1f} ms"
              f"   tracked {int(ok.sum())}/{n}")

    def run_fb(tag, n_lanes, levels_):
        """fb_track (single-lane cascade, no shadow) at a given lane count
        and depth — separates per-block overhead from per-lane bandwidth."""
        from slamtpu.ops.lucas_kanade import fb_track

        px2 = np.zeros((n_lanes, 2), np.float32)
        m = min(n, n_lanes)
        px2[:m] = px[:m]
        v2 = np.zeros(n_lanes, bool)
        v2[:m] = True
        args = (pyr1, pyr2, jnp.asarray(px2), jnp.zeros((n_lanes, 2),
                jnp.float32), jnp.asarray(v2))
        kw = dict(levels=levels_, window=window, iters=30, eps=1e-2,
                  eig_thresh=1e-4, pad=pad, max_distance=1.0, min_active=16)
        out = fb_track(*args, **kw)
        jax.device_get(out)
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            got = jax.device_get(fb_track(*args, **kw))
            ts.append(time.perf_counter() - t0)
        ok = np.asarray(got[1])
        print(f"{tag:34s} median {1e3 * sorted(ts)[len(ts) // 2]:7.1f} ms"
              f"   tracked {int(ok.sum())}/{m}")

    sel = os.environ.get("LK_VARIANTS", "default").split(",")
    if "default" in sel:
        run("iters=30 min_active=16 (prod)", 30, 16)
        run("iters=30 min_active=0 (ref)", 30, 0)
        run("iters=15 min_active=16", 15, 16)
        run("iters=10 min_active=16", 10, 16)
    if "fori" in sel:
        os.environ["SLAMTPU_LK_FORI"] = "1"
        fb_track_merged.clear_cache()
        run("FORI iters=20 (fixed trip)", 20, 0)
        run("FORI iters=12", 12, 0)
        run("FORI iters=8", 8, 0)
        os.environ.pop("SLAMTPU_LK_FORI", None)
        fb_track_merged.clear_cache()
    if "lanes" in sel:
        run_fb("fb 1024 lanes, levels=3 (5 blk)", 1024, levels)
        run_fb("fb 2048 lanes, levels=3 (5 blk)", 2048, levels)
        run_fb("fb 512 lanes,  levels=3 (5 blk)", 512, levels)
        run_fb("fb 1024 lanes, levels=2 (4 blk)", 1024, 2)
        run_fb("fb 1024 lanes, levels=1 (3 blk)", 1024, 1)


if __name__ == "__main__":
    main()
