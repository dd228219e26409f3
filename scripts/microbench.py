"""Per-kernel steady-state microbenchmarks on the current JAX backend."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from slamtpu.ops.image import build_lk_pyramid
from slamtpu.ops.lucas_kanade import fb_track
from slamtpu.ops.features import detect_keypoints
from slamtpu.ops.mvg import essential_ransac, triangulate_batch
from slamtpu.ops.pnp import p3p_ransac, pnp_refine
from slamtpu.ops.ba import local_bundle_adjustment

H, W = 376, 1241
CAP = 1024
PAD = 11
rng = np.random.default_rng(0)


def timeit(name, fn, n=10):
    fn()  # warmup/compile
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:9.2f} ms")
    return dt


img = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))
img2 = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))

timeit("build_pyramid(376x1241)", lambda: build_lk_pyramid(img, levels=3, pad=PAD))

pyr1 = build_lk_pyramid(img, levels=3, pad=PAD)
pyr2 = build_lk_pyramid(img2, levels=3, pad=PAD)
pts = jnp.asarray(
    np.stack([rng.uniform(20, H - 20, CAP), rng.uniform(20, W - 20, CAP)], -1)
    .astype(np.float32))
disp = jnp.zeros((CAP, 2), jnp.float32)
val = jnp.ones((CAP,), bool)

timeit("fb_track lvl3 (1024 pts)", lambda: fb_track(
    pyr1, pyr2, pts, disp, val, levels=3, window=9, max_distance=1.0, pad=PAD))
timeit("fb_track lvl1 (1024 pts)", lambda: fb_track(
    pyr1, pyr2, pts, disp, val, levels=1, window=9, max_distance=1.0, pad=PAD))

occ = jnp.zeros((CAP, 2), jnp.float32)
occv = jnp.zeros((CAP,), bool)
timeit("detect(376x1241)", lambda: detect_keypoints(
    img, occ, occv, cell_size=35, radius=17))

pd1 = jnp.asarray(rng.normal(0, 0.3, (CAP, 2)).astype(np.float32))
pd2 = pd1 + 0.01
px1 = pd1 * 700 + jnp.asarray([600.0, 180.0])
px2 = px1 + 5.0
intr = jnp.asarray(np.array([700, 700, 600, 180], np.float32))
key = jax.random.PRNGKey(0)
nn = jnp.int32(800)
timeit("essential_ransac (256 hyp)", lambda: essential_ransac(
    pd1, pd2, px1, px2, val, nn, intr, key, hypotheses=256, threshold=3.0))

pts3d = jnp.asarray(rng.uniform(-5, 5, (CAP, 3)).astype(np.float32) + np.array([0, 0, 15], np.float32))
bear = pts3d / jnp.linalg.norm(pts3d, axis=-1, keepdims=True)
timeit("p3p_ransac (256 hyp)", lambda: p3p_ransac(
    pts3d, px1, bear, val, nn, intr, key, hypotheses=256, threshold=3.0))

theta0 = jnp.zeros((6,), jnp.float32)
timeit("pnp_refine (1024 pts)", lambda: pnp_refine(
    theta0, pts3d, px1, val, intr, iters1=5, iters2=10, repr_eps=3.0))

timeit("triangulate (1024)", lambda: triangulate_batch(
    px1, px2, jnp.eye(4), jnp.eye(4)))

P, X, O = 8, 1024, 4096
poses0 = jnp.asarray(rng.normal(0, 0.01, (P, 6)).astype(np.float32))
pose_const = jnp.asarray(np.array([True] + [False] * (P - 1)))
points0 = jnp.asarray(rng.uniform(-5, 5, (X, 3)).astype(np.float32) + np.array([0, 0, 15], np.float32))
obs_pose = jnp.asarray(rng.integers(0, P, O).astype(np.int32))
obs_point = jnp.asarray(rng.integers(0, X, O).astype(np.int32))
obs_px = jnp.asarray(rng.uniform(0, 300, (O, 2)).astype(np.float32))
obs_valid = jnp.ones((O,), bool)
timeit("local_ba (8p/1024x/4096o)", lambda: local_bundle_adjustment(
    poses0, pose_const, points0, obs_pose, obs_point, obs_px, obs_valid,
    intr, iters1=5, iters2=10, repr_eps=5.0))
