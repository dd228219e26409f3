"""Microbenchmark the detect_keypoints stages on the live backend.

Round-2 profiling for VERDICT item #2 (mm.extract mean 1.9 s on the
tunnelled v5e). Run: python scripts/profile_extract.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from slamtpu.ops.features import (
    CELL_TOPK,
    brief_describe,
    brief_pattern,
    detect_keypoints,
    shi_tomasi_response,
    _dilate,
)
from slamtpu.ops.image import gaussian_blur, scharr_gradients

H, W = 376, 1241
CELL = 35
RADIUS = 17
CAP = 1024

rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))
occ_px = jnp.asarray(
    np.stack([rng.uniform(0, H, CAP), rng.uniform(0, W, CAP)], -1).astype(
        np.float32
    )
)
occ_val = jnp.asarray(np.ones(CAP, bool))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dt:9.2f} ms")
    return out


@jax.jit
def stage_response(img):
    return shi_tomasi_response(img)


@jax.jit
def stage_scatter(occ_px, occ_val):
    yx = jnp.round(occ_px).astype(jnp.int32)
    yx = jnp.clip(yx, 0, jnp.array([H - 1, W - 1]))
    return jnp.zeros((H, W), jnp.float32).at[yx[:, 0], yx[:, 1]].max(
        occ_val.astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def stage_dilate(occ, radius):
    return _dilate(occ, radius)


@jax.jit
def stage_localmax(resp):
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((resp >= pooled) & (resp > 1e-4), resp, 0.0)


@jax.jit
def stage_topk(resp):
    gy = -(-H // CELL)
    gx = -(-W // CELL)
    padded = jnp.pad(resp, ((0, gy * CELL - H), (0, gx * CELL - W)))
    cells = padded.reshape(gy, CELL, gx, CELL)
    cells = cells.transpose(0, 2, 1, 3).reshape(gy * gx, CELL * CELL)
    return jax.lax.top_k(cells, CELL_TOPK)


print("backend:", jax.default_backend())
resp = timeit("shi_tomasi_response", stage_response, img)
occ = timeit("occupancy scatter", stage_scatter, occ_px, occ_val)
timeit("dilate r=17", stage_dilate, occ, RADIUS)
timeit("local max 3x3", stage_localmax, resp)
timeit("cell top_k", stage_topk, resp)
timeit(
    "detect_keypoints (full)",
    lambda: detect_keypoints(
        img, occ_px, occ_val, cell_size=CELL, radius=RADIUS
    ),
)

pattern = jnp.asarray(brief_pattern())
kp = jnp.asarray(
    np.stack([rng.uniform(20, H - 20, CAP), rng.uniform(20, W - 20, CAP)], -1)
    .astype(np.float32)
)
val = jnp.asarray(np.ones(CAP, bool))
timeit("brief_describe", brief_describe, img, kp, val, pattern)
