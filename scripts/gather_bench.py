"""Microbenchmark: decompose the LK level-block cost on the real backend.

Methodology: each stage is repeated K times INSIDE one jit with a runtime
data dependency between repetitions (so XLA cannot CSE or overlap them), and
per-op cost is (t[K=8] - t[K=2]) / 6 — this resolves sub-ms ops under the
~26 ms dispatch+fetch RPC floor.

Compares, at the production workload point (N=1024 lanes, T=19, P=32,
KITTI level-0 maps):
  - windows gather (level-entry (N,6,T,T) stack slice): XLA vs DMA kernel
  - patch gather ((N,P,P) second image): XLA vs DMA kernel
  - the full lane-major LK level block: XLA vs DMA gathers

Run EXCLUSIVELY (no other TPU process). Usage: python scripts/gather_bench.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import slamtpu.ops.lucas_kanade as lk
    from slamtpu.ops.image import build_lk_pyramid
    from slamtpu.ops import dma_gather
    from slamtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    h, w, cap = 376, 1241, 1024
    window = 9
    T = 2 * window + 1
    P = T + 1 + 2 * lk.LK_PATCH_MARGIN
    pad = lk.lk_pad(window)
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

    pyr1 = build_lk_pyramid(jnp.asarray(img), levels=0, pad=pad)
    pyr2 = build_lk_pyramid(jnp.asarray(img2), levels=0, pad=pad)
    d1, d2 = pyr1[0], pyr2[0]
    stack = d1["stack"]
    jax.device_get(stack[0, 0, 0])  # materialize + tunnel warm-up

    pts = np.asarray(centers[:cap], np.float32)
    start_np = (pts - window + pad).astype(np.int32)
    start0 = jnp.asarray(start_np)
    px = jnp.asarray(pts)
    valid = jnp.ones(cap, bool)

    def dep(start, s):
        # Runtime-opaque zero: forces iteration k+1 to wait for k.
        return start + (s > jnp.float32(1e30)).astype(start.dtype)

    def windows_xla_one(start):
        def one(s):
            return jax.lax.dynamic_slice(stack, (0, s[0], s[1]), (6, T, T))
        return jax.vmap(one)(start).transpose(1, 2, 3, 0)

    def windows_dma_one(start):
        return dma_gather.gather_windows(stack, start, T, T).transpose(
            1, 2, 3, 0
        )

    def patches_xla_one(start):
        def one(s):
            return jax.lax.dynamic_slice(d2["img"], (s[0], s[1]), (P, P))
        return jax.vmap(one)(start).transpose(1, 2, 0)

    def patches_dma_one(start):
        return dma_gather.gather_windows(d2["img"][None], start, P, P)[
            :, 0
        ].transpose(1, 2, 0)

    def spans_one(start):
        return dma_gather.dma_span_gather(stack, start, T, T)[0]

    def chained(one, K):
        def g(start):
            acc = jnp.float32(0.0)
            for _ in range(K):
                out = one(start)
                s = jnp.sum(out)
                acc = acc + s
                start = dep(start, s)
            return acc
        return g

    def level_one(use_dma, flow, ok):
        prev = lk.use_dma_gather
        lk.use_dma_gather = lambda: use_dma
        try:
            return lk._lk_level_patch_lanes(
                d1, d2, jnp.asarray(start_np + window - pad), flow, ok,
                hw=(h, w), window=window, iters=30, eps=1e-2,
                eig_thresh=1e-4, pad=pad, min_active=16,
            )
        finally:
            lk.use_dma_gather = prev

    def level_chained(use_dma, K):
        def g(flow, ok):
            for _ in range(K):
                flow, ok = level_one(use_dma, 0.98 * flow, ok)
            return jnp.sum(flow) + jnp.sum(ok)
        return g

    flow0 = jnp.zeros((cap, 2), jnp.float32)

    cases = []
    for name, one in [
        ("windows_xla", windows_xla_one), ("windows_dma", windows_dma_one),
        ("patches_xla", patches_xla_one), ("patches_dma", patches_dma_one),
        ("spans_only", spans_one),
    ]:
        for K in (2, 8):
            cases.append((f"{name}[{K}]", jax.jit(chained(one, K)), (start0,)))
    for name, use_dma in [("level_xla", False), ("level_dma", True)]:
        for K in (2, 8):
            cases.append(
                (f"{name}[{K}]", jax.jit(level_chained(use_dma, K)),
                 (flow0, valid))
            )

    results = {}
    for name, fn, args in cases:
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            ts.append(time.perf_counter() - t0)
        results[name] = float(np.median(ts))
        print(
            f"{name:18s} median {1e3 * results[name]:8.2f} ms   "
            f"(compile+first {t_compile:.1f} s)", flush=True,
        )

    print("\nper-op cost ((t[8] - t[2]) / 6):")
    for name in ["windows_xla", "windows_dma", "patches_xla", "patches_dma",
                 "spans_only", "level_xla", "level_dma"]:
        per = (results[f"{name}[8]"] - results[f"{name}[2]"]) / 6.0
        print(f"{name:18s} {1e3 * per:8.3f} ms")


if __name__ == "__main__":
    main()
