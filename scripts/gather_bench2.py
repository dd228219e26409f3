"""Round 2: verify DMA-gather correctness ON TPU and time extraction
variants (masked-shift cascade vs MXU one-hot) against the XLA gather.

Run EXCLUSIVELY. Usage: python scripts/gather_bench2.py
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
    from slamtpu.ops import dma_gather
    from slamtpu.ops.lucas_kanade import lk_pad, LK_PATCH_MARGIN
    from slamtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    h, w, cap = 376, 1241, 1024
    window = 9
    T = 2 * window + 1
    P = T + 1 + 2 * LK_PATCH_MARGIN
    pad = lk_pad(window)
    rng = np.random.default_rng(0)

    img = rng.standard_normal((h, w)).astype(np.float32)
    pyr = build_lk_pyramid(jnp.asarray(img), levels=0, pad=pad)
    stack = pyr[0]["stack"]
    jax.device_get(stack[0, 0, 0])  # materialize + tunnel warm-up

    pts = np.stack(
        [rng.integers(0, h + 2 * pad - T, cap),
         rng.integers(0, w + 2 * pad - T, cap)], -1
    ).astype(np.int32)
    start = jnp.asarray(pts)

    def xla_one(s):
        def one(q):
            return jax.lax.dynamic_slice(stack, (0, q[0], q[1]), (6, T, T))
        return jax.vmap(one)(s)

    def dma_cascade(s):
        sp, xr = dma_gather.dma_span_gather(stack, s, T, T)
        return dma_gather.extract_windows(sp, xr, T)

    def dma_mxu(s):
        sp, xr = dma_gather.dma_span_gather(stack, s, T, T)
        return dma_gather.extract_windows_mxu(sp, xr, T)

    # ---- correctness on the real backend ----
    ref = np.asarray(jax.device_get(jax.jit(xla_one)(start)))
    for name, fn in [("cascade", dma_cascade), ("mxu", dma_mxu)]:
        out = np.asarray(jax.device_get(jax.jit(fn)(start)))
        d = np.abs(out - ref)
        print(f"parity[{name}]: maxabs {d.max():.3e} "
              f"mismatch>1e-6: {(d > 1e-6).sum()}", flush=True)

    # ---- timing (K-chained) ----
    def dep(s, v):
        return s + (v > jnp.float32(1e30)).astype(s.dtype)

    def chained(one, K):
        def g(s):
            acc = jnp.float32(0.0)
            for _ in range(K):
                out = one(s)
                v = jnp.sum(out)
                acc = acc + v
                s = dep(s, v)
            return acc
        return g

    results = {}
    for name, one in [("xla", xla_one), ("cascade", dma_cascade),
                      ("mxu", dma_mxu)]:
        for K in (2, 8):
            fn = jax.jit(chained(one, K))
            t0 = time.perf_counter()
            jax.device_get(fn(start))
            tc = time.perf_counter() - t0
            ts = []
            for _ in range(10):
                t0 = time.perf_counter()
                jax.device_get(fn(start))
                ts.append(time.perf_counter() - t0)
            results[(name, K)] = float(np.median(ts))
            print(f"{name}[{K}] median {1e3 * results[(name, K)]:8.2f} ms "
                  f"(compile {tc:.1f} s)", flush=True)
    print("\nper-op:")
    for name in ["xla", "cascade", "mxu"]:
        per = (results[(name, 8)] - results[(name, 2)]) / 6.0
        print(f"{name:10s} {1e3 * per:8.3f} ms")


if __name__ == "__main__":
    main()
