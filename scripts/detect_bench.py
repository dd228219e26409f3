"""Apportion the fused keyframe program's detection cost on the real
backend: shi-tomasi response, occupancy dilation, 3x3 NMS pool, and the
per-cell top-k (lax.top_k vs an iterative argmax). Each piece is timed by
chaining K dependent calls inside one jit and fetching once, so the ~26 ms
RPC amortizes. Run EXCLUSIVELY. Usage: python scripts/detect_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, reps=5):
    import jax

    out = jax.device_get(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:34s} {1e3 * med:8.2f} ms wall (K-chain; ~26ms RPC incl.)",
          flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.features import CELL_TOPK, _dilate, shi_tomasi_response
    from slamtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    h, w = 376, 1241
    cell = 35
    K = 8
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    occ_px = jnp.asarray(
        rng.uniform(0, [h - 1, w - 1], (1024, 2)).astype(np.float32)
    )

    gy, gx = -(-h // cell), -(-w // cell)

    @jax.jit
    def chain_resp(x):
        for _ in range(K):
            x = shi_tomasi_response(x) + 1e-6 * x
        return x

    @jax.jit
    def chain_dilate(x):
        for _ in range(K):
            x = _dilate(x, 17) * 0.5
        return x

    @jax.jit
    def chain_nms(x):
        for _ in range(K):
            pooled = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
            )
            x = jnp.where((x >= pooled), x, 0.0) + 1e-6
        return x

    def cells_of(x):
        padded = jnp.pad(x, ((0, gy * cell - h), (0, gx * cell - w)))
        c = padded.reshape(gy, cell, gx, cell)
        return c.transpose(0, 2, 1, 3).reshape(gy * gx, cell * cell)

    @jax.jit
    def chain_topk(x):
        acc = 0.0
        c = cells_of(x)
        for _ in range(K):
            vals, idx = jax.lax.top_k(c, CELL_TOPK)
            acc = acc + jnp.sum(vals)
            c = c + 1e-6 * acc
        return acc

    def iter_topk(c, k):
        vals, idxs = [], []
        cols = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
        for _ in range(k):
            m = jnp.max(c, axis=1)
            i = jnp.argmax(c, axis=1)
            vals.append(m)
            idxs.append(i)
            c = jnp.where(cols == i[:, None], -jnp.inf, c)
        return jnp.stack(vals, -1), jnp.stack(idxs, -1)

    @jax.jit
    def chain_itopk(x):
        acc = 0.0
        c = cells_of(x)
        for _ in range(K):
            vals, idx = iter_topk(c, CELL_TOPK)
            acc = acc + jnp.sum(vals)
            c = c + 1e-6 * acc
        return acc

    @jax.jit
    def chain_scatter(x):
        for _ in range(K):
            yx = jnp.round(occ_px + x[0, 0]).astype(jnp.int32)
            yx = jnp.clip(yx, 0, jnp.array([h - 1, w - 1]))
            o = jnp.zeros((h, w), jnp.float32).at[yx[:, 0], yx[:, 1]].max(1.0)
            x = x + 1e-6 * o
        return x

    print(f"chains of K={K}; per-piece cost ~= (wall - 26ms) / {K}")
    timeit("shi_tomasi_response", chain_resp, img)
    timeit("occupancy scatter", chain_scatter, img)
    timeit("dilate r=17 (35x35 sep maxpool)", chain_dilate, img)
    timeit("3x3 NMS pool", chain_nms, img)
    timeit("lax.top_k(396x1225, 8)", chain_topk, img)
    timeit("iterative argmax top-8", chain_itopk, img)

    # Parity of the two top-k forms on the real response map.
    resp = shi_tomasi_response(img)
    c = cells_of(resp)
    v1, i1 = jax.device_get(jax.lax.top_k(c, CELL_TOPK))
    v2, i2 = jax.device_get(iter_topk(c, CELL_TOPK))
    print("topk parity: vals", np.allclose(v1, v2), "idx", (i1 == i2).mean())


if __name__ == "__main__":
    main()
