"""Cost of exact occupancy-dilation + NMS formulations on the real
backend: reduce_window vs shift-max doubling (elementwise maxima of
shifted slices). Run EXCLUSIVELY. Usage: python scripts/dilate_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(name, fn, *args, reps=5):
    import jax

    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {1e3 * sorted(ts)[len(ts) // 2]:8.2f} ms wall",
          flush=True)
    return out


def shift_max_axis(x, radius: int, axis: int):
    """Max over a (2*radius+1) window along axis, zero boundary, via
    log-doubling shifted maxima (jnp.pad + slice shifts)."""
    import jax.numpy as jnp

    def shift(a, off):
        if off == 0:
            return a
        pad = [(0, 0), (0, 0)]
        pad[axis] = (max(off, 0), max(-off, 0))
        padded = jnp.pad(a, pad)
        idx = [slice(None), slice(None)]
        n = a.shape[axis]
        idx[axis] = slice(max(-off, 0), max(-off, 0) + n)
        return padded[tuple(idx)]

    out = x
    covered = 0  # out[i] = max x[i-covered : i+covered+1]
    while covered < radius:
        # A shift by s <= 2*covered+1 keeps the union contiguous.
        s = min(2 * covered + 1, radius - covered)
        out = jnp.maximum(out, jnp.maximum(shift(out, s), shift(out, -s)))
        covered += s
    return out


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.features import _dilate
    from slamtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    h, w = 376, 1241
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    pts = jnp.asarray(
        np.stack(
            [rng.integers(0, h, 1024), rng.integers(0, w, 1024)], -1
        ).astype(np.int32)
    )
    K = 4

    @jax.jit
    def chain_rw(x):
        for _ in range(K):
            x = _dilate(x, 17) * 0.99
        return x

    @jax.jit
    def chain_sm(x):
        for _ in range(K):
            x = shift_max_axis(shift_max_axis(x, 17, 0), 17, 1) * 0.99
        return x

    @jax.jit
    def chain_nms_rw(x):
        for _ in range(K):
            p = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
            )
            x = jnp.where(x >= p, x, 0.0) + 1e-6
        return x

    @jax.jit
    def chain_nms_sm(x):
        for _ in range(K):
            p = shift_max_axis(shift_max_axis(x, 1, 0), 1, 1)
            x = jnp.where(x >= p, x, 0.0) + 1e-6
        return x

    @jax.jit
    def chain_scatter_dilate(x):
        for _ in range(K):
            o = jnp.zeros((h, w), jnp.float32).at[pts[:, 0], pts[:, 1]].max(
                1.0
            )
            d = shift_max_axis(shift_max_axis(o, 17, 0), 17, 1)
            x = x + 1e-6 * d
        return x

    b = t("dilate r17 shift-max", chain_sm, img)
    a = t("dilate r17 reduce_window", chain_rw, img)
    print("dilate parity:", bool(np.allclose(np.asarray(a), np.asarray(b))))
    t("NMS 3x3 shift-max", chain_nms_sm, img)
    t("scatter+shift-max dilate", chain_scatter_dilate, img)

    # shift_max correctness vs reduce_window on the boundary.
    x = jnp.asarray(rng.standard_normal((13, 17)).astype(np.float32))
    r = jax.lax.reduce_window(
        jnp.pad(x, ((0, 0), (0, 0))), -jnp.inf, jax.lax.max,
        (35, 1), (1, 1), "SAME",
    )
    s = shift_max_axis(x, 17, 0)
    # reduce_window SAME uses -inf padding; shift-max uses zero padding —
    # equal wherever the window stays in-bounds or values are >= 0.
    print("small parity (nonneg):", bool(np.allclose(
        np.asarray(jnp.maximum(r, 0.0)), np.asarray(jnp.maximum(s, 0.0))
    )))


if __name__ == "__main__":
    main()
