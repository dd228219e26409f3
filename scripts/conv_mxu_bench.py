"""Separable conv as banded-matrix MXU matmuls vs conv_general_dilated.
A 1-D SAME conv along an axis is a banded (N, N) matrix product; both
passes of a separable blur become two matmuls that ride the MXU instead
of the slow single-channel conv path. Run EXCLUSIVELY.
Usage: python scripts/conv_mxu_bench.py
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


def band_matrix(n: int, kernel: np.ndarray) -> np.ndarray:
    """(n, n) matrix B with (B @ x) == SAME zero-pad conv of x by kernel."""
    k = len(kernel)
    r = k // 2
    b = np.zeros((n, n), np.float32)
    for i in range(n):
        for j, kv in enumerate(kernel):
            s = i + j - r
            if 0 <= s < n:
                b[i, s] = kv
    return b


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.image import gaussian_kernel_1d
    from slamtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    h, w = 376, 1241
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    gk = np.asarray(gaussian_kernel_1d(4.0), np.float32)
    by = jnp.asarray(band_matrix(h, gk))
    bx = jnp.asarray(band_matrix(w, gk).T)
    K = 8

    def conv_nchw(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    ky = jnp.asarray(gk)[None, None, :, None]
    kx = jnp.asarray(gk)[None, None, None, :]

    @jax.jit
    def chain_conv(x):
        y = x[None, None]
        for _ in range(K):
            y = conv_nchw(conv_nchw(y, ky), kx) * 0.99
        return y[0]

    @jax.jit
    def chain_mxu(x):
        for _ in range(K):
            x = (by @ x @ bx) * 0.99
        return x

    @jax.jit
    def chain_mxu_hi(x):
        for _ in range(K):
            x = jnp.dot(
                jnp.dot(by, x, precision=jax.lax.Precision.HIGHEST), bx,
                precision=jax.lax.Precision.HIGHEST,
            ) * 0.99
        return x

    r1 = t("2-pass 25-tap blur conv (x8)", chain_conv, img)
    r2 = t("2-pass blur banded-MXU default (x8)", chain_mxu, img)
    r3 = t("2-pass blur banded-MXU HIGHEST (x8)", chain_mxu_hi, img)

    a = np.asarray(r1)[0]
    print("max |conv - mxu_default|:", float(np.abs(a - r2).max()))
    print("max |conv - mxu_highest|:", float(np.abs(a - r3).max()))


if __name__ == "__main__":
    main()
