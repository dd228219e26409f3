"""Is full-image conv cost per-pass overhead or per-element? Times 1-channel
vs batched multi-channel separable conv passes at the KITTI level-0 size.
Run EXCLUSIVELY. Usage: python scripts/conv_bench.py
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
    print(f"{name:40s} {1e3 * sorted(ts)[len(ts) // 2]:8.2f} ms wall",
          flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.image import gaussian_kernel_1d
    from slamtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    h, w = 376, 1241
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    img3 = jnp.asarray(rng.standard_normal((3, h, w)).astype(np.float32))
    gk = np.asarray(gaussian_kernel_1d(4.0))
    print("gaussian_kernel_1d(4.0) taps:", gk.shape[0])
    K = 8

    def conv_nchw(x, kern):
        return jax.lax.conv_general_dilated(
            x[None], kern, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0]

    ky = jnp.asarray(gk, jnp.float32)[None, None, :, None]
    kx = jnp.asarray(gk, jnp.float32)[None, None, None, :]

    @jax.jit
    def chain_c1(x):
        for _ in range(K):
            x = conv_nchw(conv_nchw(x[None], ky)[0][None], kx)[0][None][0]
            x = x[0] * 0.99
            x = x[None][0][None]
        return x

    @jax.jit
    def chain_c1_flat(x):
        y = x[None]  # (1, H, W)
        for _ in range(K):
            y = conv_nchw(conv_nchw(y, ky), kx) * 0.99
        return y

    ky3 = jnp.broadcast_to(ky, (3, 1, gk.shape[0], 1))
    kx3 = jnp.broadcast_to(kx, (3, 1, 1, gk.shape[0]))

    def gconv(x, kern, groups):
        return jax.lax.conv_general_dilated(
            x[None], kern, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
        )[0]

    @jax.jit
    def chain_c3(x):
        for _ in range(K):
            x = gconv(gconv(x, ky3, 3), kx3, 3) * 0.99
        return x

    t("2-pass sep blur C=1 (x8)", chain_c1_flat, img)
    t("2-pass sep blur C=3 grouped (x8)", chain_c3, img3)

    # Parity: grouped C=3 == three C=1 applications.
    one = conv_nchw(conv_nchw(img3[0:1], ky), kx)
    three = gconv(gconv(img3, ky3, 3), kx3, 3)
    print("parity:", np.allclose(np.asarray(one[0]), np.asarray(three[0]),
                                 atol=1e-5))


if __name__ == "__main__":
    main()
