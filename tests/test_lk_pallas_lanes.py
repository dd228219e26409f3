"""Parity of the fused Pallas solver loop (ops/lk_pallas_lanes.py) with the
XLA lane-major LK level kernel — same arithmetic, VMEM-resident
intermediates. Runs under the Pallas interpreter on CPU; the TPU smoke
suite re-checks on the real backend."""
import numpy as np
import pytest

import jax.numpy as jnp

from slamtpu.ops.image import build_lk_pyramid
from slamtpu.ops.lucas_kanade import lk_flow, lk_pad

PAD = lk_pad(9)


def make_texture(h, w, seed=0, n_blobs=300, rng_shift=(0.0, 0.0)):
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


@pytest.mark.parametrize("one_d", [False, True])
def test_fused_solver_matches_xla(monkeypatch, one_d):
    shift = (0.0, 2.7) if one_d else (1.3, -2.2)
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

    def run():
        return lk_flow(
            pyr1, pyr2, jnp.asarray(pts), disp, valid,
            levels=levels, window=9, iters=30, eps=1e-2, eig_thresh=1e-4,
            pad=PAD, one_d=one_d,
        )

    monkeypatch.delenv("SLAMTPU_PALLAS_LK", raising=False)
    flow_x, ok_x = run()
    monkeypatch.setenv("SLAMTPU_PALLAS_LK", "1")
    flow_p, ok_p = run()

    flow_x, ok_x = np.asarray(flow_x), np.asarray(ok_x)
    flow_p, ok_p = np.asarray(flow_p), np.asarray(ok_p)

    assert ok_x.mean() > 0.7
    # Survivor sets agree (identical gate arithmetic).
    assert (ok_x == ok_p).mean() > 0.95
    both = ok_x & ok_p
    err = np.linalg.norm(flow_x[both] - flow_p[both], axis=-1)
    assert np.max(err) < 1e-3
