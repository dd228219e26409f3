"""Image-processing kernels: separable Gaussian/Scharr filtering, Gaussian
pyramids, and the LK pyramid bundle (image + gradients + smoothed gradient
products), all as batched XLA programs.

TPU-native replacement for reference src/optical_flow/pyramid.jl and the
ImageFiltering.jl usage. Differences by design:
  - FIR Gaussians instead of IIRGaussian (same sigma; radius = ceil(3*sigma)).
  - Gradient products are smoothed (sigma=4, pyramid.jl -> lucas_kanade.jl:112)
    and kept as dense maps; the LK kernel recomputes windowed box-sums with
    masks each iteration instead of using integral images — on TPU the masked
    reduction over a gathered window is cheaper and exactly equivalent to the
    reference's integral-image boxdiff.
  - Every level is zero-padded by `pad` on all sides so the LK kernel's
    dynamic-slice gathers never clamp; validity masks implement the
    reference's window clamping semantics (lucas_kanade.jl:199-208).

Pyramid levels are a tuple of dicts (a pytree), one entry per level:
  {"img", "Iy", "Ix", "Gyy", "Gxx", "Gyx"}  all (H_l + 2*pad, W_l + 2*pad).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv1d(img, kernel: np.ndarray, axis: int):
    """Separable 1D convolution along `axis` with zero ('same') padding."""
    k = jnp.asarray(kernel)
    if axis == 0:
        kern = k[:, None]
    else:
        kern = k[None, :]
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kern[None, None, :, :],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def separable_filter(img, ky: np.ndarray, kx: np.ndarray):
    return _conv1d(_conv1d(img, ky, 0), kx, 1)


def gaussian_blur(img, sigma: float):
    k = gaussian_kernel_1d(sigma)
    return separable_filter(img, k, k)


# Normalized Scharr derivative kernels (reference pyramid.jl:98-103 uses
# KernelFactors.scharr): smoothing [3, 10, 3]/16 x derivative [-1, 0, 1]/2.
_SCHARR_SMOOTH = np.array([3.0, 10.0, 3.0], dtype=np.float32) / 16.0
_SCHARR_DERIV = np.array([-1.0, 0.0, 1.0], dtype=np.float32) / 2.0


def scharr_gradients(img):
    """Returns (Iy, Ix) with zero-fill borders."""
    iy = separable_filter(img, _SCHARR_DERIV, _SCHARR_SMOOTH)
    ix = separable_filter(img, _SCHARR_SMOOTH, _SCHARR_DERIV)
    return iy, ix


def resize_bilinear(img, shape):
    return jax.image.resize(img, shape, method="linear")


def _conv_spread(img, kys: np.ndarray):
    """img (H, W) -> (C, H, W): one vertical SAME conv per kernel row of
    kys (C, kh). Single conv op — C outputs share one pass over the image."""
    kern = jnp.asarray(kys, jnp.float32)[:, None, :, None]
    return jax.lax.conv_general_dilated(
        img[None, None], kern, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]


def _conv_grouped(x, ks: np.ndarray, axis: int):
    """x (C, H, W) -> per-channel SAME conv along `axis`, channel c using
    kernel row ks[c]. One grouped conv op instead of C separate passes —
    full-image conv cost on this backend is per-pass overhead-bound
    (scripts/conv_bench.py: C=3 grouped = 0.66x of three C=1 passes)."""
    c = x.shape[0]
    k = jnp.asarray(ks, jnp.float32)
    kern = k[:, None, :, None] if axis == 0 else k[:, None, None, :]
    return jax.lax.conv_general_dilated(
        x[None], kern, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )[0]


def _pad_center(kernel: np.ndarray, taps: int) -> np.ndarray:
    """Zero-pad a centered odd-length 1-D kernel to `taps` (odd, >= len):
    SAME conv output is unchanged (zero taps contribute nothing)."""
    extra = (taps - len(kernel)) // 2
    return np.pad(kernel, (extra, extra))


def pyramid_shapes(height: int, width: int, levels: int):
    """Level sizes: ceil halving per level (reference gaussian_pyramid)."""
    shapes = [(height, width)]
    for _ in range(levels):
        h, w = shapes[-1]
        shapes.append(((h + 1) // 2, (w + 1) // 2))
    return shapes


def lk_pyramid_impl(image, *, levels: int, sigma: float = 1.0, pad: int = 11,
                    product_sigma: float = 4.0):
    """Unjitted pyramid builder — callable from inside larger fused programs
    (e.g. ops/frontend_step.py builds the current frame's pyramid in the
    same program as the tracking step, saving a dispatch round trip).

    A fused Pallas level kernel existed behind SLAMTPU_PALLAS_PYR but
    measured neutral on device (round-4 A/B: track 47.5 vs 45-49 ms base)
    and was deleted — the grouped-conv batching below already amortizes
    the per-pass overhead."""
    image = image.astype(jnp.float32)
    out = []
    current = image
    gk = gaussian_kernel_1d(product_sigma)
    lk = gaussian_kernel_1d(sigma)
    taps = max(len(gk), len(lk))
    gk_w, lk_w = _pad_center(gk, taps), _pad_center(lk, taps)
    scharr_y = np.stack([_SCHARR_DERIV, _SCHARR_SMOOTH])
    scharr_x = np.stack([_SCHARR_SMOOTH, _SCHARR_DERIV])
    blurred_next = None
    for level in range(levels + 1):
        if level > 0:
            h, w = current.shape
            current = resize_bilinear(
                blurred_next, ((h + 1) // 2, (w + 1) // 2)
            )
        # Batched Scharr: one 2-channel vertical pass + one grouped
        # horizontal pass instead of four single-channel convs.
        g = _conv_grouped(_conv_spread(current, scharr_y), scharr_x, 1)
        iy, ix = g[0], g[1]
        # Product blurs (and, below the top level, the next level's image
        # blur — its shorter kernel zero-padded to the same tap count) as
        # ONE grouped separable pass over 3-4 channels.
        prods = jnp.stack([iy * iy, ix * ix, iy * ix])
        if level < levels:
            x4 = jnp.concatenate([prods, current[None]])
            ks = np.stack([gk_w, gk_w, gk_w, lk_w])
            sm = _conv_grouped(_conv_grouped(x4, ks, 0), ks, 1)
            gyy, gxx, gyx, blurred_next = sm[0], sm[1], sm[2], sm[3]
        else:
            ks = np.stack([gk, gk, gk])
            sm = _conv_grouped(_conv_grouped(prods, ks, 0), ks, 1)
            gyy, gxx, gyx = sm[0], sm[1], sm[2]
        stack = jnp.pad(
            jnp.stack([current, iy, ix, gyy, gxx, gyx]),
            ((0, 0), (pad, pad), (pad, pad)),
        )
        padded = {
            # One (6, Hp, Wp) stack: the LK prelude gathers every map for a
            # point in a single dynamic slice (gather latency dominates on
            # the tunnel-attached device).
            "stack": stack,
            "img": stack[0],
            "Iy": stack[1],
            "Ix": stack[2],
            "Gyy": stack[3],
            "Gxx": stack[4],
            "Gyx": stack[5],
        }
        out.append(padded)
    return tuple(out)


@functools.partial(
    jax.jit, static_argnames=("levels", "sigma", "pad", "product_sigma")
)
def build_lk_pyramid(image, *, levels: int, sigma: float = 1.0, pad: int = 11,
                     product_sigma: float = 4.0):
    """Image (H, W) float32 in [0, 1] -> LK pyramid pytree.

    One fused XLA program per image; mirrors reference LKPyramid
    (pyramid.jl:40-79): Gaussian pyramid, Scharr gradients, and
    sigma=4-smoothed gradient products per level.
    """
    return lk_pyramid_impl(
        image, levels=levels, sigma=sigma, pad=pad,
        product_sigma=product_sigma,
    )


def pyramid_level_shape(level: dict, pad: int):
    h, w = level["img"].shape
    return h - 2 * pad, w - 2 * pad
