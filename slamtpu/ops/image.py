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
    same program as the tracking step, saving a dispatch round trip)."""
    image = image.astype(jnp.float32)
    out = []
    current = image
    for level in range(levels + 1):
        if level > 0:
            h, w = current.shape
            blurred = gaussian_blur(current, sigma)
            current = resize_bilinear(blurred, ((h + 1) // 2, (w + 1) // 2))
        iy, ix = scharr_gradients(current)
        gk = gaussian_kernel_1d(product_sigma)
        gyy = separable_filter(iy * iy, gk, gk)
        gxx = separable_filter(ix * ix, gk, gk)
        gyx = separable_filter(iy * ix, gk, gk)
        stack = jnp.stack([
            jnp.pad(current, pad), jnp.pad(iy, pad), jnp.pad(ix, pad),
            jnp.pad(gyy, pad), jnp.pad(gxx, pad), jnp.pad(gyx, pad),
        ])
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
