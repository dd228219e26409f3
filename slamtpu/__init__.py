"""slamtpu — a TPU-native visual SLAM framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of pxl-th/SLAM.jl (keyframe-based
indirect visual SLAM: pyramidal KLT tracking, essential/PnP RANSAC,
triangulation, covisibility-windowed bundle adjustment) designed for TPU:
batched fixed-shape device kernels under jit, host pipeline for map state.
"""

from .params import Params
from .camera import Camera

__all__ = [
    "Params",
    "Camera",
    "SlamManager",
    "ReplaySaver",
]


def __getattr__(name):
    # Lazy imports keep `import slamtpu` light (no jax import) for tooling.
    if name == "SlamManager":
        from .models.slam_manager import SlamManager
        return SlamManager
    if name == "ReplaySaver":
        from .io.saver import ReplaySaver
        return ReplaySaver
    raise AttributeError(name)
