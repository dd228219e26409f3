"""Device kernels (JAX/XLA/Pallas): geometry, image processing, tracking,
multiview estimation, and bundle adjustment."""
