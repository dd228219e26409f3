"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax (with JAX_PLATFORMS=axon) in
every Python process, so env vars set here are too late — use
jax.config.update, which works until backends are initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
