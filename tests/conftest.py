"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax (with JAX_PLATFORMS=axon) in
every Python process, so env vars set here are too late — use
jax.config.update, which works until backends are initialized.

SLAMTPU_TPU_TESTS=1 keeps the real backend (axon TPU tunnel) so the
`-m tpu` smoke subset (tests/test_tpu_smoke.py) can catch the
CPU-green/TPU-broken class of bugs (bf16 MXU corruption, no-op sync):

    SLAMTPU_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
"""
import os

if os.environ.get("SLAMTPU_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)


def pytest_collection_modifyitems(config, items):
    """Without SLAMTPU_TPU_TESTS, skip tpu-marked tests (they assert the
    real backend); with it, run ONLY those (the rest assume the CPU mesh)."""
    import pytest

    tpu_mode = os.environ.get("SLAMTPU_TPU_TESTS") == "1"
    skip_tpu = pytest.mark.skip(reason="needs SLAMTPU_TPU_TESTS=1")
    skip_cpu = pytest.mark.skip(reason="CPU-mesh test skipped in TPU mode")
    for item in items:
        is_tpu = "tpu" in item.keywords
        if tpu_mode and not is_tpu:
            item.add_marker(skip_cpu)
        elif not tpu_mode and is_tpu:
            item.add_marker(skip_tpu)
