"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver validates multi-chip sharding with
`--xla_force_host_platform_device_count`; tests use the same setup so the
suite runs anywhere (no TPU required).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
