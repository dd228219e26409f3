"""Attribute the keyframe program's exec milliseconds by static-arg knobs.

Times keyframe_step_carry on the captured production args (scripts/
pallas_ab.py capture) with individually reduced statics — same method as
the round-4 track attribution (PERF.md). The null round trip is the RPC
floor; a knob that drops the round trip pays for the component it guts.

Usage: python scripts/kf_attrib.py
"""
import sys
import time
import pickle

sys.path.insert(0, ".")

from slamtpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from slamtpu.ops.keyframe_step import keyframe_step_carry

CAPTURE = "/tmp/pallas_ab_args.pkl"


def main():
    with open(CAPTURE, "rb") as f:
        stash = pickle.load(f)
    (carry, right_image, state), kw = stash["kf"]
    carry, right_image, state = jax.tree_util.tree_map(
        jnp.asarray, (carry, right_image, state))
    print("statics:", kw, flush=True)

    null_j = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    jax.device_get(null_j(x))

    def time_cfg(name, **overrides):
        k = dict(kw, **overrides)

        def call():
            nc, per_slot, n_new = keyframe_step_carry(
                carry, right_image, state, **k)
            return per_slot, n_new

        t0 = time.perf_counter()
        jax.device_get(call())
        first = time.perf_counter() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            jax.device_get(call())
            ts.append(time.perf_counter() - t0)
        # Interleave a null read to track drift.
        t0 = time.perf_counter()
        jax.device_get(null_j(x))
        null_ms = 1e3 * (time.perf_counter() - t0)
        print(f"{name}: {1e3 * min(ts):.1f} ms RT (first {first:.0f}s, "
              f"null {null_ms:.1f})", flush=True)

    time_cfg("full")
    time_cfg("iters=1", iters=1)
    time_cfg("levels=1", levels=1)
    time_cfg("no-subpix", subpix=False)
    time_cfg("radius=3", radius=3)
    time_cfg("window=7", window=7, pad=9)
    time_cfg("full-again")


if __name__ == "__main__":
    main()
