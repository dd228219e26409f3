"""Does multi-frame batching beat the per-frame RPC floor on the tunnel?

PERF.md round 4: steady city is ~51 ms/frame while track exec is ~21 ms
and the null round trip is 26-33 ms — suggesting each frame pays an RPC
even with the depth-4 pipeline in flight. If the tunnel serializes
dispatch round trips, folding K chained track steps into ONE program
(one dispatch + one fetch per K frames) amortizes the floor across K.
This measures exactly that on the captured production track args.

Configs (all chained through the carry, same image every step):
  null  - dispatch+fetch of a trivial jit: the RPC floor
  a     - production shape: 1 dispatch/frame, fetch (i - DEPTH) each iter
  b     - like a, but fetch two pending frames every 2nd iter
  c2    - pair program: 2 track steps per dispatch, both outputs fetched
  c4    - quad program

Usage: python scripts/rpc_batch_ab.py [null a b c2 c4]
Requires /tmp/pallas_ab_args.pkl (scripts/pallas_ab.py capture).
"""
import sys
import time
import pickle
from collections import deque
from functools import partial

sys.path.insert(0, ".")

from slamtpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from slamtpu.ops.track_step import track_step

CAPTURE = "/tmp/pallas_ab_args.pkl"
FRAMES = 24
DEPTH = 3          # in-flight window, matches pipeline_depth-1
REPS = 3


def _load():
    with open(CAPTURE, "rb") as f:
        stash = pickle.load(f)
    (carry, image, dt, key), kw = stash["track"]
    dev = jax.tree_util.tree_map(jnp.asarray, (carry, image, dt, key))
    return (*dev, kw)


def _start_d2h(bufs):
    for b in jax.tree_util.tree_leaves(bufs):
        try:
            b.copy_to_host_async()
        except Exception:
            pass


def _loop(dispatch, fetch_every, carry, image, dt, key, k_per_dispatch=1):
    """Pipeline: dispatch, keep DEPTH dispatches in flight, fetch oldest.
    Returns wall seconds for FRAMES frames."""
    n_disp = FRAMES // k_per_dispatch
    pending = deque()
    t0 = time.perf_counter()
    for i in range(n_disp):
        carry, outs = dispatch(carry, image, dt, key)
        _start_d2h(outs)
        pending.append(outs)
        while len(pending) > DEPTH and (i % fetch_every) == fetch_every - 1:
            jax.device_get(pending.popleft())
    while pending:
        jax.device_get(pending.popleft())
    jax.device_get(carry["misc"])
    return time.perf_counter() - t0


def main(configs):
    carry, image, dt, key, kw = _load()
    step = partial(track_step, **kw)

    def one(c, img, d, k):
        nc, pk, sc = step(c, img, d, k)
        return nc, (pk, sc)

    def make_multi(n):
        def multi(c, img, d, k):
            outs = []
            for _ in range(n):
                c, pk, sc = step(c, img, d, k)
                outs.append((pk, sc))
            return c, tuple(outs)
        return jax.jit(multi)

    one_j = jax.jit(one)
    null_j = jax.jit(lambda x: x + 1.0)

    results = {}
    for name in configs:
        if name == "null":
            x = jnp.float32(0.0)
            jax.device_get(null_j(x))
            ts = []
            for _ in range(12):
                t0 = time.perf_counter()
                jax.device_get(null_j(x))
                ts.append(time.perf_counter() - t0)
            results["null_ms"] = round(1e3 * min(ts), 1)
            print(f"null round trip: {results['null_ms']} ms", flush=True)
            continue
        if name in ("a", "b"):
            fn, fe, kpd = one_j, (1 if name == "a" else 2), 1
        elif name == "c2":
            fn, fe, kpd = make_multi(2), 1, 2
        elif name == "c4":
            fn, fe, kpd = make_multi(4), 1, 4
        else:
            raise SystemExit(f"unknown config {name!r}")
        # Warm (compile) outside the timed reps.
        t0 = time.perf_counter()
        _loop(fn, fe, carry, image, dt, key, kpd)
        compile_s = time.perf_counter() - t0
        walls = [_loop(fn, fe, carry, image, dt, key, kpd)
                 for _ in range(REPS)]
        ms = 1e3 * min(walls) / FRAMES
        results[name] = round(ms, 1)
        print(f"{name}: {ms:.1f} ms/frame (first {compile_s:.0f}s, "
              f"walls {[round(1e3 * w / FRAMES, 1) for w in walls]})",
              flush=True)
    print(results)


if __name__ == "__main__":
    main(sys.argv[1:] or ["null", "a", "b", "c2", "a", "c4", "null"])
