"""On-device A/B matrix for the gated Pallas kernel family (PERF.md r3).

Times the two PRODUCTION fused programs (ops/track_step.py::track_step and
ops/keyframe_step.py::keyframe_step_carry) plus local BA on captured real
inputs, under each kernel gate. The gates are trace-time env switches, so
each config flips the env and jax.clear_caches() to force a retrace.

Usage:
    python scripts/pallas_ab.py capture          # run 18 frames, stash args
    python scripts/pallas_ab.py run base nodetect nodma   # time configs
    python scripts/pallas_ab.py run all
Outputs one line per (config, program): exec wall ms (min of reps) +
first-call (compile) seconds.
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, ".")

from slamtpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

CAPTURE = "/tmp/pallas_ab_args.pkl"

# Surviving kernels only (round-4 matrix results in PERF.md; the eight
# losing kernels — pyr/lk/scalar/eig/p3p/pnp/dlt/solve — were deleted).
# "base" = production defaults (detect Pallas + DMA gather ON on TPU).
GATES = {
    "nodetect": {"SLAMTPU_NO_PALLAS_DETECT": "1"},
    "nodma": {"SLAMTPU_NO_DMA_GATHER": "1"},
}
ALL_KEYS = sorted({k for g in GATES.values() for k in g})


def capture():
    import slamtpu.ops.track_step as ts_mod
    import slamtpu.ops.keyframe_step as ks_mod

    stash = {}
    orig_ts = ts_mod.track_step
    orig_ks = ks_mod.keyframe_step_carry
    counts = {"ts": 0, "ks": 0}

    # Keep device refs only (buffers are immutable); fetch once at the end
    # — a mid-pipeline device_get of the full carry stalls for minutes.
    def ts_hook(*args, **kwargs):
        counts["ts"] += 1
        if counts["ts"] == 10 and "track" not in stash:
            stash["track"] = (args, kwargs)
        return orig_ts(*args, **kwargs)

    def ks_hook(*args, **kwargs):
        counts["ks"] += 1
        if counts["ks"] == 3 and "kf" not in stash:
            stash["kf"] = (args, kwargs)
        return orig_ks(*args, **kwargs)

    ts_mod.track_step = ts_hook
    ks_mod.keyframe_step_carry = ks_hook

    from slamtpu import Params, SlamManager, ReplaySaver
    from slamtpu.datasets.synthetic import make_scene

    scene = make_scene(n_frames=18, height=376, width=1241, n_points=6000,
                       stereo=True, baseline=0.54, seed=7, layout="city")
    sm = SlamManager(
        Params(stereo=True, do_local_bundle_adjustment=True,
               map_filtering=True, sequential=True),
        scene.camera, right_camera=scene.right_camera,
        slam_io=ReplaySaver())
    for i in range(len(scene)):
        l, r = scene.frame(i)
        sm.add_stereo_image(l, r, float(scene.timestamps[i]))
    sm.wait()
    assert "track" in stash and "kf" in stash, (counts, list(stash))
    print("run done, fetching captures...", flush=True)
    t0 = time.perf_counter()
    stash = {k: (jax.device_get(a), kw) for k, (a, kw) in stash.items()}
    print(f"fetched in {time.perf_counter() - t0:.1f}s", flush=True)
    with open(CAPTURE, "wb") as f:
        pickle.dump(stash, f)
    print("captured:", {k: counts[k] for k in counts}, "->", CAPTURE)


def _set_env(gates):
    for k in ALL_KEYS:
        os.environ.pop(k, None)
    os.environ.update(gates)


def _time_call(fn, reps=6):
    """fn must return ONLY what production fetches (per_kp/scalars etc.) —
    device_get of the full carry ships the whole pyramid over the tunnel
    (~1 s) and swamps the exec time. device_get is the only real sync on
    this backend (block_until_ready is a no-op; PERF.md round 2)."""
    t0 = time.perf_counter()
    jax.device_get(fn())
    first = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn())
        ts.append(time.perf_counter() - t0)
    return 1e3 * min(ts), first


def run(configs):
    with open(CAPTURE, "rb") as f:
        stash = pickle.load(f)
    t_args, t_kw = stash["track"]
    k_args, k_kw = stash["kf"]

    # BA inputs at the bench's dominant bucket.
    rng = np.random.default_rng(0)
    P, X, O = 32, 4096, 16384
    ba_np = dict(
        poses=rng.normal(0, 0.01, (P, 6)).astype(np.float32),
        const=np.array([True] + [False] * 7 + [True] * (P - 8)),
        pts=(rng.uniform(-5, 5, (X, 3)) + [0, 0, 15]).astype(np.float32),
        pose_idx=rng.integers(0, 8, O).astype(np.int32),
        pt_idx=rng.integers(0, X, O).astype(np.int32),
        px=rng.uniform(0, 300, (O, 2)).astype(np.float32),
        valid=np.ones((O,), bool),
    )
    intr = np.array([718.0, 718.0, 607.0, 185.0], np.float32)

    results = {}
    for name in configs:
        if name != "base" and name not in GATES:
            raise SystemExit(
                f"unknown config {name!r}; valid: base, "
                + ", ".join(sorted(GATES))
            )
        gates = {} if name == "base" else GATES[name]
        _set_env(gates)
        jax.clear_caches()
        t_args_d = jax.device_put(t_args)
        k_args_d = jax.device_put(k_args)

        import slamtpu.ops.track_step as ts_mod
        import slamtpu.ops.keyframe_step as ks_mod
        from slamtpu.ops.ba import local_bundle_adjustment

        row = {}
        try:
            ms, first = _time_call(
                lambda: ts_mod.track_step(*t_args_d, **t_kw)[1:])
            row["track_ms"] = round(ms, 2)
            row["track_compile_s"] = round(first, 1)
        except Exception as e:  # noqa: BLE001
            row["track_ms"] = f"FAIL: {type(e).__name__}: {e}"[:120]
        try:
            ms, first = _time_call(
                lambda: ks_mod.keyframe_step_carry(*k_args_d, **k_kw)[1:])
            row["kf_ms"] = round(ms, 2)
            row["kf_compile_s"] = round(first, 1)
        except Exception as e:  # noqa: BLE001
            row["kf_ms"] = f"FAIL: {type(e).__name__}: {e}"[:120]
        # BA has no surviving gated kernel variants — time it once under
        # base as the cross-run anchor.
        if name == "base":
            ba = {k: jnp.asarray(v) for k, v in ba_np.items()}
            try:
                ms, first = _time_call(lambda: local_bundle_adjustment(
                    ba["poses"], ba["const"], ba["pts"], ba["pose_idx"],
                    ba["pt_idx"], ba["px"], ba["valid"], jnp.asarray(intr),
                    iters1=5, iters2=10, repr_eps=5.0), reps=3)
                row["ba_ms"] = round(ms, 2)
                row["ba_compile_s"] = round(first, 1)
            except Exception as e:  # noqa: BLE001
                row["ba_ms"] = f"FAIL: {type(e).__name__}: {e}"[:120]
        results[name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    if sys.argv[1] == "capture":
        capture()
    else:
        names = sys.argv[2:]
        if names == ["all"]:
            names = ["base"] + sorted(GATES)
        run(names)
