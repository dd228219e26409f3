"""End-to-end SLAM benchmark.

Runs the full stereo pipeline (front-end tracking + mapping + local BA) at
the KITTI workload point (1241x376 grayscale, 1000-keypoint budget,
reference defaults) and reports steady-state end-to-end FPS.

Uses KITTI odometry seq 05 if available (env KITTI_DIR or ./data/kitti),
otherwise a synthetic KITTI-sized stereo scene with exact ground truth.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = fps / 60 (BASELINE.json north star: >= 60 FPS on one v5e).

The primary metric is the city-layout stereo run; the same line carries a
`slab` block (the round-1/2 layout, for cross-round comparability) and a
`mono` block (the reference is monocular-first). BENCH_EXTRAS=0 skips the
extra runs for quick iteration. FPS is wall-clock over the steady span
INCLUDING the final pipeline drain (no in-flight frames excluded).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "60"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "15"))


def measure_rpc_floor(reps: int = 7) -> float:
    """Null-jit device round trip (dispatch + fetch of a tiny program), the
    per-RPC floor of the tunnel backend at bench time. Recorded in the
    output JSON so cross-round FPS comparisons can be normalized against
    tunnel drift (VERDICT r4 weak #4)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    f(x).block_until_ready()  # compile outside the timed reps
    # The FIRST device->host fetch of a fresh process can stall for minutes
    # (remote-helper warm-up, PERF.md) — absorb it outside the timed reps.
    np.asarray(f(x))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        samples.append((time.perf_counter() - t0) * 1000.0)
    return round(float(np.median(samples)), 2)


def prewarm_ba(camera):
    """Compile the BA bucket variants the run will hit, outside the timed
    window (the map grows through X/O padding buckets)."""
    import jax.numpy as jnp
    from slamtpu.ops.ba import local_bundle_adjustment_packed

    rng = np.random.default_rng(0)
    intr = np.asarray(camera.intrinsics_array(), np.float32)
    for P, X, O in ((16, 2048, 8192), (16, 4096, 16384),
                    (32, 2048, 8192), (32, 4096, 16384)):
        buf = np.zeros(P * 7 + X * 3 + O * 5 + 4, np.float32)
        o = 0
        buf[o:o + P * 6] = rng.normal(0, 0.01, P * 6)
        o += P * 6
        buf[o:o + P] = np.array([1.0] + [0.0] * 7 + [1.0] * (P - 8))
        o += P
        buf[o:o + X * 3] = (
            rng.uniform(-5, 5, (X, 3)) + [0, 0, 15]).ravel()
        o += X * 3
        buf[o:o + O] = rng.integers(0, 8, O)
        o += O
        buf[o:o + O] = rng.integers(0, X, O)
        o += O
        buf[o:o + O * 2] = rng.uniform(0, 300, O * 2)
        o += O * 2
        buf[o:o + O] = 1.0
        o += O
        buf[o:o + 4] = intr
        res = local_bundle_adjustment_packed(
            jnp.asarray(buf), P=P, X=X, O=O,
            iters1=5, iters2=10, repr_eps=5.0,
        )
        res["final_cost"].block_until_ready()


def load_kitti_frames():
    from slamtpu import Camera

    kitti_dir = os.environ.get("KITTI_DIR", "data/kitti")
    seq = os.environ.get("KITTI_SEQ", "05")
    if not os.path.isdir(os.path.join(kitti_dir, "sequences", seq)):
        return None
    from slamtpu.datasets.kitti import load_kitti

    ds = load_kitti(kitti_dir, seq, stereo=True)
    fx, fy = ds.K[0, 0], ds.K[1, 1]
    cx, cy = ds.K[0, 2], ds.K[1, 2]
    camera = Camera(fx, fy, cx, cy, ds.height, ds.width)
    right_camera = Camera(fx, fy, cx, cy, ds.height, ds.width, Ti0=ds.Ti0)
    n = min(N_FRAMES, len(ds))
    frames = [ds[i] for i in range(n)]
    times = ds.timestamps[:n]
    gt = ds.ground_truth_positions()[:n] if ds.poses else None
    return f"kitti{seq}", camera, right_camera, frames, times, gt


def load_synthetic(layout: str):
    from slamtpu.datasets.synthetic import make_scene

    scene = make_scene(
        n_frames=N_FRAMES, height=376, width=1241, n_points=6000,
        stereo=True, baseline=0.54, seed=7, layout=layout,
    )
    frames = [scene.frame(i) for i in range(len(scene))]
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])
    return (f"synthetic_{layout}", scene.camera, scene.right_camera,
            frames, scene.timestamps, gt)


def make_params(stereo: bool, threaded: bool):
    from slamtpu import Params

    params = Params(stereo=stereo, do_local_bundle_adjustment=True,
                    map_filtering=True, sequential=not threaded)
    # A/B knobs (see PERF.md):
    if os.environ.get("BENCH_PIPELINED"):
        params.pipelined = os.environ["BENCH_PIPELINED"] == "1"
    if os.environ.get("BENCH_KF_BYPASS"):
        params.kf_parallax_bypass_stereo = os.environ["BENCH_KF_BYPASS"] == "1"
    if os.environ.get("BENCH_LK_MIN_ACTIVE"):
        params.lk_min_active = int(os.environ["BENCH_LK_MIN_ACTIVE"])
    if os.environ.get("BENCH_LK_ITERS"):
        params.lk_iterations = int(os.environ["BENCH_LK_ITERS"])
    if os.environ.get("BENCH_BA_WINDOW"):
        params.ba_window = int(os.environ["BENCH_BA_WINDOW"])
    if os.environ.get("BENCH_MAP_FILTERING"):
        params.map_filtering = os.environ["BENCH_MAP_FILTERING"] == "1"
    if os.environ.get("BENCH_DEPTH"):
        params.pipeline_depth = int(os.environ["BENCH_DEPTH"])
    if os.environ.get("BENCH_HYP"):
        params.ransac_essential_hypotheses = int(os.environ["BENCH_HYP"])
        params.ransac_pnp_hypotheses = int(os.environ["BENCH_HYP"])
    if os.environ.get("BENCH_ASYNC_KF"):
        params.async_keyframe = os.environ["BENCH_ASYNC_KF"] == "1"
    if os.environ.get("BENCH_STEREO_1D"):
        params.stereo_klt_1d = os.environ["BENCH_STEREO_1D"] == "1"
    if os.environ.get("BENCH_SUBPIX"):
        params.subpixel_detect = os.environ["BENCH_SUBPIX"] == "1"
    if os.environ.get("BENCH_SPEC_KF"):
        params.speculate_keyframes = os.environ["BENCH_SPEC_KF"] == "1"
    if os.environ.get("BENCH_PAIR_FETCH"):
        params.pair_fetch = os.environ["BENCH_PAIR_FETCH"] == "1"
    if os.environ.get("BENCH_FETCH_BATCH"):
        params.fetch_batch = int(os.environ["BENCH_FETCH_BATCH"])
    if os.environ.get("BENCH_TRACK_PREFETCH"):
        params.track_prefetch = os.environ["BENCH_TRACK_PREFETCH"] == "1"
    return params


def run_once(loaded, stereo: bool, threaded: bool) -> dict:
    """One full run; returns fps/ate/keyframes. FPS is wall-clock over the
    steady frames (warmup excluded) INCLUDING the final drain."""
    from slamtpu.eval.ate import ate_rmse
    from slamtpu.io.saver import ReplaySaver
    from slamtpu.models.slam_manager import SlamManager

    name, camera, right_camera, frames, times, gt = loaded
    params = make_params(stereo, threaded)
    saver = ReplaySaver()
    sm = SlamManager(params, camera,
                     right_camera=right_camera if stereo else None,
                     slam_io=saver)
    prewarm_ba(camera)

    def feed(i):
        left, right = frames[i]
        if stereo:
            sm.add_stereo_image(left, right, float(times[i]))
        else:
            sm.add_image(left, float(times[i]))

    if threaded:
        # Reference-style 3-stage pipeline: warm up (compiles) lock-step,
        # then measure wall time with bounded in-flight backpressure.
        for i in range(min(WARMUP, len(frames))):
            feed(i)
            while sm.get_queue_size() > 0:
                time.sleep(0.005)
        t0 = time.perf_counter()
        for i in range(WARMUP, len(frames)):
            while sm.get_queue_size() >= 2:  # bounded backpressure
                time.sleep(0.002)
            feed(i)
        sm.wait()
        elapsed = time.perf_counter() - t0
    else:
        for i in range(min(WARMUP, len(frames))):
            feed(i)
        # Drain in-flight warmup frames so the timed span owns the pipeline.
        sm.finish()
        t0 = time.perf_counter()
        for i in range(WARMUP, len(frames)):
            feed(i)
        sm.finish()  # final drain included in the timed span
        elapsed = time.perf_counter() - t0
    steady_n = max(len(frames) - WARMUP, 1)
    fps = steady_n / elapsed

    sm.wait()  # apply deferred optimization results

    out = {"fps": round(fps, 2), "frames": len(frames),
           "n_keyframes": sm.map_manager.nb_keyframes, "scene": name}
    if gt is not None and len(saver.trajectory_xyz()) == len(gt):
        try:
            # Monocular trajectories have gauge freedom in scale (the
            # bootstrap guesses it from the motion model) — align it, as
            # standard for mono ATE. Stereo/metric runs stay unaligned.
            out["ate_rmse_m"] = round(
                ate_rmse(saver.trajectory_xyz().astype(np.float64), gt,
                         align_scale=not stereo), 4)
        except Exception:
            pass
    out["removal_causes"] = dict(sm.front_end.removal_counts)
    cand = sm.front_end.gate_candidates
    out["gate_rates"] = {
        k: round(v / cand[k], 4) if cand.get(k) else None
        for k, v in sm.front_end.removal_counts.items()
    }
    out["gate_candidates"] = dict(cand)
    return out


def main():
    from slamtpu.utils.profiling import TIMERS

    threaded = os.environ.get("BENCH_MODE", "sequential") == "threaded"
    extras = os.environ.get("BENCH_EXTRAS", "1") == "1"
    layout = os.environ.get("BENCH_LAYOUT", "city")

    kitti = load_kitti_frames()
    primary_loaded = kitti if kitti is not None else load_synthetic(layout)

    rpc_floor = measure_rpc_floor()
    print(f"rpc_floor_ms: {rpc_floor}", file=sys.stderr)

    # This box has ONE cpu: any concurrent python process (a test suite, a
    # CPU-backend diagnostic) steals the host half of the pipeline and
    # halves the measured FPS (PERF.md r5: interleaved A/B at 6 FPS under
    # 3 concurrent jobs vs 14-19 alone). Record the load so contaminated
    # runs are self-documenting.
    load_1m = os.getloadavg()[0]
    if load_1m > 0.5:
        print(f"WARNING: loadavg {load_1m:.2f} > 0.5 — another process is "
              "competing for the single CPU; FPS will be depressed.",
              file=sys.stderr)

    # The tunnel backend drifts ±20-40% between phases (PERF.md measurement
    # hygiene): run the primary scene n_runs times in one process (compiles
    # cached after run 1) and report median + min + per-run values so
    # cross-round comparisons are interpretable (VERDICT r4 weak #4).
    n_runs = max(1, int(os.environ.get("BENCH_RUNS", "3")))
    runs = []
    primary = None
    for k in range(n_runs):
        if k:
            TIMERS.reset()
        primary = run_once(primary_loaded, stereo=True, threaded=threaded)
        runs.append(primary["fps"])
        print(f"run {k + 1}/{n_runs}: {primary['fps']} fps "
              f"(ate {primary.get('ate_rmse_m')}, "
              f"{primary['n_keyframes']} KFs)", file=sys.stderr)
    print("stage timers:", json.dumps(TIMERS.summary()), file=sys.stderr)
    print("removal causes:",
          json.dumps(primary.pop("removal_causes", {})), file=sys.stderr)
    print("gate rates:", json.dumps(primary.get("gate_rates", {})),
          "candidates:", json.dumps(primary.pop("gate_candidates", {})),
          file=sys.stderr)
    primary.pop("fps")

    result = {
        "metric": f"fps_{primary.pop('scene')}_stereo_e2e",
        "value": round(float(np.median(runs)), 2),
        "unit": "fps",
        "vs_baseline": 0.0,
        "rpc_floor_ms": rpc_floor,
        "loadavg_1m": round(load_1m, 2),
        "n_runs": n_runs,
        "fps_runs": runs,
        "fps_min": min(runs),
        **primary,
    }
    result["vs_baseline"] = round(result["value"] / 60.0, 3)

    if extras and kitti is None:
        other = "slab" if layout == "city" else "city"
        TIMERS.reset()
        try:
            r = run_once(load_synthetic(other), stereo=True,
                         threaded=threaded)
            r.pop("removal_causes", None)
            r.pop("frames", None)
            result[other] = r
        except Exception as e:  # pragma: no cover
            result[other] = {"error": str(e)[:200]}
        TIMERS.reset()
        try:
            r = run_once(primary_loaded, stereo=False, threaded=threaded)
            r.pop("removal_causes", None)
            r.pop("frames", None)
            result["mono"] = r
        except Exception as e:  # pragma: no cover
            result["mono"] = {"error": str(e)[:200]}

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
