"""Keypoint-churn audit (VERDICT r5 item 2).

Runs the 60-frame synthetic bench scenes (city, slab; stereo + mono) on
the CPU backend and reports, per removal gate:

  candidates   — keypoints the gate examined over the run
  removals     — observations the gate removed
  rate         — removals / candidates (per-examination removal rate)
  /frame       — removals per steady frame

plus the keyframe cadence, so the removal rates can be connected to the
KF count (VERDICT r5 weak #2: churn drives re-detection drives cadence).

The gates and their thresholds are semantically matched to the reference:

  track — forward-backward KLT failure (fb dist > max_ktl_distance=1.0,
          convergence, min-eig), reference map_manager.jl:524-562 +
          tracking.jl fb_tracking!
  ess   — 5-pt essential epipolar outlier (dist > threshold), reference
          front_end.jl:102-109 (remove_outliers)
  p3p   — P3P RANSAC non-inlier at max_reprojection_error=3 px,
          reference front_end.jl:184-186
  pnp   — PnP LM refinement outlier at max_reprojection_error=3 px,
          reference front_end.jl:211-215

Usage: JAX_PLATFORMS=cpu python scripts/churn_audit.py [n_frames]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402


def audit(layout: str, stereo: bool) -> dict:
    os.environ["BENCH_LAYOUT"] = layout
    loaded = bench.load_synthetic(layout)
    out = bench.run_once(loaded, stereo=stereo, threaded=False)
    frames = out["frames"]
    rows = {}
    for gate in ("track", "ess", "p3p", "pnp"):
        cand = out["gate_candidates"].get(gate, 0)
        rem = out["removal_causes"].get(gate, 0)
        rows[gate] = {
            "candidates": cand,
            "removals": rem,
            "rate": round(rem / cand, 4) if cand else None,
            "per_frame": round(rem / frames, 1),
        }
    return {
        "layout": layout,
        "stereo": stereo,
        "n_keyframes": out["n_keyframes"],
        "ate_rmse_m": out.get("ate_rmse_m"),
        "frames": frames,
        "gates": rows,
    }


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    os.environ["BENCH_FRAMES"] = str(n_frames)
    os.environ.setdefault("BENCH_WARMUP", "0")
    results = []
    for layout, stereo in (("city", True), ("slab", True), ("city", False)):
        r = audit(layout, stereo)
        results.append(r)
        name = f"{layout} {'stereo' if stereo else 'mono'}"
        print(f"== {name}: KFs={r['n_keyframes']} ate={r['ate_rmse_m']}")
        print(f"   {'gate':6s} {'cand':>7s} {'rem':>6s} {'rate':>7s} "
              f"{'/frame':>7s}")
        for gate, row in r["gates"].items():
            print(f"   {gate:6s} {row['candidates']:7d} {row['removals']:6d} "
                  f"{row['rate'] if row['rate'] is not None else float('nan'):7.4f} "
                  f"{row['per_frame']:7.1f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
