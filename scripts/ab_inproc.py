"""In-process interleaved A/B over bench env knobs.

Separate bench processes each pay the tunnel warm-up (the FIRST D2H fetch
of a process can take minutes), so cross-process A/Bs at BENCH_RUNS=1 are
both slow and noise-dominated. This driver loads the scene ONCE, warms the
tunnel, then alternates the A and B configurations run-by-run in the same
process — the only protocol under which a few-percent FPS delta is
resolvable against the documented 20-40% tunnel drift (PERF.md r4/r5).

Usage:
  python scripts/ab_inproc.py ROUNDS KNOB=A_VAL,B_VAL [KNOB2=...]
e.g.
  python scripts/ab_inproc.py 3 BENCH_PAIR_FETCH=0,1
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    rounds = int(sys.argv[1])
    knobs = []  # (name, a_val, b_val)
    for arg in sys.argv[2:]:
        name, vals = arg.split("=")
        a, b = vals.split(",")
        knobs.append((name, a, b))

    loaded = bench.load_synthetic("city")
    floor = bench.measure_rpc_floor()
    print(f"rpc_floor_ms: {floor} loadavg_1m: {os.getloadavg()[0]:.2f} "
          "(single-CPU box: >0.5 means another process is contaminating "
          "this A/B)", flush=True)

    results = {"A": [], "B": []}
    for r in range(rounds):
        for side in ("A", "B"):
            for name, a, b in knobs:
                os.environ[name] = a if side == "A" else b
            out = bench.run_once(loaded, stereo=True, threaded=False)
            results[side].append(out["fps"])
            print(f"round {r} side {side} "
                  f"({'; '.join(n + '=' + (a if side == 'A' else b) for n, a, b in knobs)}): "
                  f"fps={out['fps']} kf={out['n_keyframes']} "
                  f"ate={out.get('ate_rmse_m')}", flush=True)
    import statistics

    for side in ("A", "B"):
        v = results[side]
        print(f"{side}: median={statistics.median(v):.2f} "
              f"min={min(v):.2f} max={max(v):.2f} runs={v}")
    print(json.dumps({"rpc_floor_ms": floor, **results}))


if __name__ == "__main__":
    main()
