"""Tunnel RPC contention probe (round 5).

Question: does a device_get issued BEFORE the producing program finishes
hold the tunnel and block concurrent uploads (the r5 regression: per-frame
prefetch dropped the bench 18.7 -> 12.0 FPS and tripled sm.upload_async),
and does block_until_ready behave differently?

Measures upload latency from a second thread while the first thread is:
  A) idle (baseline)
  B) blocked in device_get on an unfinished program's output
  C) blocked in block_until_ready on the same
  D) blocked in device_get on a FINISHED program's output (pure D2H)
"""
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def heavy(x):
    # ~100 ms of TPU work: repeated big matmuls.
    def body(i, a):
        return a @ a * 0.999 + 1e-6
    return jax.lax.fori_loop(0, 60, body, x)


heavy_j = jax.jit(heavy)


def time_uploads(n=6, label=""):
    lat = []
    for _ in range(n):
        a = np.random.rand(376, 1241).astype(np.float32)
        t0 = time.perf_counter()
        jnp.asarray(a).block_until_ready()
        lat.append((time.perf_counter() - t0) * 1000)
    print(f"  uploads during {label}: "
          f"median {np.median(lat):.1f} ms  {np.round(lat, 1)}")
    return np.median(lat)


def main():
    x = jnp.asarray(np.random.rand(2048, 2048).astype(np.float32) * 1e-3)
    r = heavy_j(x)
    r.block_until_ready()  # compile
    t0 = time.perf_counter()
    heavy_j(x).block_until_ready()
    print(f"heavy exec: {(time.perf_counter() - t0) * 1000:.1f} ms")

    time_uploads(label="A idle")

    for label, waiter in (
        ("B device_get(unfinished)", lambda buf: jax.device_get(buf)),
        ("C block_until_ready(unfinished)",
         lambda buf: buf.block_until_ready()),
    ):
        buf = heavy_j(x)
        done = threading.Event()

        def run(buf=buf, waiter=waiter):
            waiter(buf)
            done.set()

        th = threading.Thread(target=run, daemon=True)
        th.start()
        time.sleep(0.005)
        time_uploads(label=label)
        th.join()

    buf = heavy_j(x)
    buf.block_until_ready()

    def run_d():
        jax.device_get(buf)

    th = threading.Thread(target=run_d, daemon=True)
    th.start()
    time.sleep(0.001)
    time_uploads(label="D device_get(finished)")
    th.join()


if __name__ == "__main__":
    main()
