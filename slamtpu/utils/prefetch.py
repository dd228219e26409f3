"""Background device->host prefetch.

On the tunnel TPU backend, `copy_to_host_async` is best-effort (it can be
a no-op) and a D2H issued from the main thread queues behind every program
dispatched since — so a deferred `jax.device_get` pays the full ~26-30 ms
RPC round trip even when the producing program finished long ago
(PERF.md round 4: mp.kf_async.fetch and the untimed deferred-BA fetch).
A background thread issues the fetch immediately, concurrent with the main
thread's subsequent dispatches (the uploader worker already proves the
client handles concurrent RPCs), so the consumer's blocking `get()` finds
host-ready data.
"""
import threading

import jax


class DevicePrefetch:
    """Fetch a pytree of device buffers on a daemon thread.

    `get()` joins and returns the numpy pytree (re-raising any fetch
    error in the caller's thread).
    """

    def __init__(self, bufs):
        self._result = None
        self._err = None
        self._bufs = bufs
        self._thread = threading.Thread(
            target=self._run, name="slamtpu-prefetch", daemon=True
        )
        self._thread.start()

    def _run(self):
        try:
            self._result = jax.device_get(self._bufs)
        except BaseException as e:  # noqa: BLE001 — re-raised in get()
            self._err = e

    def done(self) -> bool:
        return not self._thread.is_alive()

    def get(self):
        self._thread.join()
        if self._err is not None:
            raise self._err
        result, self._result, self._bufs = self._result, None, None
        return result
