"""Background device->host prefetch.

On the tunnel TPU backend, `copy_to_host_async` is best-effort (it can be
a no-op) and a D2H issued from the main thread queues behind every program
dispatched since — so a deferred `jax.device_get` pays the full ~26-30 ms
RPC round trip even when the producing program finished long ago
(PERF.md round 4: mp.kf_async.fetch and the untimed deferred-BA fetch).
A single long-lived fetcher thread issues the fetch immediately,
concurrent with the main thread's subsequent dispatches (the uploader
worker already proves the client handles concurrent RPCs), so the
consumer's blocking `get()` finds host-ready data. One shared worker (not
a thread per fetch) bounds thread creation over a run and preserves fetch
ordering on the tunnel (ADVICE r4 low).
"""
from concurrent.futures import ThreadPoolExecutor

import jax

# Single shared worker: fetches stay ordered on the tunnel and thread
# creation is bounded for the whole process lifetime (daemon threads, so
# interpreter shutdown is not blocked by an in-flight fetch).
_FETCHER = ThreadPoolExecutor(
    max_workers=1, thread_name_prefix="slamtpu-prefetch"
)


class DevicePrefetch:
    """Fetch a pytree of device buffers on the shared fetcher thread.

    `get()` blocks until the fetch completes and returns the numpy pytree
    (re-raising any fetch error in the caller's thread).
    """

    def __init__(self, bufs):
        self._future = _FETCHER.submit(jax.device_get, bufs)

    def done(self) -> bool:
        return self._future.done()

    def cancel(self):
        """Drop the fetch if it hasn't started (discarded speculative
        frames); an already-running fetch completes and is garbage."""
        self._future.cancel()

    def get(self):
        future, self._future = self._future, None
        return future.result()
