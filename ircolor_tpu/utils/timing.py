"""Wall-clock timing and throughput meters.

The reference has no profiling/instrumentation (SURVEY.md §5). These helpers
bracket device work with ``jax.block_until_ready`` so steps/sec and
frames/sec/chip numbers are honest, and expose ``jax.profiler`` trace capture
for TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator

import jax


class Timer:
    """Accumulating wall-clock timer. ``with timer: ...`` or start/stop."""

    def __init__(self) -> None:
        self.total = 0.0
        self.count = 0
        self._t0: float | None = None

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc: Any) -> None:
        assert self._t0 is not None
        self.total += time.perf_counter() - self._t0
        self.count += 1
        self._t0 = None

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class ThroughputMeter:
    """items/sec over a window, device-synchronized at mark points."""

    def __init__(self) -> None:
        self._t0: float | None = None
        self.items = 0

    def start(self, sync_on: Any = None) -> None:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.items = 0
        self._t0 = time.perf_counter()

    def add(self, n: int) -> None:
        self.items += n

    def stop(self, sync_on: Any = None) -> float:
        """Returns items/sec since start()."""
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        return self.items / dt if dt > 0 else float("inf")


@contextlib.contextmanager
def profiler_trace(logdir: str | None) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_transfer_warmup() -> "threading.Thread":
    """Kick off the backend's FIRST device→host transfer on a daemon thread.

    Some remote-attached TPU transports (e.g. the axon relay used in dev)
    spend 1.5–2.5 minutes of wall clock completing the first D2H fetch of a
    process — a one-time handshake, after which transfers run at full rate
    (measured: first 64 KB fetch 94–158 s, subsequent 4 MB fetches ~0.13 s).
    Calling this at runtime startup overlaps that handshake with HOST-ONLY
    work (dataset scan, decode); callers must ``join()`` the returned thread
    before issuing any other device op — concurrent RPCs during compile/init
    have been observed to wedge the relay transport. On directly-attached
    TPUs the fetch costs microseconds — always safe to call.
    """
    import threading

    import jax.numpy as jnp

    def _warm() -> None:
        try:
            import numpy as _np

            x = jnp.zeros((8, 128), jnp.float32) + 1.0
            _np.asarray(x)
        except Exception:
            pass  # warmup is best-effort; real transfers will pay instead

    t = threading.Thread(target=_warm, name="d2h-warmup", daemon=True)
    t.start()
    return t


def time_chained_fn(fn, x0, iters: int = 8, reps: int = 3) -> float:
    """Seconds per call of ``fn`` (x → y, same-shape-agnostic) measured with
    the in-graph chained methodology every perf number in docs/PERF.md uses:

    * iterations chain through a REAL data dependency (a scalar derived from
      each output is folded into the carry at 1e-12 scale) so dispatches
      cannot overlap and XLA cannot DCE or reorder them;
    * completion is forced by a host fetch of a reduction of the final
      carry (through the axon relay, ``block_until_ready`` on independent
      dispatches can return early);
    * the per-iteration time is the DIFFERENCE between a 2N-iteration and an
      N-iteration executable (best of ``reps``), cancelling the ~35 ms fixed
      RPC dispatch latency and any per-call overhead.

    This is THE shared implementation (single source of truth) for the
    tools/*bench.py probes; fixes to the methodology belong here.
    """
    import time as _time

    import jax as _jax
    import jax.numpy as _jnp

    def _chained(it):
        @_jax.jit
        def run(x):
            def body(i, carry):
                y = fn(carry)
                s = (_jnp.sum(y.astype(_jnp.float32)) * 1e-12).astype(carry.dtype)
                return carry.at[(0,) * carry.ndim].add(s)

            x = _jax.lax.fori_loop(0, it, body, x)
            return _jnp.sum(x.astype(_jnp.float32))

        return run

    r1, r2 = _chained(iters), _chained(2 * iters)
    float(r1(x0)); float(r2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter(); float(r1(x0))
        t1 = _time.perf_counter(); float(r2(x0))
        t2 = _time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best
