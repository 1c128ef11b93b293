"""Phase timing + device profiling helpers.

The reference's only instrumentation is a dead rdtsc macro (bench.h, included
but never called -- SURVEY.md §5.1). Here timing is a real subsystem:

- ``phase(name)``: wall-clock context manager that also opens a
  ``jax.profiler.TraceAnnotation`` so phases show up on TPU traces;
- ``PhaseTimer``: accumulates named phase durations (init/upload/render/
  readback -- "ms/viewpoint" being the framework's north-star metric);
- ``device_time(fn, *args)``: robust on-device timing that forces completion
  through a scalar pull and subtracts the measured host<->device round trip
  (needed because some transports dispatch asynchronously; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        import jax
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:24s} {tot * 1e3:9.2f} ms total "
                         f"({n}x, {tot / n * 1e3:.2f} ms avg)")
        return "\n".join(lines)


_global_timer = PhaseTimer()


def phase(name: str):
    """Module-level phase context: ``with profiling.phase("render"): ...``"""
    return _global_timer.phase(name)


def report() -> str:
    return _global_timer.report()


def device_time_chain(fn, *args, perturb, reps: int = 16, iters: int = 5,
                      rtt: float | None = None):
    """MIN seconds per call of fn, timed as chains of ``reps``
    sequentially-executed perturbed calls per dispatch (lax.map).

    For workloads comparable to or smaller than the transport RTT, the
    single-dispatch ``device_time`` drowns in RTT noise (a tunneled TPU
    round trip can jitter by milliseconds); chaining amortizes that noise
    by ``reps``. ``perturb(args, i)`` must return fresh call args per chain
    element (e.g. a moved camera) so XLA cannot collapse the repeats.
    """
    import jax
    import jax.numpy as jnp

    def reduced(a, i):
        out = fn(*perturb(a, i))
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    @jax.jit
    def chain(*a):
        return jax.lax.map(lambda i: reduced(a, i),
                           jnp.arange(reps, dtype=jnp.float32)).sum()

    float(chain(*args))
    if rtt is None:
        rtt = measure_rtt()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(chain(*args))
        ts.append(time.perf_counter() - t0)
    # min, same rationale as measure_rtt: transport jitter only ever
    # inflates a sample, so the fastest chain is the honest device time
    return max(0.0, min(ts) - rtt) / reps


def measure_rtt(iters: int = 8) -> float:
    """MINIMUM host<->device scalar round-trip seconds.

    The min, not the median: transport jitter only ever inflates a sample,
    so the min is the true floor, and subtracting it is the conservative
    direction -- every timing that subtracts this can only OVERestimate the
    measured workload. One methodology for bench.py and the whole suite.
    """
    import jax.numpy as jnp
    x = jnp.float32(1.0) * 2
    float(x)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(x + 0 * time.perf_counter())   # fresh value, forces a pull
        ts.append(time.perf_counter() - t0)
    return min(ts)


def device_time(fn, *args, iters: int = 5, rtt: float | None = None):
    """Median seconds per call of fn(*args), forcing completion by reducing
    the output to a scalar and pulling it; subtracts the transport RTT."""
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        out = fn(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    red = jax.jit(reduced)
    s = red(*args)
    jax.block_until_ready(s)
    if rtt is None:
        rtt = measure_rtt()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(0.0, ts[len(ts) // 2] - rtt)
