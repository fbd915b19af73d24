"""Per-stage timing + profiler hooks (SURVEY section 5 tracing row).

The reference's observability is per-frame stderr timers (xc-enc.cc:355-382);
this adds the TPU-side equivalents: named stage accumulators cheap enough
to leave in the hot path, enabled by ``xc --timings`` or ALFALFA_TIMINGS=1,
and a JAX profiler trace context (``xc --profile DIR``) for attributing
device time in xprof.
"""
import contextlib
import os
import sys
import time
from collections import defaultdict

_ENABLED = bool(int(os.environ.get("ALFALFA_TIMINGS", "0") or "0"))
_acc = defaultdict(lambda: [0.0, 0])   # name -> [seconds, count]


def enable(flag=True):
    global _ENABLED
    _ENABLED = bool(flag)


def enabled():
    return _ENABLED


@contextlib.contextmanager
def stage(name):
    """Accumulate wall time under ``name`` (no-op unless enabled)."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        a = _acc[name]
        a[0] += time.perf_counter() - t0
        a[1] += 1


def add(name, seconds, count=1):
    if _ENABLED:
        a = _acc[name]
        a[0] += seconds
        a[1] += count


def report(out=None, reset=True):
    """Print accumulated stage timings to stderr."""
    out = out or sys.stderr
    if not _acc:
        return
    width = max(len(k) for k in _acc)
    print("-- stage timings --", file=out)
    for name, (total, n) in sorted(_acc.items(),
                                   key=lambda kv: -kv[1][0]):
        per = total / n * 1000 if n else 0.0
        print(f"  {name:<{width}}  total {total * 1000:9.1f} ms   "
              f"n {n:5d}   mean {per:8.2f} ms", file=out)
    if reset:
        _acc.clear()


@contextlib.contextmanager
def profile(trace_dir):
    """jax.profiler trace context; pass None to disable."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
    print(f"profiler trace written to {trace_dir}", file=sys.stderr)
