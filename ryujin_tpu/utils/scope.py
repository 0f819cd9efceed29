"""Hierarchical wall-clock timer scopes.

The analog of the reference's RAII `Scope` + computing-timer statistics
(/root/reference/source/scope.h and the TimeLoop's
"computing timer" summary, time_loop.template.h:1000-1080).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict


_TIMERS: Dict[str, float] = {}
_COUNTS: Dict[str, int] = {}


@contextmanager
def scope(name: str):
    """Accumulate the wall time of the enclosed block under `name`."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TIMERS[name] = _TIMERS.get(name, 0.0) + dt
        _COUNTS[name] = _COUNTS.get(name, 0) + 1


def timer_statistics() -> Dict[str, tuple]:
    """Return {name: (total_seconds, calls)}."""
    return {k: (_TIMERS[k], _COUNTS[k]) for k in sorted(_TIMERS)}


def reset_timers() -> None:
    _TIMERS.clear()
    _COUNTS.clear()


def print_timer_statistics(out=None) -> None:
    """Print the computing-timer summary block."""
    import sys

    out = out or sys.stdout
    stats = timer_statistics()
    if not stats:
        return
    width = max(len(k) for k in stats)
    out.write("\nComputing timer statistics:\n")
    for name, (total, calls) in stats.items():
        out.write(f"  {name:<{width}}  {total:10.3f} s  ({calls} calls)\n")
