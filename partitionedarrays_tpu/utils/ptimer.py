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

    def gather_statistics(self, backend=None) -> Dict[str, Dict[str, float]]:
        """CROSS-PROCESS statistics: each section's total wall time is
        allgathered over the processes of a multihost run and reported as
        min/max/avg across ranks (parity: the reference's gather of
        per-rank times to MAIN with min/max/avg, src/p_timer.jl:46-84).

        All processes must have timed the SAME sections (the natural
        state of an SPMD program; a mismatch raises).  Single-process
        backends degenerate to per-section totals."""
        totals = {k: float(sum(v)) for k, v in self.data.items()}
        keys = sorted(totals)
        if backend is None or not getattr(backend, "is_multiprocess", False):
            return {
                k: {
                    "min": totals[k],
                    "max": totals[k],
                    "avg": totals[k],
                    "procs": 1,
                }
                for k in keys
            }
        import hashlib

        import jax.experimental.multihost_utils as mhu
        import numpy as np

        sig = int.from_bytes(
            hashlib.sha1("|".join(keys).encode()).digest()[:4], "little"
        )
        sigs = np.asarray(mhu.process_allgather(np.int64(sig))).reshape(-1)
        if not (sigs == sigs[0]).all():
            raise ValueError(
                "gather_statistics: processes timed different sections"
            )
        arr = np.array([totals[k] for k in keys], dtype=np.float64)
        g = np.asarray(mhu.process_allgather(arr))
        if g.ndim == 1:
            g = g[None]
        return {
            k: {
                "min": float(g[:, i].min()),
                "max": float(g[:, i].max()),
                "avg": float(g[:, i].mean()),
                "procs": int(g.shape[0]),
            }
            for i, k in enumerate(keys)
        }

    def print_main(self, backend=None) -> None:
        """Pretty-print the cross-process statistics on MAIN only
        (parity: the MAIN-rank pretty printer, src/p_timer.jl:123-176)."""
        stats = self.gather_statistics(backend)
        import jax

        if getattr(backend, "is_multiprocess", False) and jax.process_index() != 0:
            return
        lines = [
            f"{'section':<24}{'min (s)':>12}{'avg (s)':>12}{'max (s)':>12}"
        ]
        for k, s in stats.items():
            lines.append(
                f"{k:<24}{s['min']:>12.3e}{s['avg']:>12.3e}{s['max']:>12.3e}"
            )
        print("\n".join(lines))

    def __repr__(self):
        lines = [f"{'section':<24}{'calls':>6}{'avg (s)':>12}{'max (s)':>12}"]
        for k, s in self.statistics().items():
            lines.append(
                f"{k:<24}{s['calls']:>6}{s['avg']:>12.3e}{s['max']:>12.3e}"
            )
        return "\n".join(lines)
