"""Global configuration knobs (static, read at trace time).

The reference passes Val{}-typed static flags per call
(src/p_sparse_matrix.jl:1094-1161); here the equivalents are static Python
config read while tracing, so they specialize the compiled program.
"""
from __future__ import annotations

from typing import Optional

import jax

# None = auto (use Pallas kernels on TPU-like backends only)
use_pallas: Optional[bool] = None

_TPU_PLATFORMS = {"tpu", "axon"}


def pallas_enabled() -> bool:
    if use_pallas is not None:
        return use_pallas
    try:
        return jax.devices()[0].platform.lower() in _TPU_PLATFORMS
    except Exception:
        return False


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (no-op if the user already
    configured one).  Setup-heavy workloads compile a handful of per-shape
    programs (stencil generators, GS state builds, solver bodies); over a
    tunneled/remote-compile TPU each costs seconds-to-tens-of-seconds, so
    caching them on disk turns repeat setups from minutes into seconds
    (measured: HPCG 128^3 pc_setup 162 s cold -> 2.8 s cached).

    Called lazily at backend construction (NOT package import, which would
    force backend init before a user's jax.distributed.initialize), and
    only for TPU-like platforms: cached XLA:CPU AOT executables are
    machine-feature-specific and reload with mismatch warnings/SIGILL risk
    on heterogeneous hosts.  Respects JAX_COMPILATION_CACHE_DIR."""
    import os

    try:
        if jax.devices()[0].platform.lower() not in _TPU_PLATFORMS:
            return
        if jax.config.jax_compilation_cache_dir is None and not os.environ.get(
            "JAX_COMPILATION_CACHE_DIR"
        ):
            default = os.path.join(
                os.path.expanduser("~"), ".cache", "partitionedarrays_tpu_xla"
            )
            jax.config.update("jax_compilation_cache_dir", path or default)
        # small per-shape setup programs are exactly what repeat runs reuse
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these knobs: compilation just stays uncached
