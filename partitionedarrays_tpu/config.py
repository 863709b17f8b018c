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
