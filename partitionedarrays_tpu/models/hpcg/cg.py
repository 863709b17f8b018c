"""HPCG reference/optimized CG: fixed-iteration PCG with residual history.

Capability parity: HPCG/src/ref_cg.jl (preconditioned CG iterator,
:40-71) and opt_cg.jl (:25-32 — the optimized variant; here both run the
same compiled path, the "optimization" being the whole TPU-native stack).
The per-kernel timing buckets of the reference are replaced by the
analytical FLOP/byte model in report.py plus one wall-clock measurement of
the full compiled set (per-op timers are meaningless under XLA fusion).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ...psparse import PSparseMatrix, spmv
from ...pvector import PVector, axpy, pdot
from ...solvers.krylov import _as_col_vector, _as_row_vector


def hpcg_cg(
    A: PSparseMatrix,
    b: PVector,
    M: Optional[Callable[[PVector], PVector]] = None,
    iterations: int = 50,
):
    """Run exactly ``iterations`` PCG iterations from x0 = 0.

    Returns (x, resnorms[iterations+1]) with resnorms[k] = |r_k|_2.
    Traceable; jit at the call site with (A, M, b) as arguments.
    """
    Mfn = M if M is not None else (lambda r: r)
    x = PVector(jnp.zeros_like(b.own), jnp.zeros_like(b.ghost), b.layout, b.backend)
    r = b.copy()
    norm0 = jnp.sqrt(pdot(r, r))

    z = Mfn(r)
    p = _as_row_vector(A, z)
    rz = pdot(r, z)

    def body(k, state):
        x, r, p, rz, norms = state
        Ap = _as_row_vector(A, spmv(A, _as_col_vector(A, p)))
        pAp = pdot(p, Ap)
        alpha = rz / pAp
        x = axpy(alpha, p, x)
        r = axpy(-alpha, Ap, r)
        z = Mfn(r)
        rz_new = pdot(r, z)
        beta = rz_new / rz
        p = PVector(z.own + beta * p.own, z.ghost + beta * p.ghost, p.layout, p.backend)
        norms = norms.at[k + 1].set(jnp.sqrt(pdot(r, r)))
        return (x, r, p, rz_new, norms)

    norms = jnp.zeros((iterations + 1,), dtype=b.own.dtype).at[0].set(norm0)
    x, r, p, rz, norms = jax.lax.fori_loop(
        0, iterations, body, (x, r, p, rz, norms)
    )
    return x, norms
