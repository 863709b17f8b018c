"""Newton-Raphson nonlinear solver.

Capability parity: PartitionedSolvers/src/nonlinear_solvers.jl:2-76 —
linearize, solve, x -= dx, with residual and solution-increment
tolerances and the verbose iteration table.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..pvector import PVector, axpy, pnorm
from .interfaces import LinearProblem, LinearSolverBase, NonlinearProblem, lu_solver


@dataclass
class NewtonInfo:
    iterations: int
    res_norm: float
    dx_norm: float
    converged: bool
    trace: list


def newton_raphson(
    problem: NonlinearProblem,
    solver: Optional[LinearSolverBase] = None,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    dx_atol: float = 0.0,
    maxiters: int = 20,
    verbose: bool = False,
):
    """Returns (x, NewtonInfo)."""
    solver = solver or lu_solver()
    x = problem.x0
    r = problem.residual(x)
    r0 = float(pnorm(r))
    tol = max(rtol * r0, atol)
    trace = [(0, r0, np.nan)]
    if verbose:
        print(f"{'iter':>5} {'|r|':>12} {'|dx|':>12}")
        print(f"{0:5d} {r0:12.4e} {'':>12}")
    rn = r0
    dxn = np.inf
    it = 0
    for it in range(1, maxiters + 1):
        if rn <= tol or dxn <= dx_atol:
            break
        J = problem.jacobian(x)
        dx = solver.solve(LinearProblem(J, r))
        x = axpy(-1.0, _match_layout(dx, x), x)
        r = problem.residual(x)
        rn = float(pnorm(r))
        dxn = float(pnorm(dx))
        trace.append((it, rn, dxn))
        if verbose:
            print(f"{it:5d} {rn:12.4e} {dxn:12.4e}")
    converged = rn <= tol
    return x, NewtonInfo(it, rn, dxn, converged, trace)


def _match_layout(v: PVector, like: PVector) -> PVector:
    if v.layout is like.layout:
        return v
    import jax.numpy as jnp

    return PVector(v.own, jnp.zeros_like(like.ghost), like.layout, like.backend)
