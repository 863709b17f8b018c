"""Implicit one-stage ODE schemes.

Capability parity: PartitionedSolvers/src/ode_solvers.jl —
``single_stage_solver`` (generic implicit scheme, :26-72) and
``backward_euler`` (:74-89): at each step solve
residual(t_{n+1}, x, (x - x_n)/dt) = 0 by Newton, with jacobian weights
(a_x, a_v) = (1, 1/dt).
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import numpy as np

from ..pvector import PVector
from .interfaces import LinearSolverBase, NonlinearProblem, ODEProblem
from .nonlinear import newton_raphson


def single_stage_solver(
    problem: ODEProblem,
    dt: float,
    scheme: Tuple[float, float] = (1.0, None),
    solver: Optional[LinearSolverBase] = None,
    rtol: float = 1e-8,
    maxiters: int = 20,
) -> Iterator[Tuple[float, PVector]]:
    """Yields (t, x) after each implicit step."""
    a_x, a_v = scheme
    if a_v is None:
        a_v = 1.0 / dt
    t0, t1 = problem.interval
    x = problem.x0
    t = t0
    while t < t1 - 1e-12:
        t_next = min(t + dt, t1)
        x_old = x

        def residual(xn):
            v = _scale_diff(xn, x_old, 1.0 / dt)
            return problem.residual(t_next, xn, v)

        def jacobian(xn):
            v = _scale_diff(xn, x_old, 1.0 / dt)
            return problem.jacobian(t_next, xn, v, (a_x, a_v))

        nl = NonlinearProblem(residual, jacobian, x)
        x, info = newton_raphson(nl, solver=solver, rtol=rtol, maxiters=maxiters)
        t = t_next
        yield t, x


def backward_euler(
    problem: ODEProblem,
    dt: float,
    solver: Optional[LinearSolverBase] = None,
    **kw,
) -> Iterator[Tuple[float, PVector]]:
    """Parity: backward_euler (ode_solvers.jl:74-89)."""
    return single_stage_solver(problem, dt, scheme=(1.0, 1.0 / dt), solver=solver, **kw)


def _scale_diff(a: PVector, b: PVector, s: float) -> PVector:
    return PVector(
        (a.own - b.own) * s, (a.ghost - b.ghost) * s, a.layout, a.backend
    )
