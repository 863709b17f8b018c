"""Problem/solver protocol.

Capability parity with PartitionedSolvers/src/interfaces.jl: problem types
(LinearProblem :133-170, NonlinearProblem :275-345, ODEProblem :414-476),
the update/step solver contract (:195-238), ``solve`` (:29-35), the lazy
``history`` iterator (:37-77), solver-as-preconditioner adapters
(ldiv!/smooth!/preconditioner, :174-245).

Pythonic shape: problems are small dataclasses over the partitioned
containers; a solver is an object with ``solve(problem)`` (fresh setup),
``update(problem)`` (same sparsity, new values) and optional ``step``
iteration for ``history``.  Iterative solvers delegate to the jittable
kernels in krylov.py/smoothers.py/amg.py, so ``solve`` compiles end-to-end.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

from ..psparse import PSparseMatrix, spmv
from ..pvector import PVector, axpy, pnorm, pzeros


@dataclass
class LinearProblem:
    """A x = b (parity: linear_problem, interfaces.jl:133-170)."""

    A: PSparseMatrix
    b: PVector
    x0: Optional[PVector] = None
    nullspace: Optional[Any] = None
    attributes: Dict = field(default_factory=dict)


@dataclass
class NonlinearProblem:
    """residual(x) = 0 with jacobian(x)
    (parity: nonlinear_problem, interfaces.jl:275-345)."""

    residual: Callable[[PVector], PVector]
    jacobian: Callable[[PVector], PSparseMatrix]
    x0: PVector
    attributes: Dict = field(default_factory=dict)


@dataclass
class ODEProblem:
    """residual(t, x, v) = 0 over ``interval`` with jacobian w.r.t.
    (x, v) weights (parity: ode_problem, interfaces.jl:414-476)."""

    residual: Callable[[float, PVector, PVector], PVector]
    jacobian: Callable[[float, PVector, PVector, tuple], PSparseMatrix]
    x0: PVector
    interval: tuple
    attributes: Dict = field(default_factory=dict)


class LinearSolverBase:
    """update/solve contract (parity: linear_solver, interfaces.jl:195-238)."""

    def solve(self, problem: LinearProblem) -> PVector:
        raise NotImplementedError

    def update(self, problem: LinearProblem) -> None:
        """Matrix values changed at fixed sparsity; refresh caches."""

    def finalize(self) -> None:
        """Release resources (parity: finalize!)."""


class CGSolver(LinearSolverBase):
    def __init__(self, rtol=1e-8, atol=0.0, maxiter=1000, M=None):
        self.rtol, self.atol, self.maxiter, self.M = rtol, atol, maxiter, M
        self.last_info = None

    def solve(self, p: LinearProblem) -> PVector:
        from .krylov import cg

        x, info = cg(
            p.A, p.b, x0=p.x0, M=self.M, rtol=self.rtol, atol=self.atol,
            maxiter=self.maxiter,
        )
        self.last_info = info
        return x


class LUSolver(LinearSolverBase):
    """Sparse LU through centralization — the reference's own fallback
    ("not efficient, for debugging", src/p_sparse_matrix.jl:2541-2593;
    PartitionedSolvers/src/wrappers.jl:2-16)."""

    def __init__(self):
        self._splu = None
        self._A = None

    def _factorize(self, A: PSparseMatrix):
        import scipy.sparse.linalg as spla

        from ..psparse import centralize

        self._splu = spla.splu(centralize(A).tocsc())
        self._A = A

    def solve(self, p: LinearProblem) -> PVector:
        from ..pvector import collect, pvector_from_own

        if self._splu is None or self._A is not p.A:
            self._factorize(p.A)
        bg = collect(p.b)
        xg = self._splu.solve(bg)
        parts = [xg[li.own_to_global] for li in p.A.row_prange.partition()]
        return pvector_from_own(parts, p.A.row_prange, p.b.backend, dtype=bg.dtype)

    def update(self, p: LinearProblem) -> None:
        self._factorize(p.A)


class SmootherSolver(LinearSolverBase):
    """Wraps a smoother/preconditioner callable as an iterative solver
    (parity: richardson-based solvers, smoothers.jl)."""

    def __init__(self, make_M, iterations=10, omega=1.0):
        self.make_M = make_M
        self.iterations = iterations
        self.omega = omega
        self._M = None
        self._A = None

    def _get_M(self, A):
        if self._M is None or self._A is not A:
            self._M = self.make_M(A)
            self._A = A
        return self._M

    def solve(self, p: LinearProblem) -> PVector:
        from .krylov import richardson_iteration

        M = self._get_M(p.A)
        x = p.x0 if p.x0 is not None else pzeros(
            p.A.row_prange, p.b.backend, dtype=p.b.own.dtype
        )
        return richardson_iteration(
            p.A, p.b, x, omega=self.omega, M=M, iterations=self.iterations
        )


def lu_solver() -> LUSolver:
    return LUSolver()


def cg_solver(**kw) -> CGSolver:
    return CGSolver(**kw)


def jacobi_solver(iterations=10, omega=1.0) -> SmootherSolver:
    from .smoothers import JacobiCorrection

    return SmootherSolver(JacobiCorrection, iterations, omega)


def gauss_seidel_solver(iterations=10, sweep="symmetric") -> SmootherSolver:
    from .smoothers import GaussSeidel

    return SmootherSolver(lambda A: GaussSeidel(A, 1, sweep), iterations)


def richardson_solver(iterations=10, omega=1.0) -> SmootherSolver:
    return SmootherSolver(lambda A: (lambda r: r), iterations, omega)


def additive_schwarz_solver(iterations=3, local_solver=None) -> SmootherSolver:
    from .smoothers import AdditiveSchwarz

    return SmootherSolver(lambda A: AdditiveSchwarz(A, local_solver), iterations)


def amg_solver(params=None, nullspace=None, iterations=1) -> SmootherSolver:
    from .amg import AMGPreconditioner

    return SmootherSolver(
        lambda A: AMGPreconditioner(A, params, nullspace), iterations
    )


def solve(solver: LinearSolverBase, problem: LinearProblem) -> PVector:
    """Parity: solve (interfaces.jl:29-35)."""
    return solver.solve(problem)


def preconditioner(solver: LinearSolverBase, problem: LinearProblem):
    """Use any solver as a preconditioner callable r -> M(r)
    (parity: preconditioner, interfaces.jl:240-245)."""

    def M(r: PVector) -> PVector:
        return solver.solve(LinearProblem(problem.A, r))

    return M


def smooth(solver: LinearSolverBase, x: PVector, problem: LinearProblem) -> PVector:
    """Improve x in place of a full solve (parity: smooth!, interfaces.jl:
    174-186)."""
    return solver.solve(LinearProblem(problem.A, problem.b, x0=x))


def history(
    step: Callable[[PVector], PVector], x0: PVector, maxiters: int = 100
) -> Iterator[PVector]:
    """Lazy iterate history (parity: history, interfaces.jl:37-77)."""
    x = x0
    for _ in range(maxiters):
        x = step(x)
        yield x
