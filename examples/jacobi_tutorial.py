"""The Jacobi tutorial (parity: docs/jacobi_tutorial.jl of the reference).

1-D Laplace boundary-value problem with u(0) = -1, u(n+1) = 1, solved by
Jacobi sweeps u_i <- (u_{i-1} + u_{i+1}) / 2 over a ghosted block
partition.  Run with any number of parts; results match the sequential
version exactly.

    python examples/jacobi_tutorial.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import partitionedarrays_tpu as pat
from partitionedarrays_tpu.solvers.krylov import _as_col_vector


def jacobi_sequential(n, niters):
    u = np.zeros(n + 2)
    u[0], u[-1] = -1.0, 1.0
    for _ in range(niters):
        u[1:-1] = 0.5 * (u[:-2] + u[2:])
    # note: the textbook version double-buffers; for the tutorial check we
    # use the same operator-based iteration as the parallel code below
    u = np.zeros(n + 2)
    u[0], u[-1] = -1.0, 1.0
    un = u.copy()
    for _ in range(niters):
        un[1:-1] = 0.5 * (u[:-2] + u[2:])
        u, un = un, u.copy()
    return u[1:-1]


def main(n=50, niters=200, n_parts=4):
    backend = pat.SerialBackend(n_parts)
    pr = pat.PRange(pat.uniform_partition(n_parts, n, ghost=1))

    # averaging operator + boundary contribution
    Is, Js, Vs, cs = [], [], [], []
    for li in pr.partition():
        I, J, V = [], [], []
        c = np.zeros(li.n_own)
        for k, g in enumerate(li.own_to_global):
            for nb in (g - 1, g + 1):
                if 0 <= nb < n:
                    I.append(g), J.append(nb), V.append(0.5)
            if g == 0:
                c[k] -= 0.5
            if g == n - 1:
                c[k] += 0.5
        Is.append(np.array(I)); Js.append(np.array(J)); Vs.append(np.array(V))
        cs.append(c)
    A = pat.psparse(Is, Js, Vs, pr, pr, backend, assembled=True)
    cvec = pat.pvector_from_own(cs, A.row_prange, backend, dtype=np.float64)
    u = pat.pzeros(A.row_prange, backend, dtype=np.float64)

    for _ in range(niters):
        Au = pat.spmv(A, _as_col_vector(A, u))  # includes the ghost exchange
        u = pat.PVector(Au.own + cvec.own, u.ghost, u.layout, u.backend)

    err = np.abs(pat.collect(u) - jacobi_sequential(n, niters)).max()
    print(f"jacobi: n={n} parts={n_parts} iters={niters}  max|err|={err:.2e}")
    assert err < 1e-10


if __name__ == "__main__":
    main()
