"""FEM Poisson example (parity: test/fem_example.jl of the reference).

Assemble the Q1 FEM Laplacian on the unit cube: each part loops over its
OWNED CELLS, contributing entries to rows owned by neighbouring parts —
the disassembled input state that exercises the off-owner ``assemble``
path (the reversed exchange graph).  Solve with Jacobi-preconditioned CG
and check against a manufactured solution.

    python examples/fem_example.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import partitionedarrays_tpu as pat
from partitionedarrays_tpu.models.gallery import laplacian_fem
from partitionedarrays_tpu.solvers.krylov import _as_col_vector, cg
from partitionedarrays_tpu.solvers.smoothers import JacobiCorrection


def main(nodes=(8, 8, 8), parts=(2, 2, 1)):
    backend = pat.SerialBackend(int(np.prod(parts)))
    I, J, V, rows, cols = laplacian_fem(nodes, parts, dtype=np.float64)
    # disassembled triplets -> find owners, union ghosts, exchange, merge
    A = pat.psparse(I, J, V, rows, cols, backend)

    rng = np.random.default_rng(1)
    x_dense = rng.standard_normal(A.shape[0])
    x_exact = pat.pvector_from_own(
        [x_dense[li.own_to_global] for li in A.row_prange.partition()],
        A.row_prange,
        backend,
    )
    b = pat.spmv(A, _as_col_vector(A, x_exact))

    M = JacobiCorrection(A)
    x, info = cg(A, b, M=M, rtol=1e-12, maxiter=2000)
    err = float(np.linalg.norm(pat.collect(x) - x_dense))
    print(
        f"fem: n={A.shape[0]} parts={np.prod(parts)} "
        f"iters={int(info.iterations)}  |x-x*|={err:.2e}"
    )
    assert err < 1e-5, err


if __name__ == "__main__":
    main()
