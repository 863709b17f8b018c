"""Smoothed-aggregation AMG example (parity: PartitionedSolvers amg usage,
PartitionedSolvers/src/amg.jl + amg_tests.jl).

Build a 3-D FDM Laplacian, set up the default smoothed-aggregation AMG
hierarchy, and use one V-cycle per iteration as the CG preconditioner.

    python examples/amg_example.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import partitionedarrays_tpu as pat
from partitionedarrays_tpu.models.gallery import laplacian_fdm
from partitionedarrays_tpu.solvers import amg
from partitionedarrays_tpu.solvers.krylov import _as_col_vector, cg


def main(nodes=(16, 16, 16), parts=(2, 2, 1)):
    backend = pat.SerialBackend(int(np.prod(parts)))
    I, J, V, rows, cols = laplacian_fdm(nodes, parts, dtype=np.float64)
    A = pat.psparse(I, J, V, rows, cols, backend, assembled=True)

    rng = np.random.default_rng(2)
    x_dense = rng.standard_normal(A.shape[0])
    x_exact = pat.pvector_from_own(
        [x_dense[li.own_to_global] for li in A.row_prange.partition()],
        A.row_prange,
        backend,
    )
    b = pat.spmv(A, _as_col_vector(A, x_exact))

    M = amg.amg(A)
    stats = M.statistics()
    print("amg hierarchy:", stats)

    x, info = cg(A, b, M=M, rtol=1e-12, maxiter=200)
    err = float(np.linalg.norm(pat.collect(x) - x_dense))
    print(
        f"amg-cg: n={A.shape[0]} iters={int(info.iterations)}  |x-x*|={err:.2e}"
    )
    assert err < 1e-5, err
    assert int(info.iterations) < 60


if __name__ == "__main__":
    main()
