"""Per-process (rank-local) construction and setup algebra example
(parity: the reference's per-rank MPI execution model — each rank builds
ONLY its own part's triplets and every setup operation exchanges just
the off-owner surface; /root/reference/src/p_sparse_matrix.jl:213-289,
:1590-2040, test/mpi_array drivers).

Single-process run for demonstration: ``psparse_local`` takes per-part
triplet lists where NON-LOCAL parts are ``None`` — under
``with_multihost`` (jax.distributed) each process passes exactly its
``backend.local_parts()`` and the off-owner shuffle rides edge-colored
cross-process ppermute rounds (O(surface) wire bytes).  The same code
runs unchanged here with every part local.

    python examples/per_process_example.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import partitionedarrays_tpu as pat
from partitionedarrays_tpu.models.gallery import laplacian_fem
from partitionedarrays_tpu.psparse import psparse_local, repartition_system, spmm, spmv
from partitionedarrays_tpu.pvector import pvector_local
from partitionedarrays_tpu.solvers.amg import AMGParams, AMGPreconditioner
from partitionedarrays_tpu.solvers.krylov import cg


def main(nodes=(33, 33), parts=(4, 1)):
    P = int(np.prod(parts))
    backend = pat.SerialBackend(P)
    local = list(backend.local_parts())  # every part in a single process

    # gallery builders accept ``parts=`` to materialize ONLY those parts'
    # triplets (O(local) peak per process)
    I, J, V, rows, cols = laplacian_fem(
        nodes, parts, dtype=np.float64, parts=local
    )
    A = psparse_local(I, J, V, pat.PRange(rows), pat.PRange(cols), backend)
    b = pvector_local(I, V, pat.PRange(rows), backend, dtype=np.float64)
    # b_i = sum_j a_ij  ==  (A @ 1)_i — a quick identity to verify against
    ones = pat.pones(A.col_prange, backend, dtype=np.float64)
    r = pat.collect(spmv(A, ones)) - pat.collect(b)
    assert np.abs(r).max() < 1e-9

    # the whole setup algebra runs with per-process blocks: spmm,
    # repartition, and a generic smoothed-aggregation AMG setup
    A2 = spmm(A, A)
    sizes = [A.shape[0] // P] * P
    sizes[0] += A.shape[0] - sum(sizes)
    new_rows = pat.PRange(pat.variable_partition(sizes, A.shape[0]))
    A3, b3 = repartition_system(A, b, new_rows)

    M = AMGPreconditioner(A, AMGParams(coarse_size=30, max_levels=3, epsilon=0.02))
    x, info = cg(A, b, M=M, rtol=1e-10, maxiter=100)

    # reference: serial scipy solve of the globally assembled operator
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    If, Jf, Vf, _, _ = laplacian_fem(nodes, (1, 1), dtype=np.float64)
    n = int(np.prod(nodes))
    G = sp.csr_matrix((Vf[0], (If[0], Jf[0])), shape=(n, n))
    bg = G @ np.ones(n)  # == collect(b) up to part ordering
    x_star = spla.spsolve(G.tocsc(), bg)

    xs = pat.collect(x)  # global order
    err = float(np.abs(xs - x_star).max())
    print(
        f"per-process: n={n} parts={P} amg-cg iters={int(info.iterations)}"
        f"  |x-x*|={err:.2e}  (spmm nnz={int(sum(bk['oo'].nnz for bk in A2.blocks))},"
        f" repartitioned rows part0={A3.row_prange.partition()[0].n_own})"
    )
    assert err < 1e-6, err


if __name__ == "__main__":
    main()
