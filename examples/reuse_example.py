"""Fixed-sparsity reuse example: an implicit time-stepping loop that
re-assembles the operator every step WITHOUT redoing any setup.

Parity: the reference's in-place forms — psystem! re-fill
(/root/reference/src/p_sparse_matrix.jl:2475-2539), sparse_matrix! and
the amg_update! re-coarsening (PartitionedSolvers/src/amg.jl:925-942).
Each step of (I + dt(t) * K) x = x_prev below:

1. refills the system matrix + rhs values at frozen sparsity
   (``psystem_refill`` — a value scatter, no find_owner/ghost discovery),
2. re-coarsens the AMG hierarchy through its frozen Galerkin routing
   plans (``M.update`` — no aggregation, no symbolic products),
3. solves with the jit-cached CG (no re-trace: same operator structure).

    python examples/reuse_example.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import partitionedarrays_tpu as pat

backend = pat.SerialBackend(4)

# heat-equation-style system: M/dt + K with K the FDM Laplacian
n = (32, 32)
parts = (2, 2)
I, J, V, rows, cols = pat.laplacian_fdm(n, parts)
rowsR = pat.PRange(rows)
colsR = pat.PRange(cols)

# rhs contributions: one entry per own row (the "load vector")
Ib = [li.own_to_global for li in rowsR.partition()]
rng = np.random.default_rng(0)
x_prev_parts = [rng.standard_normal(i.size) for i in Ib]


def system_values(dt, x_prev_parts):
    """(I + dt*K) and b = x_prev at fixed sparsity."""
    Vs = []
    for Ii, Ji, Vi in zip(I, J, V):
        diag = (np.asarray(Ii) == np.asarray(Ji)).astype(np.float64)
        Vs.append(dt * np.asarray(Vi) + diag / 1.0)
    return Vs, x_prev_parts


dt0 = 1e-2
V0, b0 = system_values(dt0, x_prev_parts)
A, b, cache = pat.psystem(I, J, V0, Ib, b0, rowsR, colsR, backend, reuse=True)
M = pat.amg(A, pat.AMGParams(coarse_size=20))

x = None
for step in range(1, 4):
    dt = dt0 / step  # adaptive step size -> new VALUES, same sparsity
    Vs, bs = system_values(dt, x_prev_parts)
    b = pat.psystem_refill(A, Vs, bs, cache)   # value-only re-assembly
    M.update(A)                                # frozen-plan re-coarsening
    x, info = pat.cg(A, b, M=M, rtol=1e-10, maxiter=100)
    res = pat.collect(pat.spmv(A, x)) - pat.collect(b)
    relres = np.linalg.norm(res) / np.linalg.norm(pat.collect(b))
    print(f"step {step}: dt={dt:.3e} iters={int(info.iterations)} "
          f"relres={relres:.2e}")
    assert relres < 1e-8
    x_prev_parts = [np.asarray(v) for v in x.own_values()]

print("reuse example: OK (3 implicit steps, zero re-setup)")
