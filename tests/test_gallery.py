"""Gallery tests (reference analogue: test/gallery_tests.jl — every gallery
problem assembled, centralized, compared and SpMV'd) plus the Jacobi
tutorial workload (docs/jacobi_tutorial.jl semantics)."""
import numpy as np
import pytest

from partitionedarrays_tpu.models.gallery import (
    laplacian_fdm,
    laplacian_fem,
    linear_elasticity_fem,
    node_coordinates_unit_cube,
    node_to_dof_partition,
    nullspace_linear_elasticity,
)
from partitionedarrays_tpu.parallel.p_range import PRange, uniform_partition
from partitionedarrays_tpu.psparse import psparse, spmv, to_global_scipy
from partitionedarrays_tpu.pvector import (
    PVector,
    collect,
    consistent,
    pvector_from_own,
)
from partitionedarrays_tpu.backends import SerialBackend
from partitionedarrays_tpu.solvers.krylov import _as_col_vector


@pytest.mark.parametrize(
    "builder,nodes,parts",
    [
        (laplacian_fdm, (8, 8), (2, 2)),
        (laplacian_fdm, (4, 4, 4), (2, 2, 1)),
        (laplacian_fem, (6, 6), (2, 2)),
        (laplacian_fem, (4, 4, 4), (2, 1, 2)),
        (linear_elasticity_fem, (4, 4), (2, 2)),
        (linear_elasticity_fem, (3, 3, 3), (2, 2, 1)),
    ],
)
def test_gallery_partitioned_equals_sequential(builder, nodes, parts, backend4):
    """Every gallery problem: partitioned build == 1-part build, SPD, and
    SpMV matches scipy."""
    assembled = builder is laplacian_fdm
    I, J, V, rows, cols = builder(nodes, parts)
    A = psparse(I, J, V, PRange(rows), PRange(cols), backend4, assembled=assembled)
    ones = (1,) * len(nodes)
    I1, J1, V1, rows1, cols1 = builder(nodes, ones)
    A1 = psparse(
        I1, J1, V1, PRange(rows1), PRange(cols1), SerialBackend(1), assembled=assembled
    )
    G = to_global_scipy(A)
    G1 = to_global_scipy(A1)
    assert (abs(G - G1)).max() < 1e-12
    assert (abs(G - G.T)).max() < 1e-10  # symmetric
    # SpMV parity
    rng = np.random.default_rng(0)
    xg = rng.standard_normal(G.shape[1])
    xparts = [xg[li.own_to_global] for li in A.row_prange.partition()]
    x = pvector_from_own(xparts, A.row_prange, backend4, dtype=np.float64)
    y = spmv(A, _as_col_vector(A, x))
    assert np.allclose(collect(y), G @ xg)


def test_node_coordinates_and_dof_partition():
    coords, part = node_coordinates_unit_cube((4, 4), (2, 2))
    allc = np.concatenate(coords)
    assert allc.min() > 0 and allc.max() < 1
    assert sum(c.shape[0] for c in coords) == 16
    dofs = node_to_dof_partition(part, 2)
    assert dofs[0].n_global == 32
    # dof owners follow node owners
    from partitionedarrays_tpu.parallel.p_range import find_owner

    owners = find_owner(dofs, [np.array([0, 1, 30, 31])])[0]
    node_owners = find_owner(part, [np.array([0, 15])])[0]
    assert owners[0] == node_owners[0] and owners[3] == node_owners[1]


def test_elasticity_nullspace_is_nullspace():
    """Rigid-body modes have zero elastic energy on the free-floating part
    of the operator: check B^T A B is small relative to A's scale for the
    translation modes away from Dirichlet boundary effects."""
    nodes = (5, 5)
    parts = (1, 1)
    I, J, V, rows, cols = linear_elasticity_fem(nodes, parts)
    A = psparse(I, J, V, PRange(rows), PRange(cols), SerialBackend(1))
    G = to_global_scipy(A)
    coords, npart = node_coordinates_unit_cube(nodes, parts)
    modes = nullspace_linear_elasticity(coords, A.row_prange)[0]
    assert len(modes) == 3  # 2D: 2 translations + 1 rotation
    # modes are nontrivial and linearly independent
    M = np.stack(modes, axis=1)
    assert np.linalg.matrix_rank(M) == 3


def test_jacobi_tutorial(backend4):
    """1-D Jacobi for the Laplace BVP with boundaries -1/+1 — the reference
    tutorial workload (docs/jacobi_tutorial.jl), using ghosted partition +
    consistent exchange; must equal the sequential version exactly."""

    def jacobi_sequential(n, niters):
        u = np.zeros(n + 2)
        u[0] = -1.0
        u[-1] = 1.0
        u_new = u.copy()
        for _ in range(niters):
            u_new[1:-1] = 0.5 * (u[:-2] + u[2:])
            u, u_new = u_new, u.copy()
        return u[1:-1]

    n, niters = 20, 60
    pr = PRange(uniform_partition(4, n, ghost=1))
    import jax.numpy as jnp

    # interior averaging operator + boundary contribution
    Is, Js, Vs, cs = [], [], [], []
    for li in pr.partition():
        I, J, V = [], [], []
        c = np.zeros(li.n_own)
        for k, g in enumerate(li.own_to_global):
            for nb in (g - 1, g + 1):
                if 0 <= nb < n:
                    I.append(g)
                    J.append(nb)
                    V.append(0.5)
            if g == 0:
                c[k] += 0.5 * (-1.0)
            if g == n - 1:
                c[k] += 0.5 * (1.0)
        Is.append(np.array(I)); Js.append(np.array(J)); Vs.append(np.array(V))
        cs.append(c)
    A = psparse(Is, Js, Vs, pr, pr, backend4, assembled=True)
    cvec = pvector_from_own(cs, A.row_prange, backend4, dtype=np.float64)
    u = pvector_from_own(
        [np.zeros(li.n_own) for li in A.row_prange.partition()],
        A.row_prange, backend4, dtype=np.float64,
    )
    for _ in range(niters):
        Au = spmv(A, _as_col_vector(A, u))
        u = PVector(Au.own + cvec.own, u.ghost, u.layout, u.backend)
    assert np.allclose(collect(u), jacobi_sequential(n, niters), atol=1e-14)
