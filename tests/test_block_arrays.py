"""Block-array tests mirroring the reference suite
(test/block_arrays_tests.jl:10-168): BRange structure, BVector algebra /
reductions / broadcast / assembly, BMatrix built from laplacian_fem blocks,
blockwise scalar algebra, block SpMV and CG convergence."""
import numpy as np
import pytest

from partitionedarrays_tpu.block_arrays import (
    BMatrix,
    BRange,
    BVector,
    b_all,
    b_any,
    b_assemble,
    b_cg,
    b_collect,
    b_consistent,
    b_dot,
    b_euclidean,
    b_maximum,
    b_minimum,
    b_mul,
    b_norm,
    b_sum,
)
from partitionedarrays_tpu.models.gallery import laplacian_fem
from partitionedarrays_tpu.parallel.p_range import PRange, uniform_partition
from partitionedarrays_tpu.psparse import psparse, spmv, to_global_scipy
from partitionedarrays_tpu.pvector import collect, consistent, pones, pzeros


def _rows66(backend):
    # parity: uniform_partition(rank,(2,2),(6,6)) — block_arrays_tests.jl:19
    return PRange(uniform_partition((2, 2), (6, 6)))


def test_brange(backend4):
    r1 = _rows66(backend4)
    r = BRange([r1, r1])
    assert r.n_global == 72
    assert r.blocklasts() == [36, 72]
    assert len(r) == 72
    assert r[0] is r1 and r[1] is r1
    assert "BRange" in repr(r)


def test_bvector_structure_and_algebra(backend4):
    r1 = _rows66(backend4)
    a1 = pones(r1, backend4)
    a2 = pzeros(r1, backend4)
    a = BVector([a1, a2])
    # parity: size/blocksize/blocklength — block_arrays_tests.jl:50-52
    assert len(a) == 72
    assert a.blocksize == (2,)
    assert a.blocklength == 2
    rows = a.axes_brange()
    assert isinstance(rows, BRange)
    assert len(a) == len(rows)
    # parity: a[Block(i)] — :59-63
    assert a[0] is a1 and a.block(1) is a2
    # similar / copy / fill — :71-77
    b = a.similar()
    assert b.blocksize == (2,)
    assert np.allclose(b_collect(b), 0.0)
    b = a.copy()
    assert type(b) is type(a)
    b = a.fill(5.0)
    assert np.allclose(b_collect(b), 5.0)
    # assemble/consistent — :80-81
    a = b_assemble(a).wait()
    a = b_consistent(a).wait()
    # reductions — :83-87
    z = a.fill(0.0)
    assert b_any(z, lambda v: v > 0) is False
    assert b_all(z, lambda v: v == 0) is True
    assert b_minimum(z) <= b_maximum(z)
    # scalar algebra + broadcast — :89-115
    b = 2 * a
    b = a * 2
    b = a / 2
    c = a + a
    c = a + b + a
    assert isinstance(c, BVector)
    c = a - b
    c = a + b
    one = a.fill(1.0)
    r = b_sum(one)
    assert float(r) == pytest.approx(72.0)
    assert float(b_norm(one)) > 0
    assert float(np.sqrt(b_dot(one, one))) == pytest.approx(float(b_norm(one)))
    assert float(b_euclidean(one, one)) + 1 == pytest.approx(1.0)
    w = 1 + b
    assert isinstance(w, BVector)
    w = b + 1
    assert isinstance(w, BVector)
    w = b + w - one
    assert isinstance(w, BVector)
    w = b + 1 - one
    assert isinstance(w, BVector)
    assert np.allclose(b_collect(2 * one), 2.0)
    assert np.allclose(b_collect(-one), -1.0)


def _fem_block(backend):
    # parity: laplacian_fem((4,4),(2,2)) → psparse — block_arrays_tests.jl:118-121
    I, J, V, rows, cols = laplacian_fem((4, 4), (2, 2))
    return psparse(I, J, V, PRange(rows), PRange(cols), backend)


def test_bmatrix(backend4):
    A11 = _fem_block(backend4)
    assert A11.shape == (16, 16)
    A = BMatrix([[A11, A11], [A11, A11]])
    # parity: blocksize/size — :133-134
    assert A.blocksize == (2, 2)
    assert A.shape == (32, 32)
    assert A.nnz() == 4 * A11.nnz()
    assert A[0, 0] is A11
    # forwarded accessors — :136-139
    assert len(A.own_own_values()) == 2
    assert len(A.own_ghost_values()[0]) == 2
    A.ghost_own_values()
    A.ghost_ghost_values()
    B = A.copy()
    assert B.nnz() == A.nnz()
    ax = A.col_brange()
    assert isinstance(ax, BRange)
    assert len(ax) == 32

    # x = ones over the column axes; block mul — :146-154
    x = BVector([pones(A11.col_prange, backend4), pones(A11.col_prange, backend4)])
    x = b_assemble(x).wait()
    x = b_consistent(x).wait()
    b = b_mul(A, x)
    assert isinstance(b, BVector)
    expected_row = 2 * collect(spmv(A11, x.blocks[0]))
    assert np.allclose(b_collect(b), np.tile(expected_row, 2), atol=1e-12)

    # blockwise scalar algebra — :155-160
    B = 2 * A
    assert B.nnz() == A.nnz()
    assert np.allclose(b_collect(b_mul(B, x)), 2 * b_collect(b))
    B = A * 2
    B = +A
    B = -A
    assert np.allclose(b_collect(b_mul(B, x)), -b_collect(b))
    C = (2 * A) + A
    assert np.allclose(b_collect(b_mul(C, x)), 3 * b_collect(b))
    D = (2 * A) - A
    assert np.allclose(b_collect(b_mul(D, x)), b_collect(b))


def test_bmatrix_offdiag_none_and_cg(backend4):
    A11 = _fem_block(backend4)
    # SPD block system [[A,0],[0,A]] with None off-diagonal blocks
    A = BMatrix([[A11, None], [None, A11]])
    x_exact = BVector(
        [pones(A11.col_prange, backend4), pones(A11.col_prange, backend4)]
    )
    x_exact = b_consistent(x_exact).wait()
    b = b_mul(A, x_exact)
    # parity: IterativeSolvers.cg(A, b) on a block system — :162-166
    x, iters, relres = b_cg(A, b, rtol=1e-10, maxiter=200)
    assert isinstance(x, BVector)
    assert relres < 1e-10
    assert np.allclose(b_collect(x), b_collect(x_exact), atol=1e-6)


def test_psparse_scalar_and_additive_ops(backend4):
    """The underlying per-block ops: 2*A, A/2, -A, A+B, A-B on PSparseMatrix."""
    A = _fem_block(backend4)
    Ag = to_global_scipy(A).toarray()
    assert np.allclose(to_global_scipy(2 * A).toarray(), 2 * Ag)
    assert np.allclose(to_global_scipy(A * 2).toarray(), 2 * Ag)
    assert np.allclose(to_global_scipy(A / 2).toarray(), Ag / 2)
    assert np.allclose(to_global_scipy(-A).toarray(), -Ag)
    assert (+A) is A
    B = 2 * A
    assert np.allclose(to_global_scipy(A + B).toarray(), 3 * Ag)
    assert np.allclose(to_global_scipy(B - A).toarray(), Ag)
    C = A.copy()
    assert np.allclose(to_global_scipy(C).toarray(), Ag)
    assert C.blocks[0]["oo"] is not A.blocks[0]["oo"]
