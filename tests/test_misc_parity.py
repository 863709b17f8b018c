"""Parity extras: distances, find_local_indices, renumber for
vector/matrix (reference: src/p_vector.jl:1279-1525,
src/p_sparse_matrix.jl:2595-2622)."""
import numpy as np
import pytest

from partitionedarrays_tpu import (
    PRange,
    collect,
    find_local_indices,
    pchebyshev,
    pcityblock,
    pdot,
    peuclidean,
    pones,
    psparse,
    psqeuclidean,
    pvector_from_own,
    renumber_matrix,
    renumber_pvector,
    spmv,
    to_global_scipy,
    uniform_partition,
    partition_from_color,
)
from partitionedarrays_tpu.solvers.krylov import _as_col_vector


def test_distances(backend4):
    pr = PRange(uniform_partition(4, 20))
    rng = np.random.default_rng(0)
    ag, bg = rng.standard_normal(20), rng.standard_normal(20)
    a = pvector_from_own([ag[li.own_to_global] for li in pr.partition()], pr, backend4, dtype=np.float64)
    b = pvector_from_own([bg[li.own_to_global] for li in pr.partition()], pr, backend4, dtype=np.float64)
    assert float(peuclidean(a, b)) == pytest.approx(np.linalg.norm(ag - bg))
    assert float(psqeuclidean(a, b)) == pytest.approx(np.sum((ag - bg) ** 2))
    assert float(pcityblock(a, b)) == pytest.approx(np.abs(ag - bg).sum())
    assert float(pchebyshev(a, b)) == pytest.approx(np.abs(ag - bg).max())


def test_find_local_indices(backend4):
    pr = PRange(uniform_partition(4, 16, ghost=1))
    mask_vals = np.zeros(16)
    mask_vals[::2] = 1.0  # select even global ids
    mask = pvector_from_own(
        [mask_vals[li.own_to_global] for li in pr.partition()], pr, backend4,
        dtype=np.float64,
    )
    sub_pr, new_of_old = find_local_indices(mask)
    assert sub_pr.n_global == 8
    got = np.sort(np.flatnonzero(new_of_old >= 0))
    assert np.array_equal(got, np.arange(0, 16, 2))
    # new ids are a permutation of 0..7
    assert np.array_equal(np.sort(new_of_old[new_of_old >= 0]), np.arange(8))


def test_renumber_pvector_and_matrix(backend4):
    color = np.array([2, 0, 1, 0, 3, 2, 1, 3, 0, 1, 2, 3])
    pr = PRange(partition_from_color(4, color))
    n = 12
    vals = np.arange(n, dtype=np.float64)
    x = pvector_from_own([vals[li.own_to_global] for li in pr.partition()], pr, backend4, dtype=np.float64)
    y = renumber_pvector(x)
    # renumbered vector holds the same values per part (own order kept)
    for vo, vn in zip(x.own_values(), y.own_values()):
        assert np.array_equal(vo, vn)
    # matrix renumbering preserves spectra/action up to permutation
    Is = [li.own_to_global for li in pr.partition()]
    Vs = [np.full(li.n_own, 2.0) for li in pr.partition()]
    A = psparse(Is, Is, Vs, pr, pr, backend4, assembled=True)
    B = renumber_matrix(A)
    GB = to_global_scipy(B)
    assert np.allclose(GB.diagonal(), 2.0)
    assert B.row_prange.partition()[0].own_to_global[0] == 0
