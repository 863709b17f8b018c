"""PVector tests, run on both the serial (vmap) and mesh (shard_map)
backends — the analogue of the reference's shared test bodies executed under
with_debug and with_mpi (reference: test/p_vector_tests.jl)."""
import jax.numpy as jnp
import numpy as np
import pytest

from partitionedarrays_tpu.parallel.p_range import PRange, uniform_partition
from partitionedarrays_tpu.pvector import (
    assemble,
    axpy,
    collect,
    consistent,
    pdot,
    pfill,
    pnorm,
    pones,
    pvector,
    pvector_from_local,
    pvector_from_own,
    pany,
    pall,
    pmaximum,
    pminimum,
    psum_reduce,
    pzeros,
    repartition,
)
from partitionedarrays_tpu.parallel.p_range import variable_partition


def make_pr(ghost=1, n=20, P=4):
    return PRange(uniform_partition(P, n, ghost=ghost))


def test_fill_and_reduce(backend4):
    pr = make_pr()
    x = pones(pr, backend4, dtype=jnp.float64)
    assert float(psum_reduce(x)) == 20.0
    assert float(pdot(x, x)) == 20.0
    assert float(pnorm(x)) == pytest.approx(np.sqrt(20.0))
    assert float(pmaximum(x)) == 1.0
    assert float(pminimum(x)) == 1.0
    assert bool(pall(x))
    y = pzeros(pr, backend4, dtype=jnp.float64)
    assert not bool(pany(y))


def test_scalar_ops_keep_padding(backend4):
    pr = PRange(uniform_partition(4, 18, ghost=1))  # ragged: pads exist
    x = pones(pr, backend4, dtype=jnp.float64)
    y = (x + 1.0) * 3.0 - x
    # own values are 5, pads must remain 0 so the sum is exact
    assert float(psum_reduce(y)) == pytest.approx(5.0 * 18)
    assert float(pmaximum(-y)) == -5.0


def test_consistent(backend4):
    pr = make_pr()
    # own value = its global id
    own_parts = [li.own_to_global.astype(np.float64) for li in pr.partition()]
    x = pvector_from_own(own_parts, pr, backend4)
    x = consistent(x).wait()
    for li, gv in zip(pr.partition(), x.ghost_values()):
        assert np.array_equal(gv, li.ghost_to_global.astype(np.float64))


def test_assemble_adds_and_zeroes(backend4):
    pr = make_pr()
    x = pzeros(pr, backend4, dtype=jnp.float64)
    # put 1.0 in every ghost slot
    gh = jnp.asarray(
        np.stack(
            [
                (np.arange(x.layout.n_ghost_pad) < li.n_ghost).astype(np.float64)
                for li in pr.partition()
            ]
        )
    )
    x.ghost = x.backend.shard(gh)
    x = assemble(x).wait()
    # each own index receives one contribution per part that ghosts it
    expected = np.zeros(pr.n_global)
    for li in pr.partition():
        for g in li.ghost_to_global:
            expected[g] += 1.0
    assert np.allclose(collect(x), expected)
    assert np.allclose(np.asarray(x.ghost), 0.0)


def test_consistent_2d(backend4):
    pr = PRange(uniform_partition((2, 2), (6, 6), ghost=1))
    own_parts = [li.own_to_global.astype(np.float64) for li in pr.partition()]
    x = pvector_from_own(own_parts, pr, backend4)
    x = consistent(x).wait()
    for li, gv in zip(pr.partition(), x.ghost_values()):
        assert np.array_equal(gv, li.ghost_to_global.astype(np.float64))


def test_pvector_coo_assembly(backend4):
    # reproducible COO contributions incl. off-owner rows
    pr = PRange(uniform_partition(4, 12))
    rng = np.random.default_rng(0)
    Is, Vs = [], []
    expected = np.zeros(12)
    for li in pr.partition():
        ids = rng.integers(0, 12, size=15)
        vals = rng.standard_normal(15)
        Is.append(ids)
        Vs.append(vals)
        np.add.at(expected, ids, vals)
    x = pvector(Is, Vs, pr, backend4)
    assert np.allclose(collect(x), expected)


def test_local_values_roundtrip(backend4):
    pr = make_pr()
    locs = [np.arange(li.n_local, dtype=np.float64) + li.part for li in pr.partition()]
    x = pvector_from_local(locs, pr, backend4)
    for a, b in zip(x.local_values(), locs):
        assert np.array_equal(a, b)


def test_axpy_and_arithmetic(backend4):
    pr = make_pr()
    x = pfill(2.0, pr, backend4, dtype=jnp.float64)
    y = pones(pr, backend4, dtype=jnp.float64)
    z = axpy(3.0, x, y)  # 1 + 3*2 = 7
    assert np.allclose(collect(z), 7.0)
    w = z - x  # 5
    assert float(pdot(w, y)) == pytest.approx(5.0 * 20)
    v = w / z
    assert np.allclose(collect(v), 5.0 / 7.0)


def test_repartition(backend4):
    pr = make_pr(ghost=0)
    own_parts = [li.own_to_global.astype(np.float64) for li in pr.partition()]
    x = pvector_from_own(own_parts, pr, backend4)
    pr2 = PRange(variable_partition([2, 8, 4, 6]))
    y = repartition(x, pr2)
    assert np.allclose(collect(y), np.arange(20, dtype=np.float64))


def test_reference_exact_consistent_assemble(backend4):
    """The reference's arbitrary overlapping LocalIndices scenario with
    exact expected local values (test/p_vector_tests.jl:95-143, shifted
    to 0-based ids)."""
    import jax.numpy as jnp

    from partitionedarrays_tpu.parallel.p_range import LocalIndices
    from partitionedarrays_tpu.pvector import PVector, assemble, consistent

    n = 10
    specs = [
        ([0, 1, 2, 4, 6, 7], [0, 0, 0, 1, 2, 2]),
        ([1, 3, 4, 9], [0, 1, 1, 3]),
        ([5, 6, 7, 4, 3, 9], [2, 2, 2, 1, 1, 3]),
        ([0, 2, 6, 8, 9], [0, 0, 2, 3, 3]),
    ]
    parts = [
        LocalIndices.from_local(n, p, 4, np.array(g), np.array(o))
        for p, (g, o) in enumerate(specs)
    ]
    pr = PRange(parts)
    x = pvector_from_own(
        [np.full(li.n_own, 10.0 * (p + 1)) for p, li in enumerate(parts)],
        pr,
        backend4,
        dtype=np.float64,
    )
    x = consistent(x).wait()
    # every local value equals 10 * (owner + 1)
    for li, loc in zip(parts, x.local_values()):
        exp = 10.0 * (np.asarray(li.local_to_owner()) + 1)
        assert np.array_equal(np.asarray(loc), exp)

    # fill ALL local values with 10, assemble: owners accumulate one 10
    # per holder, ghosts zeroed (reference expected locals :131-142)
    lay = x.layout
    P = len(parts)
    gh = np.zeros((P, max(lay.n_ghost_pad, 1)))
    own = np.zeros((P, lay.n_own_pad))
    for p, li in enumerate(parts):
        own[p, : li.n_own] = 10.0
        gh[p, : li.n_ghost] = 10.0
    y = PVector(
        backend4.shard(jnp.asarray(own)),
        backend4.shard(jnp.asarray(gh)),
        lay,
        backend4,
    )
    y = assemble(y).wait()
    expected = [
        [20.0, 20.0, 20.0, 0.0, 0.0, 0.0],
        [0.0, 20.0, 30.0, 0.0],
        [10.0, 30.0, 20.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 10.0, 30.0],
    ]
    for loc, exp in zip(y.local_values(), expected):
        assert np.array_equal(np.asarray(loc), np.array(exp))
    assert np.array_equal(
        collect(y), np.array([20.0, 20, 20, 20, 30, 10, 30, 20, 10, 30])
    )


def test_pvector_local_matches_generic(backend4):
    """pvector_local (the per-process rhs constructor) assembles the same
    vector as the generic pvector on disassembled contributions."""
    import numpy as np

    from partitionedarrays_tpu import PRange, pvector, pvector_local
    from partitionedarrays_tpu.parallel.p_range import uniform_partition

    n, P = 40, 4
    rng = np.random.default_rng(0)
    pr = PRange(uniform_partition(P, n))
    I = [rng.integers(0, n, 25) for _ in range(P)]
    V = [rng.standard_normal(25) for _ in range(P)]
    ref = pvector(I, V, pr, backend4)
    got = pvector_local(I, V, PRange(uniform_partition(P, n)), backend4)
    exp = np.zeros(n)
    for p in range(P):
        np.add.at(exp, I[p], V[p])
    for p, li in enumerate(got.layout.pr.partition()):
        g = np.asarray(got.own)[p, : li.n_own]
        assert np.abs(g - exp[li.own_to_global]).max() < 1e-10
    for p, li in enumerate(ref.layout.pr.partition()):
        r = np.asarray(ref.own)[p, : li.n_own]
        assert np.abs(r - exp[li.own_to_global]).max() < 1e-10


def test_pvector_eq_value_semantics(backend4):
    """== compares values over own indices on compatible partitions —
    object identity of the partitions is NOT required (parity: ==,
    src/p_vector.jl:1092-1096)."""
    from partitionedarrays_tpu.parallel.p_range import PRange, uniform_partition
    from partitionedarrays_tpu.pvector import pvector_from_own

    pr1 = PRange(uniform_partition(4, 20))
    pr2 = PRange(uniform_partition(4, 20))  # distinct object, same layout
    vals = [np.arange(li.n_own, dtype=np.float64) + li.part for li in pr1.partition()]
    a = pvector_from_own(vals, pr1, backend4)
    b = pvector_from_own([v.copy() for v in vals], pr2, backend4)
    assert a == b
    vals2 = [v.copy() for v in vals]
    vals2[2][0] += 1.0
    c = pvector_from_own(vals2, pr2, backend4)
    assert not (a == c)
    # incompatible own indices raise (the reference boundschecks)
    pr3 = PRange(uniform_partition(4, 24))
    d = pvector_from_own(
        [np.zeros(li.n_own) for li in pr3.partition()], pr3, backend4
    )
    assert not (a == d)  # different global length -> plain False


def test_pdistance_generic_metric(backend4):
    """User-supplied metric over PVector pairs (parity: the Distances.jl
    metric support, src/p_vector.jl:1279-1319)."""
    import jax.numpy as jnp

    from partitionedarrays_tpu.parallel.p_range import PRange, uniform_partition
    from partitionedarrays_tpu.pvector import pdistance, pvector_from_own

    rng = np.random.default_rng(2)
    pr = PRange(uniform_partition(4, 37))
    xs = [rng.standard_normal(li.n_own) for li in pr.partition()]
    ys = [rng.standard_normal(li.n_own) for li in pr.partition()]
    x = pvector_from_own(xs, pr, backend4)
    y = pvector_from_own(ys, pr, backend4)
    xg, yg = np.concatenate(xs), np.concatenate(ys)

    def minkowski3(a, b):
        return jnp.abs(a - b) ** 3

    got = float(pdistance(x, y, minkowski3, "sum", lambda s: s ** (1.0 / 3.0)))
    exp = (np.abs(xg - yg) ** 3).sum() ** (1.0 / 3.0)
    assert abs(got - exp) < 1e-10 * max(exp, 1.0)

    def absdiff(a, b):
        return jnp.abs(a - b)

    got = float(pdistance(x, y, absdiff, "max"))
    assert abs(got - np.abs(xg - yg).max()) < 1e-12


def test_spmtv_five_arg(backend4):
    """alpha/beta epilogue of the transpose SpMV (parity: 5-arg transpose
    mul!, src/p_sparse_matrix.jl:2144-2162)."""
    from partitionedarrays_tpu.models.gallery import laplacian_fem
    from partitionedarrays_tpu.parallel.p_range import PRange
    from partitionedarrays_tpu.psparse import psparse, spmtv, to_global_scipy
    from partitionedarrays_tpu.pvector import collect, pvector_from_own

    I, J, V, rows, cols = laplacian_fem((6, 6), (2, 2))
    A = psparse(I, J, V, PRange(rows), PRange(cols), backend4,
                assembled=False, assemble=True)
    rng = np.random.default_rng(3)
    xg = rng.standard_normal(A.shape[0])
    yg = rng.standard_normal(A.shape[1])
    x = pvector_from_own(
        [xg[li.own_to_global] for li in A.row_prange.partition()],
        A.row_prange, backend4,
    )
    y = pvector_from_own(
        [yg[li.own_to_global] for li in A.col_prange.partition()],
        A.col_prange, backend4,
    )
    got = collect(spmtv(A, x, alpha=2.5, beta=-0.5, y=y))
    G = to_global_scipy(A)
    exp = 2.5 * (G.T @ xg) - 0.5 * yg
    np.testing.assert_allclose(got, exp, rtol=1e-10, atol=1e-12)
