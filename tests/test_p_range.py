"""Partition-core tests.

The local_range expectations mirror the reference's documented values
(test/partition_tests.jl:6-15), shifted to 0-based indexing.
"""
import numpy as np
import pytest

from partitionedarrays_tpu.parallel.p_range import (
    LocalIndices,
    PRange,
    assembly_neighbors,
    block_owner_1d,
    find_owner,
    local_range,
    partition_from_color,
    renumber_partition,
    trivial_partition,
    uniform_partition,
    variable_partition,
)


def r(a, b):
    return range(a, b)


def test_local_range_reference_values():
    # reference: 1:3, 4:6, 7:10 for (p, np, n) = (*, 3, 10)
    assert local_range(0, 3, 10) == r(0, 3)
    assert local_range(1, 3, 10) == r(3, 6)
    assert local_range(2, 3, 10) == r(6, 10)
    # ghost=1: 1:4, 3:7, 6:10
    assert local_range(0, 3, 10, 1) == r(0, 4)
    assert local_range(1, 3, 10, 1) == r(2, 7)
    assert local_range(2, 3, 10, 1) == r(5, 10)
    # ghost=1 periodic: 0:4, 3:7, 6:11
    assert local_range(0, 3, 10, 1, True) == r(-1, 4)
    assert local_range(1, 3, 10, 1, True) == r(2, 7)
    assert local_range(2, 3, 10, 1, True) == r(5, 11)


def test_block_owner_1d():
    for np_parts, n in [(3, 10), (4, 4), (4, 17), (1, 5), (5, 5), (3, 7)]:
        owner = np.concatenate(
            [
                np.full(len(local_range(p, np_parts, n)), p)
                for p in range(np_parts)
            ]
        )
        got = block_owner_1d(np_parts, n, np.arange(n))
        assert np.array_equal(got, owner), (np_parts, n)


def test_uniform_partition_1d():
    part = uniform_partition(4, 20)
    assert len(part) == 4
    cover = np.concatenate([li.own_to_global for li in part])
    assert np.array_equal(np.sort(cover), np.arange(20))
    for li in part:
        assert li.n_ghost == 0


def test_uniform_partition_1d_ghost():
    part = uniform_partition(4, (12,), ghost=1)
    # middle parts have 2 ghosts, end parts 1
    assert part[0].n_ghost == 1
    assert part[1].n_ghost == 2
    assert part[3].n_ghost == 1
    # ghost of part1 are the neighbors' boundary cells
    li = part[1]
    assert set(li.ghost_to_global) == {2, 6}
    assert set(li.ghost_to_owner) == {0, 2}
    # local order is the box order: [2,3,4,5,6] -> local_to_global sorted
    assert np.array_equal(li.local_to_global(), np.array([2, 3, 4, 5, 6]))


def test_uniform_partition_periodic():
    part = uniform_partition(3, 9, ghost=1, periodic=True)
    li = part[0]
    assert set(li.ghost_to_global) == {8, 3}
    assert li.n_own == 3


def test_uniform_partition_2d():
    part = uniform_partition((2, 2), (4, 4), ghost=1)
    assert len(part) == 4
    cover = np.concatenate([li.own_to_global for li in part])
    assert np.array_equal(np.sort(cover), np.arange(16))
    li = part[0]  # owns rows 0-1, cols 0-1 in C order
    assert set(li.own_to_global) == {0, 1, 4, 5}
    # ghost = the L-shaped halo
    assert set(li.ghost_to_global) == {2, 6, 8, 9, 10}
    # owners consistent with find_owner
    owners = find_owner(part, [li.ghost_to_global])[0]
    assert np.array_equal(owners, li.ghost_to_owner)


def test_ghost_two_layers():
    part = uniform_partition(3, 12, ghost=2)
    li = part[1]  # owns 4..7, ghosts 2,3,8,9
    assert set(li.ghost_to_global) == {2, 3, 8, 9}


def test_variable_partition():
    part = variable_partition([3, 0, 5, 2])
    assert part[0].n_global == 10
    assert np.array_equal(part[2].own_to_global, np.arange(3, 8))
    owners = find_owner(part, [np.array([0, 2, 3, 7, 8, 9])])[0]
    assert np.array_equal(owners, [0, 0, 2, 2, 3, 3])


def test_partition_from_color():
    color = np.array([0, 1, 0, 2, 1, 2, 0])
    part = partition_from_color(3, color)
    assert np.array_equal(part[0].own_to_global, [0, 2, 6])
    owners = find_owner(part, [np.arange(7)])[0]
    assert np.array_equal(owners, color)


def test_trivial_partition():
    part = trivial_partition(3, 7)
    assert part[0].n_own == 7
    assert part[1].n_own == 0
    owners = find_owner(part, [np.array([0, 6])])[0]
    assert np.array_equal(owners, [0, 0])


def test_index_maps_roundtrip():
    part = uniform_partition((2, 2), (4, 4), ghost=1)
    for li in part:
        l2g = li.local_to_global()
        assert li.n_local == l2g.size
        # own/ghost decomposition
        o2l = li.own_to_local()
        g2l = li.ghost_to_local()
        assert np.array_equal(l2g[o2l], li.own_to_global)
        assert np.array_equal(l2g[g2l], li.ghost_to_global)
        # inverse maps
        assert np.array_equal(li.global_to_local(l2g), np.arange(li.n_local))
        assert np.array_equal(li.global_to_own(li.own_to_global), np.arange(li.n_own))
        # local_to_own / local_to_ghost
        lo = li.local_to_own()
        lg = li.local_to_ghost()
        assert np.all((lo >= 0) ^ (lg >= 0))
        # negative queries are skipped
        assert li.global_to_local([-1])[0] == -1
        # owner maps
        l2o = li.local_to_owner()
        assert np.all(l2o[o2l] == li.part)
        assert np.array_equal(l2o[g2l], li.ghost_to_owner)


def test_union_filter_replace_ghost():
    part = uniform_partition(4, 20)
    li = part[1]  # owns 5..9
    g, o = li.filter_ghost([5, 2, 2, 15, 9], [1, 0, 0, 3, 1])
    assert np.array_equal(g, [2, 15])
    assert np.array_equal(o, [0, 3])
    li2 = li.union_ghost([5, 2, 2, 15], [1, 0, 0, 3])
    assert np.array_equal(li2.ghost_to_global, [2, 15])
    li3 = li2.union_ghost([2, 17], [0, 3])
    assert np.array_equal(li3.ghost_to_global, [2, 15, 17])
    assert li3.remove_ghost().n_ghost == 0


def test_assembly_graph():
    part = uniform_partition(4, 12, ghost=1)
    pr = PRange(part)
    snd, rcv = assembly_neighbors(pr)
    # part 1 touches parts 0 and 2
    assert snd[1] == [0, 2]
    assert rcv[1] == [0, 2]
    g = pr.assembly_graph()
    # sent ghost ids land on matching own positions
    for j in range(4):
        for k, o in enumerate(g.neighbors_snd[j]):
            gids = part[j].ghost_to_global[g.snd_ghost[j][k]]
            kk = g.neighbors_rcv[o].index(j)
            own_pos = g.rcv_own[o][kk]
            assert np.array_equal(part[o].own_to_global[own_pos], gids)


def test_renumber_partition():
    color = np.array([1, 0, 1, 0, 2, 2, 0])
    part = partition_from_color(3, color)
    part = [li.union_ghost([0], [1]) if li.part == 0 else li for li in part]
    ren = renumber_partition(part)
    # own blocks become contiguous
    assert np.array_equal(ren[0].own_to_global, [0, 1, 2])
    assert np.array_equal(ren[1].own_to_global, [3, 4])
    assert np.array_equal(ren[2].own_to_global, [5, 6])
    # ghost relabeled: old id 0 (owner 1, first own there) -> new id 3
    assert np.array_equal(ren[0].ghost_to_global, [3])
