"""Reference-name aliases: every public name of PartitionedArrays.jl that
this framework re-designed under a different shape gets a thin adapter
here, so users migrating from the reference find the names they know.

Design notes (why these are aliases, not ports):
- The reference's three backend container types (plain Vector /
  DebugArray / MPIArray, src/debug_array.jl, src/mpi_array.jl) collapse
  into two SPMD drivers of ONE code path (backends.py); the debug/MPI
  names map onto them.
- The reference's zoo of AbstractLocalIndices subtypes
  (src/p_range.jl:1100-1673) collapses into one LocalIndices with
  optional permutation + functional owner map.
- SplitVector/SplitMatrix (src/p_vector.jl:120-265,
  src/p_sparse_matrix.jl:582-668) are not separate user-facing storage
  types here: the split own/ghost (4-block) layout IS the only device
  layout, carried by PVector/PSparseMatrix themselves.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .backends import MeshBackend, SerialBackend, with_mesh, with_serial
from .parallel.p_range import LocalIndices, PRange, renumber_partition
from .pvector import PVector, renumber_pvector
from .psparse import PSparseMatrix, psparse_from_blocks, renumber_matrix

# -- backend names (src/debug_array.jl:34, src/mpi_array.jl:105) -------------
DebugArray = SerialBackend
MPIArray = MeshBackend
with_mpi = with_mesh


def distribute_with_mpi(n_parts_or_devices=None):
    """Reference entry point (src/mpi_array.jl:42-53): obtain the
    distributed execution backend.  Here: a MeshBackend over the available
    devices (or the given ones)."""
    if isinstance(n_parts_or_devices, (list, tuple)):
        return MeshBackend(devices=n_parts_or_devices)
    import jax

    devs = jax.devices()
    if n_parts_or_devices is not None:
        devs = devs[: int(n_parts_or_devices)]
    return MeshBackend(devices=devs)


# -- index types (src/p_range.jl:877-946, 1231-1469) -------------------------
AbstractLocalIndices = LocalIndices


class OwnIndices:
    """Parity: OwnIndices (src/p_range.jl:877-896)."""

    def __init__(self, n_global: int, owner: int, indices):
        self.n_global = int(n_global)
        self.owner = int(owner)
        self.indices = np.asarray(indices)


class GhostIndices:
    """Parity: GhostIndices (src/p_range.jl:913-946)."""

    def __init__(self, n_global: int, indices=(), owners=()):
        self.n_global = int(n_global)
        self.indices = np.asarray(indices, dtype=np.int64).reshape(-1)
        self.owners = np.asarray(owners, dtype=np.int64).reshape(-1)


def OwnAndGhostIndices(
    own: OwnIndices,
    ghost: GhostIndices,
    global_to_owner=None,
    n_parts: Optional[int] = None,
) -> LocalIndices:
    """Parity: OwnAndGhostIndices (src/p_range.jl:1231-1370) — builds the
    unified LocalIndices (own block then ghost block)."""
    return LocalIndices(
        own.n_global,
        own.owner,
        n_parts if n_parts is not None else own.owner + 1,
        own.indices,
        ghost.indices,
        ghost.owners,
        global_to_owner=global_to_owner,
    )


def PermutedLocalIndices(li: LocalIndices, perm) -> LocalIndices:
    """Parity: PermutedLocalIndices (src/p_range.jl:1372-1469)."""
    return LocalIndices(
        li.n_global,
        li.part,
        li.n_parts,
        li.own_to_global,
        li.ghost_to_global,
        li.ghost_to_owner,
        perm=np.asarray(perm),
        global_to_owner=li.global_to_owner,
    )


def global_to_owner(li: LocalIndices, queries):
    """Parity: global_to_owner (src/p_range.jl:151-160)."""
    assert li.global_to_owner is not None
    return li.global_to_owner(np.asarray(queries))


# -- value accessors (src/p_vector.jl:361-391) -------------------------------
def local_values(x):
    """Per-part local (own+ghost, local order) values of a PVector."""
    return x.local_values()


def own_values(x):
    return x.own


def ghost_values(x):
    return x.ghost


def own_own_values(A: PSparseMatrix):
    return A.own_own_values()


def own_ghost_values(A: PSparseMatrix):
    return A.own_ghost_values()


def ghost_own_values(A: PSparseMatrix):
    return A.ghost_own_values()


def ghost_ghost_values(A: PSparseMatrix):
    return A.ghost_ghost_values()


# -- renumber (src/p_range.jl:782, p_vector.jl:1509, p_sparse_matrix.jl:2595)
def renumber(x, *args, **kwargs):
    """Type-dispatching alias over renumber_partition / renumber_pvector /
    renumber_matrix."""
    if isinstance(x, PVector):
        return renumber_pvector(x, *args, **kwargs)
    if isinstance(x, PSparseMatrix):
        return renumber_matrix(x, *args, **kwargs)
    if isinstance(x, PRange):
        return PRange(renumber_partition(x.partition()))
    return renumber_partition(x, *args, **kwargs)


# -- split-blocks constructor alias (src/p_sparse_matrix.jl:1307) ------------
psparse_from_split_blocks = psparse_from_blocks


# -- PTimer functional forms (src/p_timer.jl:98-121,73-84) -------------------
def tic(t, name: str) -> None:
    t.tic(name)


def toc(t, name: str) -> float:
    return t.toc(name)


def statistics(t):
    return t.statistics()


# -- block arrays (src/block_arrays.jl:54) -----------------------------------
def BArray(blocks):
    """Parity: BArray (src/block_arrays.jl:54-140) — dispatches to BVector
    (1-D list of PVector) or BMatrix (2-D nested list)."""
    from .block_arrays import BMatrix, BVector

    blocks = list(blocks)
    if blocks and isinstance(blocks[0], (list, tuple)):
        return BMatrix(blocks)
    return BVector(blocks)


# -- split-storage type names (src/p_vector.jl:46-265, p_sparse_matrix.jl:582)
def SplitVector(x: PVector) -> PVector:
    """Parity: SplitVector (src/p_vector.jl:120-265).  Here the split
    own/ghost layout is the ONLY device layout, so this returns the vector
    itself (converted if it came from a local buffer)."""
    from .pvector import split_vector

    return split_vector(x)


def OwnAndGhostVectors(x: PVector) -> PVector:
    """Parity: OwnAndGhostVectors (src/p_vector.jl:46-118) — deprecated in
    the reference in favor of SplitVector; same here."""
    return SplitVector(x)


def SplitMatrix(A: PSparseMatrix) -> PSparseMatrix:
    """Parity: SplitMatrix (src/p_sparse_matrix.jl:582-668).  The 4-block
    split layout is the only device layout here; returns the split form."""
    from .psparse import split_format

    return split_format(A)


def old_pvector(*args, **kwargs):
    """Parity: old_pvector! (src/PartitionedArrays.jl:127) — the
    reference's pre-0.4 constructor name; forwards to ``pvector``."""
    from .pvector import pvector

    return pvector(*args, **kwargs)


def old_psparse(*args, **kwargs):
    """Parity: old_psparse! (src/PartitionedArrays.jl:157) — the
    reference's pre-0.4 constructor name; forwards to ``psparse``."""
    from .psparse import psparse

    return psparse(*args, **kwargs)


def assembly_graph(pr_or_partition):
    """Parity: assembly_graph (src/p_range.jl:403-450) — the memoized
    assembly communication graph of a partition."""
    if isinstance(pr_or_partition, PRange):
        return pr_or_partition.assembly_graph()
    return PRange(list(pr_or_partition)).assembly_graph()


def laplace_matrix(nodes_per_dir, parts_per_dir=None, backend=None, dtype=np.float64):
    """Parity: PartitionedArrays.laplace_matrix
    (src/p_sparse_matrix.jl:2628-2707; deprecated upstream in favor of the
    gallery's laplacian_fdm): the UNSCALED (2D+1)-point Laplacian — diag
    2*D, off-diagonals -1, zero Dirichlet outside the box.

    Sequential form (one argument) returns a scipy CSR; the distributed
    form returns an assembled PSparseMatrix.  Node numbering is C-order
    (this framework's convention throughout; the reference numbers
    F-order — same operator up to a symmetric permutation).
    """
    from .models.gallery import laplacian_fdm
    from .psparse import psparse

    nodes = tuple(int(n) for n in nodes_per_dir)
    alpha = np.prod([n + 1 for n in nodes]).astype(dtype)
    if parts_per_dir is None:
        import scipy.sparse as sp

        from .ops.sparse_host import compresscoo

        I, J, V, rows, cols = laplacian_fdm(nodes, (1,) * len(nodes), dtype=dtype)
        n = int(np.prod(nodes))
        return compresscoo(
            np.concatenate(I), np.concatenate(J), np.concatenate(V) / alpha, n, n
        )
    assert backend is not None, "distributed laplace_matrix needs a backend"
    I, J, V, rows, cols = laplacian_fdm(nodes, parts_per_dir, dtype=dtype)
    V = [v / alpha for v in V]
    return psparse(I, J, V, PRange(rows), PRange(cols), backend, assembled=True)
