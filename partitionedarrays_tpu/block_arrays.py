"""Block-structured (multi-field) vectors/matrices over partitioned blocks.

Capability parity: src/block_arrays.jl — BRange (:2-52), BVector/BMatrix
(:54-140), forwarded ops/consistent/assemble (:142-174), reductions and
broadcast (:201-337), block mul! (:393-411).  Blocks are PVector /
PSparseMatrix; block operations fan out and join, and the communication of
all blocks is independent so XLA schedules it concurrently.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .parallel.p_range import PRange
from .psparse import PSparseMatrix, spmv
from .pvector import (
    PVector,
    Task,
    assemble,
    axpy,
    consistent,
    pall,
    pany,
    pdot,
    peuclidean,
    pfill,
    pmaximum,
    pminimum,
    psum_reduce,
    pzeros,
)


class BRange:
    """A concatenation of PRanges (parity: BRange, src/block_arrays.jl:2-52)."""

    def __init__(self, blocks: Sequence[PRange]):
        self.blocks = list(blocks)

    @property
    def n_global(self) -> int:
        return sum(b.n_global for b in self.blocks)

    @property
    def n_blocks(self) -> int:
        return len(self.blocks)

    def blocklasts(self) -> List[int]:
        out, acc = [], 0
        for b in self.blocks:
            acc += b.n_global
            out.append(acc)
        return out

    def __len__(self) -> int:
        return self.n_global

    def __getitem__(self, i: int) -> PRange:
        return self.blocks[i]

    def __repr__(self) -> str:
        return f"BRange(1:{self.n_global}, blocklasts={self.blocklasts()})"


class BVector:
    """Vector of PVector blocks (parity: BVector, src/block_arrays.jl:54-140)."""

    def __init__(self, blocks: Sequence[PVector]):
        self.blocks = list(blocks)

    @property
    def n_blocks(self) -> int:
        return len(self.blocks)

    # parity: blocksize/blocklength (BlockArrays interface)
    @property
    def blocksize(self):
        return (len(self.blocks),)

    @property
    def blocklength(self) -> int:
        return len(self.blocks)

    @property
    def n_global(self) -> int:
        return sum(b.n_global for b in self.blocks)

    def __len__(self) -> int:
        return self.n_global

    @property
    def dtype(self):
        return self.blocks[0].dtype

    def axes_brange(self) -> BRange:
        return BRange([b.layout.pr for b in self.blocks])

    # parity: a[Block(i)] / view(a, Block(i)) — 0-based here
    def block(self, i: int) -> PVector:
        return self.blocks[i]

    def __getitem__(self, i: int) -> PVector:
        return self.blocks[i]

    def __repr__(self) -> str:
        return (
            f"BVector({self.n_global} global, blocks="
            f"{[b.n_global for b in self.blocks]})"
        )

    # -- arithmetic (blockwise) ---------------------------------------
    def _map2(self, other, f):
        return BVector([f(a, b) for a, b in zip(self.blocks, other.blocks)])

    def __add__(self, o):
        if np.isscalar(o):
            return BVector([b + o for b in self.blocks])
        return self._map2(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        if np.isscalar(o):
            return BVector([b - o for b in self.blocks])
        return self._map2(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return BVector([o - b for b in self.blocks])

    def __mul__(self, s):
        return BVector([b * s for b in self.blocks])

    __rmul__ = __mul__

    def __truediv__(self, s):
        return BVector([b / s for b in self.blocks])

    def __neg__(self):
        return BVector([-b for b in self.blocks])

    def copy(self):
        return BVector([b.copy() for b in self.blocks])

    def similar(self, dtype=None) -> "BVector":
        """Parity: similar(a) — same layouts, uninitialized (zeros)."""
        return BVector(
            [
                pzeros(b.layout.pr, b.backend, dtype or b.dtype)
                for b in self.blocks
            ]
        )

    def fill(self, value) -> "BVector":
        """Parity: fill!(a,v) — functional (returns a new BVector)."""
        return BVector(
            [pfill(value, b.layout.pr, b.backend, b.dtype) for b in self.blocks]
        )

    # parity accessors forwarded to blocks (src/block_arrays.jl:142-158)
    def own_values(self):
        return [b.own_values() for b in self.blocks]

    def ghost_values(self):
        return [b.ghost_values() for b in self.blocks]

    def local_values(self):
        return [b.local_values() for b in self.blocks]


def b_axpy(a, x: BVector, y: BVector) -> BVector:
    return BVector([axpy(a, xb, yb) for xb, yb in zip(x.blocks, y.blocks)])


def b_dot(x: BVector, y: BVector):
    """Parity: dot over blocks (src/block_arrays.jl:201-337)."""
    acc = None
    for a, b in zip(x.blocks, y.blocks):
        d = pdot(a, b)
        acc = d if acc is None else acc + d
    return acc


def b_norm(x: BVector):
    return jnp.sqrt(b_dot(x, x))


def b_sum(x: BVector):
    """Parity: sum/reduce(+) over blocks (src/block_arrays.jl:201-337)."""
    acc = None
    for b in x.blocks:
        s = psum_reduce(b)
        acc = s if acc is None else acc + s
    return acc


def b_maximum(x: BVector):
    return max(float(pmaximum(b)) for b in x.blocks)


def b_minimum(x: BVector):
    return min(float(pminimum(b)) for b in x.blocks)


def b_any(x: BVector, pred=lambda v: v != 0):
    return any(bool(pany(b, pred)) for b in x.blocks)


def b_all(x: BVector, pred=lambda v: v != 0):
    return all(bool(pall(b, pred)) for b in x.blocks)


def b_euclidean(x: BVector, y: BVector):
    """Parity: Distances.euclidean on BVector."""
    acc = 0.0
    for a, b in zip(x.blocks, y.blocks):
        acc = acc + peuclidean(a, b) ** 2
    return jnp.sqrt(acc)


def b_consistent(x: BVector) -> Task:
    """Fan out to blocks and join (parity: consistent!,
    src/block_arrays.jl:160-174)."""
    tasks = [consistent(b) for b in x.blocks]
    return Task(BVector([t.wait() for t in tasks]))


def b_assemble(x: BVector) -> Task:
    tasks = [assemble(b) for b in x.blocks]
    return Task(BVector([t.wait() for t in tasks]))


def b_collect(x: BVector) -> np.ndarray:
    from .pvector import collect

    return np.concatenate([collect(b) for b in x.blocks])


class BMatrix:
    """Grid of PSparseMatrix blocks, None = zero block
    (parity: BMatrix + block mul!, src/block_arrays.jl:54-140, 393-411)."""

    def __init__(self, blocks: Sequence[Sequence[Optional[PSparseMatrix]]]):
        self.blocks = [list(row) for row in blocks]

    @property
    def shape_blocks(self):
        return (len(self.blocks), len(self.blocks[0]))

    @property
    def blocksize(self):
        return self.shape_blocks

    def _row_block(self, i: int) -> PSparseMatrix:
        for A in self.blocks[i]:
            if A is not None:
                return A
        raise ValueError(f"BMatrix block-row {i} is all-None")

    def _col_block(self, j: int) -> PSparseMatrix:
        for row in self.blocks:
            if row[j] is not None:
                return row[j]
        raise ValueError(f"BMatrix block-col {j} is all-None")

    @property
    def shape(self):
        nr, nc = self.shape_blocks
        rows = sum(self._row_block(i).shape[0] for i in range(nr))
        cols = sum(self._col_block(j).shape[1] for j in range(nc))
        return (rows, cols)

    def row_brange(self) -> BRange:
        nr, _ = self.shape_blocks
        return BRange([self._row_block(i).row_prange for i in range(nr)])

    def col_brange(self) -> BRange:
        _, nc = self.shape_blocks
        return BRange([self._col_block(j).col_prange for j in range(nc)])

    def nnz(self) -> int:
        return sum(A.nnz() for row in self.blocks for A in row if A is not None)

    def __repr__(self) -> str:
        return (
            f"BMatrix({self.shape[0]}x{self.shape[1]}, "
            f"blocks={self.shape_blocks}, nnz={self.nnz()})"
        )

    def block(self, i: int, j: int) -> Optional[PSparseMatrix]:
        return self.blocks[i][j]

    def __getitem__(self, ij) -> Optional[PSparseMatrix]:
        i, j = ij
        return self.blocks[i][j]

    # parity accessors (own_own_values etc. forwarded blockwise)
    def own_own_values(self):
        return [[A.own_own_values() if A is not None else None for A in row]
                for row in self.blocks]

    def own_ghost_values(self):
        return [[A.own_ghost_values() if A is not None else None for A in row]
                for row in self.blocks]

    def ghost_own_values(self):
        return [[A.ghost_own_values() if A is not None else None for A in row]
                for row in self.blocks]

    def ghost_ghost_values(self):
        return [[A.ghost_ghost_values() if A is not None else None for A in row]
                for row in self.blocks]

    def copy(self) -> "BMatrix":
        return BMatrix(
            [[A.copy() if A is not None else None for A in row]
             for row in self.blocks]
        )

    # -- blockwise algebra (parity: 2*A, +A, -A, B±A in block tests) ---
    def _map(self, f) -> "BMatrix":
        return BMatrix(
            [[f(A) if A is not None else None for A in row] for row in self.blocks]
        )

    def __mul__(self, s):
        if not np.isscalar(s):
            return NotImplemented
        return self._map(lambda A: A * s)

    __rmul__ = __mul__

    def __truediv__(self, s):
        return self._map(lambda A: A / s)

    def __neg__(self):
        return self._map(lambda A: -A)

    def __pos__(self):
        return self

    def _zip(self, other: "BMatrix", f) -> "BMatrix":
        out = []
        for ra, rb in zip(self.blocks, other.blocks):
            row = []
            for A, B in zip(ra, rb):
                if A is None and B is None:
                    row.append(None)
                elif A is None:
                    row.append(f(B * 0.0, B))
                elif B is None:
                    row.append(f(A, A * 0.0))
                else:
                    row.append(f(A, B))
            out.append(row)
        return BMatrix(out)

    def __add__(self, other):
        if not isinstance(other, BMatrix):
            return NotImplemented
        return self._zip(other, lambda A, B: A + B)

    def __sub__(self, other):
        if not isinstance(other, BMatrix):
            return NotImplemented
        return self._zip(other, lambda A, B: A - B)

    def mul(self, x: BVector) -> BVector:
        nr, nc = self.shape_blocks
        out = []
        for i in range(nr):
            acc = None
            for j in range(nc):
                A = self.blocks[i][j]
                if A is None:
                    continue
                xb = x.blocks[j]
                clay = A.col_layout()
                if xb.layout is not clay:
                    xb = PVector(
                        xb.own,
                        jnp.zeros((xb.own.shape[0], clay.n_ghost_pad), xb.own.dtype),
                        clay,
                        xb.backend,
                    )
                y = spmv(A, xb)
                acc = y if acc is None else PVector(
                    acc.own + y.own, acc.ghost, acc.layout, acc.backend
                )
            assert acc is not None, "BMatrix row with all-None blocks"
            out.append(acc)
        return BVector(out)


def b_mul(A: BMatrix, x: BVector) -> BVector:
    return A.mul(x)


def b_cg(
    A: BMatrix,
    b: BVector,
    x0: Optional[BVector] = None,
    rtol: float = 1e-6,
    maxiter: int = 1000,
):
    """CG on a block system (parity: IterativeSolvers.cg on BMatrix,
    test/block_arrays_tests.jl:164-166).  Host-controlled loop over jitted
    block SpMV/dot/axpy steps.  Returns (x, iters, relres)."""
    x = x0.copy() if x0 is not None else (b * 0.0)
    r = b - b_mul(A, x) if x0 is not None else b.copy()
    p = r.copy()
    rz = float(b_dot(r, r))
    bnorm = float(b_norm(b))
    if bnorm == 0.0:
        return x, 0, 0.0
    it = 0
    while it < maxiter and np.sqrt(rz) / bnorm > rtol:
        Ap = b_mul(A, p)
        alpha = rz / float(b_dot(p, Ap))
        x = b_axpy(alpha, p, x)
        r = b_axpy(-alpha, Ap, r)
        rz_new = float(b_dot(r, r))
        beta = rz_new / rz
        p = BVector([rb + beta * pb for rb, pb in zip(r.blocks, p.blocks)])
        rz = rz_new
        it += 1
    return x, it, float(np.sqrt(rz) / bnorm)
