"""Block-structured (multi-field) vectors/matrices over partitioned blocks.

Capability parity: src/block_arrays.jl — BRange (:2-52), BVector/BMatrix
(:54-140), forwarded ops/consistent/assemble (:142-174), reductions and
block mul! (:201-411).  Blocks are PVector / PSparseMatrix; block
operations fan out and join, and the communication of all blocks is
independent so XLA schedules it concurrently.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .parallel.p_range import PRange
from .psparse import PSparseMatrix, spmv
from .pvector import PVector, Task, assemble, axpy, consistent, pdot


class BRange:
    """A concatenation of PRanges (parity: BRange, src/block_arrays.jl:2-52)."""

    def __init__(self, blocks: Sequence[PRange]):
        self.blocks = list(blocks)

    @property
    def n_global(self) -> int:
        return sum(b.n_global for b in self.blocks)

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


class BVector:
    """Vector of PVector blocks (parity: BVector, src/block_arrays.jl:54-140)."""

    def __init__(self, blocks: Sequence[PVector]):
        self.blocks = list(blocks)

    @property
    def n_blocks(self) -> int:
        return len(self.blocks)

    def axes_brange(self) -> BRange:
        return BRange([b.layout.pr for b in self.blocks])

    # -- arithmetic (blockwise) ---------------------------------------
    def _map2(self, other, f):
        return BVector([f(a, b) for a, b in zip(self.blocks, other.blocks)])

    def __add__(self, o):
        return self._map2(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._map2(o, lambda a, b: a - b)

    def __mul__(self, s):
        return BVector([b * s for b in self.blocks])

    __rmul__ = __mul__

    def __neg__(self):
        return BVector([-b for b in self.blocks])

    def copy(self):
        return BVector([b.copy() for b in self.blocks])


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
