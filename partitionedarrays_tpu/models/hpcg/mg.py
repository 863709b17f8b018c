"""Geometric multigrid preconditioner for HPCG.

Capability parity: HPCG/src/mg_preconditioner.jl — l levels (default 4),
each level a fresh 27-pt operator at half resolution per dim (:137-185),
restriction by injection of the even-coordinate points (restrict_operator
:81-101), V-cycle with symmetric-GS pre/post smoothing and smooth-only
coarsest solve (pc_solve! :314-328).

TPU-native: the fine->coarse injection maps are static per-part OWN-index
gather tables frozen at setup; restrict = gather, prolongate = scatter-add
— no communication (injection points are interior to each part's box).
The V-cycle is unrolled over levels (static shapes per level) and fully
jittable; smoothing uses the colored-DIA GS sweep.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...psparse import PSparseMatrix, spmv
from ...pvector import PVector
from ...solvers.smoothers import GaussSeidel, _register_identity_pytree
from .problem import build_hpcg_problem

OOB = np.int32(np.iinfo(np.int32).max - 255)


def restrict_operator(nx: int, ny: int, nz: int) -> np.ndarray:
    """Coarse own-local index -> fine own-local index (C-order boxes),
    taking the even-coordinate fine points
    (parity: restrict_operator, HPCG/src/mg_preconditioner.jl:81-101)."""
    assert nx % 2 == 0 and ny % 2 == 0 and nz % 2 == 0
    nxc, nyc, nzc = nx // 2, ny // 2, nz // 2
    # our boxes are C-ordered as (d0, d1, d2) = (x, y, z) axes of the
    # partition builder; fine local index = (ix * ny + iy) * nz + iz
    ix, iy, iz = np.meshgrid(
        np.arange(nxc), np.arange(nyc), np.arange(nzc), indexing="ij"
    )
    fine = ((2 * ix) * ny + (2 * iy)) * nz + (2 * iz)
    return fine.reshape(-1).astype(np.int32)


class HPCGMGPreconditioner:
    """V-cycle geometric MG over ``n_levels`` 27-pt operators."""

    def __init__(
        self,
        local_shape: Sequence[int],
        parts_per_dir: Sequence[int],
        backend,
        n_levels: int = 4,
        dtype=np.float64,
        smoother_iters: int = 1,
    ):
        nx, ny, nz = (int(v) for v in local_shape)
        assert min(nx, ny, nz) % (2 ** (n_levels - 1)) == 0, (
            "local shape must be divisible by 2^(levels-1)"
        )
        self.n_levels = n_levels
        self.As: List[PSparseMatrix] = []
        self.gss: List[GaussSeidel] = []
        self.f2cs: List[jnp.ndarray] = []  # index l: fine level l+1 -> coarse l
        self.bs = []
        shapes = []
        for l in range(n_levels):
            shapes.append((nx >> l, ny >> l, nz >> l))
        # level order: index 0 = coarsest ... n_levels-1 = finest
        for shape in reversed(shapes):
            A, b = build_hpcg_problem(shape, parts_per_dir, backend, dtype=dtype)
            self.As.append(A)
            self.gss.append(GaussSeidel(A, iterations=smoother_iters, sweep="symmetric"))
            self.bs.append(b)
        P = self.As[0].row_prange.n_parts
        for l in range(n_levels - 1):
            fx, fy, fz = shapes[n_levels - 2 - l]  # fine shape above level l
            f2c = restrict_operator(fx, fy, fz)
            flay = self.As[l + 1].row_layout()
            clay = self.As[l].row_layout()
            tab = np.full((P, clay.n_own_pad), OOB, dtype=np.int32)
            tab[:, : f2c.size] = f2c[None, :]
            self.f2cs.append(backend.shard(jnp.asarray(tab)))
        self.backend = backend

    @property
    def A(self) -> PSparseMatrix:
        return self.As[-1]

    @property
    def b(self) -> PVector:
        return self.bs[-1]

    def nnz_per_level(self) -> List[int]:
        return [A.nnz() for A in self.As]

    # -- V-cycle -------------------------------------------------------
    def _cycle(self, l: int, b: PVector) -> PVector:
        gs = self.gss[l]
        x = gs(b)  # zero-guess pre-smooth (coarsest: this IS the solve)
        if l == 0:
            return x
        A = self.As[l]
        Axf = spmv(A, _col_view(A, x))
        f2c = self.f2cs[l - 1]
        rc_own = jnp.take_along_axis(
            b.own - Axf.own, jnp.clip(f2c, 0, b.own.shape[1] - 1).astype(jnp.int32), axis=1
        )
        rc_own = jnp.where(f2c < b.own.shape[1], rc_own, 0)
        clay = self.As[l - 1].row_layout()
        rc = PVector(
            rc_own[:, : clay.n_own_pad],
            jnp.zeros((rc_own.shape[0], clay.n_ghost_pad), rc_own.dtype),
            clay,
            self.backend,
        )
        xc = self._cycle(l - 1, rc)
        P = x.own.shape[0]
        rows = jnp.arange(P)[:, None]
        x_own = x.own.at[rows, f2c].add(
            _pad_to(xc.own, f2c.shape[1]), mode="drop"
        )
        x = PVector(x_own, x.ghost, x.layout, self.backend)
        return gs.apply(x, b)  # post-smooth

    def __call__(self, r: PVector) -> PVector:
        return self._cycle(self.n_levels - 1, r)


def _col_view(A: PSparseMatrix, v: PVector) -> PVector:
    clay = A.col_layout()
    if v.layout is clay:
        return v
    return PVector(
        v.own,
        jnp.zeros((v.own.shape[0], clay.n_ghost_pad), v.own.dtype),
        clay,
        v.backend,
    )


def _pad_to(a: jnp.ndarray, n: int) -> jnp.ndarray:
    if a.shape[1] == n:
        return a
    if a.shape[1] > n:
        return a[:, :n]
    return jnp.pad(a, ((0, 0), (0, n - a.shape[1])))


_register_identity_pytree(HPCGMGPreconditioner, ("As", "gss", "f2cs"))
