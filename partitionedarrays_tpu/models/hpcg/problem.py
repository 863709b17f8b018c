"""HPCG problem generation: 27-point 3-D Laplacian.

Capability parity: HPCG/src/sparse_matrix.jl (build_matrix :27-80,
build_p_matrix :105-122): diagonal 26, off-diagonals -1 over the 3x3x3
neighborhood, rhs b_i = 26 - (nnz_row_i - 1), zero Dirichlet outside the
box.  The local (nx, ny, nz) box is replicated per part on a
(npx, npy, npz) part grid, so the global problem is
(npx*nx, npy*ny, npz*nz) and weak scaling adds parts at fixed local size.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ...parallel.p_range import PRange, uniform_partition, INT


def hpcg_triplets_for_box(
    own_gids: np.ndarray, gshape: Tuple[int, int, int], dtype=np.float64
):
    """COO triplets of the 27-pt operator restricted to the given rows."""
    gx, gy, gz = gshape
    x, y, z = np.unravel_index(own_gids, gshape)
    # all 26 neighbor offsets at once (broadcast over [26, n])
    d = np.array(
        [
            (dx, dy, dz)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
            if not (dx == dy == dz == 0)
        ],
        dtype=np.int64,
    )
    xs = x[None, :] + d[:, 0:1]
    ys = y[None, :] + d[:, 1:2]
    zs = z[None, :] + d[:, 2:3]
    valid = (
        (xs >= 0) & (xs < gx) & (ys >= 0) & (ys < gy) & (zs >= 0) & (zs < gz)
    )
    idx = (xs * gy + ys) * gz + zs  # clip-free; masked below
    row_off_count = valid.sum(axis=0).astype(np.int64)
    vflat = valid.ravel()
    I = np.concatenate(
        [np.broadcast_to(own_gids[None, :], valid.shape).ravel()[vflat], own_gids]
    )
    J = np.concatenate([idx.ravel()[vflat], own_gids])
    V = np.concatenate(
        [
            np.full(int(vflat.sum()), -1.0, dtype=dtype),
            np.full(own_gids.size, 26.0, dtype=dtype),
        ]
    )
    # rhs: 26 - number of off-diagonal entries (parity:
    # HPCG/src/sparse_matrix.jl:27-80 — b = 27 - nnz_row)
    b = (26.0 - row_off_count).astype(dtype)
    return I, J, V, b


STENCIL_27PT = [
    ((dx, dy, dz), 26.0 if dx == dy == dz == 0 else -1.0)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


def build_hpcg_problem(
    local_shape: Sequence[int],
    parts_per_dir: Sequence[int],
    backend,
    dtype=np.float64,
    structured: bool = True,
):
    """Build the distributed 27-pt matrix and rhs.

    Parity: build_p_matrix (HPCG/src/sparse_matrix.jl:105-122).
    ``structured=True`` (default) emits the operator in closed form
    (ops/stencil.py) — identical result to the generic triplet pipeline
    (``structured=False``, kept for cross-validation in tests), minus
    minutes of setup at benchmark scales.
    """
    from ...pvector import pvector_from_own

    nx, ny, nz = (int(v) for v in local_shape)
    px, py, pz = (int(v) for v in parts_per_dir)
    gshape = (px * nx, py * ny, pz * nz)

    if structured:
        from ...ops.stencil import stencil_psparse, stencil_rhs_counts

        A = stencil_psparse(
            (px, py, pz), gshape, STENCIL_27PT, backend, dtype=dtype
        )
        offdiag = [d for d, _ in STENCIL_27PT if d != (0, 0, 0)]
        bs = [
            (26.0 - c).astype(dtype)
            for c in stencil_rhs_counts((px, py, pz), gshape, offdiag)
        ]
        b = pvector_from_own(bs, A.row_prange, backend, dtype=dtype)
        return A, b

    from ...psparse import psparse

    node_partition = uniform_partition((px, py, pz), gshape)
    pr = PRange(node_partition)
    Is, Js, Vs, bs = [], [], [], []
    for li in node_partition:
        I, J, V, b = hpcg_triplets_for_box(li.own_to_global, gshape, dtype)
        Is.append(I)
        Js.append(J)
        Vs.append(V)
        bs.append(b)
    A = psparse(Is, Js, Vs, pr, pr, backend, assembled=True, dtype=dtype)
    b = pvector_from_own(bs, A.row_prange, backend, dtype=dtype)
    return A, b
