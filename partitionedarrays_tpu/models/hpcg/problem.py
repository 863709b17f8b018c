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
    cs = np.stack(np.unravel_index(own_gids, gshape), axis=1)  # [n, 3]
    Is, Js, Vs = [], [], []
    row_off_count = np.zeros(own_gids.size, dtype=np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == dy == dz == 0:
                    continue
                nc = cs + np.array([dx, dy, dz])
                valid = np.all((nc >= 0) & (nc < np.array(gshape)), axis=1)
                idx = np.ravel_multi_index(
                    (
                        np.clip(nc[:, 0], 0, gshape[0] - 1),
                        np.clip(nc[:, 1], 0, gshape[1] - 1),
                        np.clip(nc[:, 2], 0, gshape[2] - 1),
                    ),
                    gshape,
                )
                Is.append(own_gids[valid])
                Js.append(idx[valid])
                Vs.append(np.full(int(valid.sum()), -1.0, dtype=dtype))
                row_off_count += valid
    Is.append(own_gids)
    Js.append(own_gids)
    Vs.append(np.full(own_gids.size, 26.0, dtype=dtype))
    I = np.concatenate(Is)
    J = np.concatenate(Js)
    V = np.concatenate(Vs)
    # rhs: 26 - number of off-diagonal entries (parity:
    # HPCG/src/sparse_matrix.jl:27-80 — b = 27 - nnz_row)
    b = (26.0 - row_off_count).astype(dtype)
    return I, J, V, b


def build_hpcg_problem(
    local_shape: Sequence[int],
    parts_per_dir: Sequence[int],
    backend,
    dtype=np.float64,
):
    """Build the distributed 27-pt matrix and rhs.

    Returns (A, b, x_exact_ones_rhs_consistent=None).  Parity:
    build_p_matrix (HPCG/src/sparse_matrix.jl:105-122).
    """
    from ...psparse import psparse
    from ...pvector import pvector_from_own

    nx, ny, nz = (int(v) for v in local_shape)
    px, py, pz = (int(v) for v in parts_per_dir)
    gshape = (px * nx, py * ny, pz * nz)
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
