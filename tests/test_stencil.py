"""Structured stencil constructor equals the generic COO pipeline.

The closed-form builder (ops/stencil.py) must be semantically identical to
feeding the stencil's triplets through ``psparse(..., assembled=True)``.
"""
import numpy as np
import pytest

from partitionedarrays_tpu import (
    centralize,
    laplacian_fdm,
    plaplacian_fdm,
    psparse,
    spmv,
    stencil_psparse,
)
from partitionedarrays_tpu.models.hpcg.problem import build_hpcg_problem
from partitionedarrays_tpu.pvector import PVector, prand

import jax


@pytest.mark.parametrize(
    "local,parts",
    [((4, 4, 4), (4, 1, 1)), ((4, 6, 2), (2, 2, 1)), ((3, 5, 4), (1, 2, 2))],
)
def test_hpcg_structured_equals_generic(backend4, local, parts):
    A1, b1 = build_hpcg_problem(local, parts, backend4, structured=True)
    A0, b0 = build_hpcg_problem(local, parts, backend4, structured=False)
    np.testing.assert_allclose(
        centralize(A1).toarray(), centralize(A0).toarray(), atol=0
    )
    np.testing.assert_allclose(np.asarray(b1.own), np.asarray(b0.own))
    assert A1.nnz() == A0.nnz()
    x = prand(jax.random.PRNGKey(3), A1.col_prange, backend4, dtype=np.float64)
    y1 = np.asarray(spmv(A1, x).own)
    y0 = np.asarray(
        spmv(A0, PVector(x.own, x.ghost, A0.col_layout(), backend4)).own
    )
    np.testing.assert_allclose(y1, y0, rtol=1e-12)


def test_hpcg_structured_degenerate_thin_box(backend4):
    A1, _ = build_hpcg_problem((1, 3, 3), (4, 1, 1), backend4, structured=True)
    A0, _ = build_hpcg_problem((1, 3, 3), (4, 1, 1), backend4, structured=False)
    np.testing.assert_allclose(
        centralize(A1).toarray(), centralize(A0).toarray(), atol=0
    )
    assert A1.nnz() == A0.nnz()


@pytest.mark.parametrize("nodes,parts", [((8, 8), (2, 2)), ((4, 4, 4), (4, 1, 1))])
def test_plaplacian_fdm_equals_triplet_path(backend4, nodes, parts):
    A1 = plaplacian_fdm(nodes, parts, backend4)
    I, J, V, rows, cols = laplacian_fdm(nodes, parts)
    A0 = psparse(I, J, V, rows, cols, backend4, assembled=True)
    np.testing.assert_allclose(
        centralize(A1).toarray(), centralize(A0).toarray(), rtol=1e-14
    )
    assert A1.nnz() == A0.nnz()
    # the own_own block freezes to DIA (the whole point of the fast path)
    assert A1.device().oo.kind == "dia"


def test_stencil_psparse_1d(backend4):
    # 1-D 3-pt Laplacian: closed form vs dense
    n = 17
    A = stencil_psparse((4,), (n,), [((0,), 2.0), ((-1,), -1.0), ((1,), -1.0)],
                        backend4)
    D = centralize(A).toarray()
    expect = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    np.testing.assert_allclose(D, expect)
