"""HPCG package tests (reference analogue: HPCG/test/hpcg_benchmark_tests.jl:
partitioned matrix equals the sequential one; CG with MG preconditioner
converges; driver runs the 3-phase protocol)."""
import numpy as np
import pytest

from partitionedarrays_tpu.backends import SerialBackend
from partitionedarrays_tpu.models.hpcg.driver import hpcg_benchmark
from partitionedarrays_tpu.models.hpcg.mg import HPCGMGPreconditioner, restrict_operator
from partitionedarrays_tpu.models.hpcg.opt3d import compute_optimal_shape_xyz
from partitionedarrays_tpu.models.hpcg.problem import build_hpcg_problem
from partitionedarrays_tpu.models.hpcg.cg import hpcg_cg
from partitionedarrays_tpu.psparse import to_global_scipy
from partitionedarrays_tpu.pvector import collect


def test_problem_matches_sequential(backend4):
    """Partitioned build equals the 1-part build
    (parity: HPCG/test/hpcg_benchmark_tests.jl:20-28)."""
    A4, b4 = build_hpcg_problem((4, 4, 4), (2, 2, 1), backend4)
    A1, b1 = build_hpcg_problem((8, 8, 4), (1, 1, 1), SerialBackend(1))
    G4 = to_global_scipy(A4)
    G1 = to_global_scipy(A1)
    assert (abs(G4 - G1)).max() < 1e-14
    assert np.allclose(collect(b4), collect(b1))
    # structural invariants of the 27-pt operator
    assert np.allclose(G4.diagonal(), 26.0)
    interior = G4.shape[0] // 2  # some interior row
    assert G4[interior].nnz <= 27


def test_restrict_operator():
    f2c = restrict_operator(4, 4, 4)
    assert f2c.size == 8
    # coarse (0,0,0) -> fine (0,0,0); coarse (1,1,1) -> fine (2,2,2)
    assert f2c[0] == 0
    assert f2c[-1] == (2 * 4 + 2) * 4 + 2


def test_optimal_shape():
    assert compute_optimal_shape_xyz(1) == (1, 1, 1)
    assert compute_optimal_shape_xyz(8) == (2, 2, 2)
    px, py, pz = compute_optimal_shape_xyz(12)
    assert px * py * pz == 12


@pytest.mark.slow
def test_mg_preconditioned_cg_converges(backend4):
    import jax

    mg = HPCGMGPreconditioner((8, 8, 8), (2, 2, 1), backend4, n_levels=3)
    A, b = mg.A, mg.b

    @jax.jit
    def run(A, mg, b):
        x, norms = hpcg_cg(A, b, M=mg, iterations=25)
        return x.own, norms

    own, norms = run(A, mg, b)
    norms = np.asarray(norms)
    rel = norms / norms[0]
    # HPCG's MG-preconditioned CG contracts fast; 25 iters -> well below 1e-8
    assert rel[-1] < 1e-8
    # and much faster than unpreconditioned
    x2, norms2 = hpcg_cg(A, b, M=None, iterations=25)
    assert rel[-1] < np.asarray(norms2)[-1] / np.asarray(norms2)[0]


@pytest.mark.slow
def test_hpcg_driver(backend4):
    report = hpcg_benchmark(
        backend4,
        local_shape=(8, 8, 8),
        parts_per_dir=(2, 2, 1),
        n_levels=3,
        iterations=10,
        ref_sets=1,
        timed_sets=1,
        dtype=np.float64,
    )
    s = report.summary()
    assert s["GFLOPs"]["raw"] > 0
    assert s["GBs_model"] > 0
    assert s["final_relres"] < 1e-3
    assert report.flops()["total"] > report.flops()["spmv"]


@pytest.mark.slow
def test_ghosted_flat_cycle_matches_generic(backend4):
    """The ghosted flat V-cycle (de-interleaved smoothing + explicit
    ghost-contribution folding) must equal the generic path (spmv residual
    + smoother.apply) on a multi-part mesh — same hybrid-GS semantics."""
    import jax.numpy as jnp

    from partitionedarrays_tpu.models.hpcg.mg import _col_view
    from partitionedarrays_tpu.psparse import spmv
    from partitionedarrays_tpu.pvector import PVector

    mg = HPCGMGPreconditioner((8, 8, 8), (2, 2, 1), backend4, n_levels=2)
    assert any(not gs.flat_viable() and gs.colored is not None for gs in mg.gss), (
        "expected ghosted colored levels on a multi-part mesh"
    )
    b = mg.b

    def generic_cycle(l, b):
        gs = mg.gss[l]
        x = gs(b)
        if l == 0:
            return x
        Axf = spmv(mg.As[l], _col_view(mg.As[l], x), dev=mg.devs_pc[l])
        rc = mg._restrict(l, b.own - Axf.own)
        xc = generic_cycle(l - 1, rc)
        corr = mg._prolong(l, xc.own, x.own.shape[1])
        x = PVector(x.own + corr, x.ghost, x.layout, mg.backend)
        return gs.apply(x, b)

    got = np.asarray(mg(b).own)
    want = np.asarray(generic_cycle(mg.n_levels - 1, b).own)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-13)


@pytest.mark.slow
def test_hpcg_driver_df64_end_to_end(backend4):
    """The precision="df64" driver path end-to-end: the f64 generic
    rebuild + f32 MG preconditioner + df64 CG must deliver f64-grade
    residuals and a report that carries the non-IEEE caveat
    (precision_bits=49) and the phase-2 validation verdict.  Guards the
    implicit invariant that the structured f32 build (preconditioner) and
    the structured=False f64 rebuild (operator) share own-DOF ordering."""
    report = hpcg_benchmark(
        backend4,
        local_shape=(8, 8, 8),
        parts_per_dir=(2, 2, 1),
        n_levels=2,
        iterations=25,
        ref_sets=1,
        timed_sets=1,
        precision="df64",
    )
    s = report.summary()
    assert s["dtype"] == "float64-df64"
    assert s["precision_bits"] == 49
    assert s["validation_passed"] is True
    # f64-grade: far beyond the ~1e-7 f32 stall
    assert s["final_relres"] < 1e-9
    assert s["GFLOPs"]["rated"] > 0
    assert "PASSED" in report.to_txt()


@pytest.mark.slow
def test_hpcg_driver_executed_window(backend4):
    """The total_runtime window path (chunked executed sets) must run and
    report a consistent set count and rated figure."""
    report = hpcg_benchmark(
        backend4,
        local_shape=(8, 8, 8),
        parts_per_dir=(2, 2, 1),
        n_levels=2,
        iterations=8,
        ref_sets=1,
        timed_sets=2,
        total_runtime=2.0,
    )
    s = report.summary()
    assert s["phase3_window"] == "executed"
    assert report.n_sets >= 2
    assert s["GFLOPs"]["rated"] > 0
    assert s["validation_passed"] is True


def test_hpcg_driver_smoke(backend4):
    """Fast default-suite driver coverage: the 3-phase protocol end-to-end
    at a tiny shape (the full-size driver tests are marked slow and run
    with --runslow)."""
    report = hpcg_benchmark(
        backend4,
        local_shape=(4, 4, 4),
        parts_per_dir=(2, 2, 1),
        n_levels=2,
        iterations=4,
        ref_sets=1,
        timed_sets=1,
    )
    s = report.summary()
    assert s["GFLOPs"]["raw"] > 0
    assert s["final_relres"] < 1.0
    assert report.flops()["total"] > report.flops()["spmv"]
