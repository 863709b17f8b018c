"""HPCG benchmark package (capability parity: HPCG/src).

Reference-name aliases map the Julia driver surface onto this package:
hpcg_benchmark (3-phase protocol), pc_setup/pc_solve (geometric MG),
ref_cg/opt_cg (preconditioned CG), build_matrix/build_p_matrix (27-pt
problem), compute_optimal_shape_xyz (rank grid).
"""
from .driver import hpcg_benchmark
from .mg import HPCGMGPreconditioner, restrict_operator
from .problem import build_hpcg_problem, hpcg_triplets_for_box, STENCIL_27PT
from .cg import hpcg_cg
from .opt3d import compute_optimal_shape_xyz
from .report import HPCGReport


def hpcg_benchmark_debug(n_parts: int = 1, **kw):
    """Parity: hpcg_benchmark_debug (HPCG/src/hpcg_benchmark.jl:146-150) —
    run the benchmark on the serial (debug-analogue) backend."""
    from ...backends import SerialBackend

    return hpcg_benchmark(SerialBackend(n_parts), **kw)


def hpcg_benchmark_mesh(devices=None, **kw):
    """Parity: hpcg_benchmark_mpi (HPCG/src/hpcg_benchmark.jl:121-125) —
    run the benchmark distributed over a device mesh."""
    from ...backends import MeshBackend

    return hpcg_benchmark(MeshBackend(devices=devices), **kw)


hpcg_benchmark_mpi = hpcg_benchmark_mesh


def build_p_matrix(parts_per_dir, local_shape, backend, dtype=None):
    """Parity: build_p_matrix (HPCG/src/sparse_matrix.jl:105-122)."""
    import numpy as np

    return build_hpcg_problem(
        local_shape, parts_per_dir, backend,
        dtype=dtype if dtype is not None else np.float64,
    )


def build_matrix(gshape, dtype=None):
    """Sequential 27-pt operator as scipy CSR (parity: build_matrix,
    HPCG/src/sparse_matrix.jl:27-80)."""
    import numpy as np

    from ...ops.sparse_host import compresscoo

    dt = dtype if dtype is not None else np.float64
    n = int(np.prod(gshape))
    I, J, V, b = hpcg_triplets_for_box(np.arange(n), tuple(gshape), dt)
    return compresscoo(I, J, V, n, n), b


def pc_setup(local_shape, parts_per_dir, backend, n_levels: int = 4, dtype=None):
    """Parity: pc_setup (HPCG/src/mg_preconditioner.jl:137-185)."""
    import numpy as np

    return HPCGMGPreconditioner(
        local_shape, parts_per_dir, backend, n_levels=n_levels,
        dtype=dtype if dtype is not None else np.float64,
    )


def pc_solve(mg: "HPCGMGPreconditioner", r):
    """Parity: pc_solve! (HPCG/src/mg_preconditioner.jl:314-328)."""
    return mg(r)


# the reference splits the CG driver into a reference and an optimizable
# variant (HPCG/src/ref_cg.jl, opt_cg.jl); both map to the jittable PCG
ref_cg = hpcg_cg
opt_cg = hpcg_cg
