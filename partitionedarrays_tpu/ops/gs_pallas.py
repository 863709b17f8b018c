"""Fused Pallas kernel: a full colored-DIA Gauss-Seidel sweep sequence in
ONE kernel launch.

The composition in solvers/gs_dia.py (one Pallas DIA-SpMV per color) pays
kernel-launch + full-x DMA overhead per color update; a symmetric sweep is
2*m launches.  This kernel runs the whole color sequence as a
(steps, segments) grid on one core:

- the flat de-interleaved x lives in a VMEM scratch for the entire call
  (DMA'd in at the first grid step, out at the last),
- per-color diagonal values / rhs / inverse diagonal stream through VMEM
  blocks, routed by a scalar-prefetched color sequence
  (PrefetchScalarGridSpec dynamic index maps),
- the per-color static tap schedule sits behind @pl.when branches, so
  every x access is an aligned window load + static residue slice.

TPU grid iteration is sequential — exactly the GS dependency order: all
segments of color c complete before the next color starts (segments
within one color touch disjoint rows of that color).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 1024

# x scratch + double-buffered streaming blocks must fit in ~15 MB VMEM
MAX_X_SCRATCH_BYTES = 11 * 1024 * 1024


def _pick_tile(L: int, n_off: int, itemsize: int) -> int:
    # budget counts the streamed block plus its f32 compute copy when the
    # values are stored reduced-precision (widened in-kernel before the
    # FMA); full-precision values keep the original geometry
    extra = 4 if itemsize < 4 else 0
    for t in (16384, 8192, 4096, 2048, 1024):
        if L % t == 0 and n_off * t * (itemsize + extra) <= 2 * 1024 * 1024:
            return t
    return 0


def gs_sweep_pallas_viable(n_flat: int, Lq: int, n_off: int, itemsize: int) -> bool:
    # f64 (x itemsize 8) must use the XLA path: the TPU X64 software
    # rewriting does not handle custom calls (Pallas kernels)
    return (
        itemsize <= 4
        and _pick_tile(Lq, n_off, itemsize) != 0
        and n_flat * itemsize <= MAX_X_SCRATCH_BYTES
    )


def _kernel(
    schedule: Tuple[Tuple[int, ...], ...],
    order: Tuple[int, ...],
    Lp: int,
    Kp: int,
    T: int,
    n_steps: int,
    nseg: int,
    n_flat: int,
    order_ref,  # scalar-prefetch: color per step (drives the index maps)
    vals_ref,  # VMEM [n_off*T] of this step's color segment (1-D layout)
    bd_ref,  # VMEM [T]
    invd_ref,  # VMEM [T]
    xin_ref,  # ANY (HBM) core x in, flattened (m*Lq,)
    xout_ref,  # ANY (HBM) core x out
    xs_ref,  # VMEM scratch: flat x (with margins), resident across the call
    sem_in,
    sem_out,
):
    step = pl.program_id(0)
    j = pl.program_id(1)
    core = nseg * T * len(schedule)

    @pl.when((step == 0) & (j == 0))
    def _load():
        _load_core_to_scratch(xin_ref, xs_ref, sem_in, Kp, core, n_flat)

    jT = pl.multiple_of(j * T, T)
    done = set()
    for ci, c in enumerate(order):
        if c in done:
            continue
        done.add(c)
        steps_c = [i for i, cc in enumerate(order) if cc == c]
        cond = step == steps_c[0]
        for i in steps_c[1:]:
            cond = cond | (step == i)

        @pl.when(cond)
        def _update(c=c):
            offs = schedule[c]
            widen = vals_ref.dtype != xs_ref.dtype
            acc = None
            for d, off in enumerate(offs):
                q = (off // ALIGN) * ALIGN
                r = off - q
                W = xs_ref[pl.ds(jT + q, T + ALIGN)]
                seg = jax.lax.slice(W, (r,), (r + T,))
                v = vals_ref[pl.ds(d * T, T)]
                if widen:
                    v = v.astype(xs_ref.dtype)
                term = v * seg
                acc = term if acc is None else acc + term
            base = c * Lp + Kp  # static, 1024-aligned
            xold = xs_ref[pl.ds(jT + base, T)]
            xs_ref[pl.ds(jT + base, T)] = (
                xold + (bd_ref[...] - acc) * invd_ref[...]
            )

    @pl.when((step == n_steps - 1) & (j == nseg - 1))
    def _store():
        cp = pltpu.make_async_copy(
            xs_ref.at[pl.ds(Kp, core)], xout_ref, sem_out
        )
        cp.start()
        cp.wait()


# x scratch for the core kernels must fit VMEM alongside streamed blocks
MAX_X_VMEM_BYTES = 11 * 1024 * 1024


def _load_core_to_scratch(xin_ref, xs_ref, sem, Kp: int, core: int, n_flat: int):
    """Zero the margins of the flat scratch and DMA the (m*Lq) core into
    position Kp.  The margins make every tap's aligned window load safe;
    their VALUES are never used with a nonzero coefficient (see
    gs_dia._plan layout notes)."""
    xs_ref[pl.ds(0, Kp)] = jnp.zeros((Kp,), xs_ref.dtype)
    tail = n_flat - Kp - core
    xs_ref[pl.ds(Kp + core, tail)] = jnp.zeros((tail,), xs_ref.dtype)
    cp = pltpu.make_async_copy(xin_ref, xs_ref.at[pl.ds(Kp, core)], sem)
    cp.start()
    cp.wait()


def _ax_kernel(
    schedule: Tuple[Tuple[int, ...], ...],
    m: int,
    T: int,
    Kp: int,
    n_flat: int,
    vals_ref,  # VMEM [n_off*T] of this color segment (1-D layout)
    xin_ref,  # ANY (HBM) core x, flattened (m*Lq,)
    y_ref,  # VMEM [T] out block
    xs_ref,  # VMEM scratch: flat x with margins
    sem_in,
):
    c = pl.program_id(0)
    j = pl.program_id(1)
    Lq = T * pl.num_programs(1)

    @pl.when((c == 0) & (j == 0))
    def _load():
        _load_core_to_scratch(xin_ref, xs_ref, sem_in, Kp, m * Lq, n_flat)

    jT = pl.multiple_of(j * T, T)
    for cc in range(m):

        @pl.when(c == cc)
        def _compute(cc=cc):
            offs = schedule[cc]
            widen = vals_ref.dtype != xs_ref.dtype
            acc = None
            for d, off in enumerate(offs):
                q = (off // ALIGN) * ALIGN
                r = off - q
                W = xs_ref[pl.ds(jT + q, T + ALIGN)]
                seg = jax.lax.slice(W, (r,), (r + T,))
                v = vals_ref[pl.ds(d * T, T)]
                if widen:
                    v = v.astype(xs_ref.dtype)
                term = v * seg
                acc = term if acc is None else acc + term
            y_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("schedule", "Kp", "n_flat", "m", "n_off", "T")
)
def ax_core_pallas(vals_flat, xcore, *, schedule, Kp, n_flat, m, n_off, T):
    """Full own_own @ x in the de-interleaved space, ONE kernel launch,
    core-in core-out: out[c, i] = sum_d vals[c, d, i] * x[tap].  Same HBM
    traffic as one standard DIA SpMV (vals once, x once) — no padded flat
    buffers materialize outside the kernel.  ``vals_flat`` is the 1-D
    segment-major layout (see gs_dia flat storage): segment (c, j) holds
    its n_off*T diagonal values contiguously, so every streamed block is a
    contiguous 1-D run — a (n_off, T) 2-D block would tile the n_off
    sublane dim to the next multiple of 8 and move up to 8/n_off extra HBM
    traffic (18.5% at the HPCG 27-pt fine level)."""
    Lq = vals_flat.shape[-1] // (m * n_off)
    kernel = functools.partial(_ax_kernel, schedule, m, T, Kp, n_flat)
    nseg = Lq // T

    @jax.custom_batching.custom_vmap
    def run(vals_flat, xflat1d):
        y = pl.pallas_call(
            kernel,
            grid=(m, nseg),
            in_specs=[
                pl.BlockSpec((n_off * T,), lambda c, j: (c * nseg + j,)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((T,), lambda c, j: (c * nseg + j,)),
            out_shape=jax.ShapeDtypeStruct((m * Lq,), xflat1d.dtype),
            scratch_shapes=[
                pltpu.VMEM((n_flat,), xflat1d.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(vals_flat, xflat1d)
        return y.reshape(m, Lq)

    @run.def_vmap
    def _run_batched(axis_size, in_batched, *args):  # noqa: ANN001
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        return jax.lax.map(lambda t: run(*t), args), True

    return run(vals_flat, xcore.reshape(-1))


def ax_flat_pallas_viable(n_flat: int, Lq: int, n_off: int, itemsize: int) -> bool:
    return (
        itemsize <= 4
        and _pick_tile(Lq, n_off, itemsize) != 0
        and (n_flat + ALIGN) * itemsize <= MAX_X_VMEM_BYTES
    )


@functools.partial(
    jax.jit,
    static_argnames=("schedule", "order", "Lp", "Kp", "n_flat", "m", "n_off", "T"),
)
def gs_sweep_pallas(
    vals_flat, bd, invd_d, xcore, *, schedule, order, Lp, Kp, n_flat,
    m, n_off, T,
):
    """Run the color sequence ``order`` of GS updates on the de-interleaved
    x, core-in core-out.  ``vals_flat`` is the 1-D segment-major layout
    (contiguous streamed blocks — see ax_core_pallas); bd/invd_d [m, Lq];
    xcore [m, Lq] (or None semantics handled by the caller with zeros).
    The margin-padded flat working buffer exists only as VMEM scratch."""
    Lq = vals_flat.shape[-1] // (m * n_off)
    nseg = Lq // T
    n_steps = len(order)
    order_arr = jnp.asarray(np.array(order, dtype=np.int32))

    kernel = functools.partial(
        _kernel, schedule, order, Lp, Kp, T, n_steps, nseg, n_flat
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps, nseg),
        in_specs=[
            pl.BlockSpec(
                (n_off * T,), lambda s, j, ordr: (ordr[s] * nseg + j,)
            ),
            pl.BlockSpec((T,), lambda s, j, ordr: (ordr[s] * nseg + j,)),
            pl.BlockSpec((T,), lambda s, j, ordr: (ordr[s] * nseg + j,)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_flat,), xcore.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    # ANY-memory-space operands cannot be batched by vmap's pallas rule
    # (the batched x part would need a blocked HBM spec); under vmap
    # (SerialBackend, P parts on one device) run the kernel per part with
    # lax.map — parts execute sequentially on one core either way.
    @jax.custom_batching.custom_vmap
    def run(ordr, vals_flat, bd1, invd1, xflat1d):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m * Lq,), xflat1d.dtype),
        )(ordr, vals_flat, bd1, invd1, xflat1d)
        return out.reshape(m, Lq)

    @run.def_vmap
    def _run_batched(axis_size, in_batched, *args):  # noqa: ANN001
        args = tuple(
            a
            if b
            else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        return jax.lax.map(lambda t: run(*t), args), True

    return run(
        order_arr, vals_flat, bd.reshape(-1), invd_d.reshape(-1),
        xcore.reshape(-1),
    )
