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
    order_ref,  # scalar-prefetch: color per step (drives the index maps)
    vals_ref,  # VMEM [1, n_off, T] of this step's color
    bd_ref,  # VMEM [1, T]
    invd_ref,  # VMEM [1, T]
    xin_ref,  # ANY (HBM) flat x in
    xout_ref,  # ANY (HBM) flat x out
    xs_ref,  # VMEM scratch: flat x, resident across the whole call
    sem_in,
    sem_out,
):
    step = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((step == 0) & (j == 0))
    def _load():
        cp = pltpu.make_async_copy(xin_ref, xs_ref, sem_in)
        cp.start()
        cp.wait()

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
                v = vals_ref[0, d, :]
                if widen:
                    v = v.astype(xs_ref.dtype)
                term = v * seg
                acc = term if acc is None else acc + term
            base = c * Lp + Kp  # static, 1024-aligned
            xold = xs_ref[pl.ds(jT + base, T)]
            xs_ref[pl.ds(jT + base, T)] = (
                xold + (bd_ref[0, 0] - acc) * invd_ref[0, 0]
            )

    @pl.when((step == n_steps - 1) & (j == nseg - 1))
    def _store():
        cp = pltpu.make_async_copy(xs_ref, xout_ref, sem_out)
        cp.start()
        cp.wait()


def _ax_kernel(
    schedule: Tuple[Tuple[int, ...], ...],
    m: int,
    T: int,
    vals_ref,  # VMEM [1, n_off, T] of this color
    x_ref,  # VMEM whole flat x
    y_ref,  # VMEM [1, 1, T] out block
):
    c = pl.program_id(0)
    j = pl.program_id(1)
    jT = pl.multiple_of(j * T, T)
    for cc in range(m):

        @pl.when(c == cc)
        def _compute(cc=cc):
            offs = schedule[cc]
            widen = vals_ref.dtype != x_ref.dtype
            acc = None
            for d, off in enumerate(offs):
                q = (off // ALIGN) * ALIGN
                r = off - q
                W = x_ref[pl.ds(jT + q, T + ALIGN)]
                seg = jax.lax.slice(W, (r,), (r + T,))
                v = vals_ref[0, d, :]
                if widen:
                    v = v.astype(x_ref.dtype)
                term = v * seg
                acc = term if acc is None else acc + term
            y_ref[0, 0, :] = acc


@functools.partial(jax.jit, static_argnames=("schedule",))
def ax_flat_pallas(vals_d, xflat, *, schedule):
    """Full own_own @ x in the de-interleaved space, ONE kernel launch:
    out[c, i] = sum_d vals_d[c, d, i] * xflat[schedule[c][d] + i].
    Same HBM traffic as one standard DIA SpMV (vals once, x once)."""
    m, n_off, Lq = vals_d.shape
    T = _pick_tile(Lq, n_off, vals_d.dtype.itemsize)
    assert T, "ax_flat_pallas: no valid tile (check viability first)"
    kernel = functools.partial(_ax_kernel, schedule, m, T)
    y3 = pl.pallas_call(
        kernel,
        grid=(m, Lq // T),
        in_specs=[
            pl.BlockSpec((1, n_off, T), lambda c, j: (c, 0, j)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole flat x
        ],
        out_specs=pl.BlockSpec((1, 1, T), lambda c, j: (c, 0, j)),
        out_shape=jax.ShapeDtypeStruct((m, 1, Lq), xflat.dtype),
    )(vals_d, xflat)
    return y3[:, 0, :]


def ax_flat_pallas_viable(n_flat: int, Lq: int, n_off: int, itemsize: int) -> bool:
    return (
        itemsize <= 4
        and _pick_tile(Lq, n_off, itemsize) != 0
        and (n_flat + ALIGN) * itemsize <= MAX_X_VMEM_BYTES
    )


# x windows in _ax_kernel reach up to max_off + jT + T + ALIGN; the flat
# buffer's tail margin (gs_dia._plan) already covers this
MAX_X_VMEM_BYTES = 12 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("schedule", "order", "Lp", "Kp")
)
def gs_sweep_pallas(vals_d, bd, invd_d, xflat, *, schedule, order, Lp, Kp):
    """Run the color sequence ``order`` of GS updates on the flat
    de-interleaved x.  vals_d [m, n_off, Lq]; bd/invd_d [m, Lq];
    xflat [n_flat].  Returns the updated xflat."""
    m, n_off, Lq = vals_d.shape
    T = _pick_tile(Lq, n_off, vals_d.dtype.itemsize)
    assert T, "gs_sweep_pallas: no valid tile (check viability first)"
    nseg = Lq // T
    n_steps = len(order)
    n_flat = xflat.shape[0]
    order_arr = jnp.asarray(np.array(order, dtype=np.int32))

    kernel = functools.partial(
        _kernel, schedule, order, Lp, Kp, T, n_steps, nseg
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps, nseg),
        in_specs=[
            pl.BlockSpec(
                (1, n_off, T), lambda s, j, ordr: (ordr[s], 0, j)
            ),
            pl.BlockSpec((1, 1, T), lambda s, j, ordr: (ordr[s], 0, j)),
            pl.BlockSpec((1, 1, T), lambda s, j, ordr: (ordr[s], 0, j)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_flat,), xflat.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    # ANY-memory-space operands cannot be batched by vmap's pallas rule
    # (the batched x part would need a blocked HBM spec); under vmap
    # (SerialBackend, P parts on one device) run the kernel per part with
    # lax.map — parts execute sequentially on one core either way.
    @jax.custom_batching.custom_vmap
    def run(ordr, vals_d, bd3, invd3, xflat):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_flat,), xflat.dtype),
        )(ordr, vals_d, bd3, invd3, xflat)

    @run.def_vmap
    def _run_batched(axis_size, in_batched, *args):  # noqa: ANN001
        args = tuple(
            a
            if b
            else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        return jax.lax.map(lambda t: run(*t), args), True

    return run(order_arr, vals_d, bd[:, None, :], invd_d[:, None, :], xflat)
