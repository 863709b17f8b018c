"""Pallas TPU kernel for the DIA (stencil) SpMV.

The XLA fallback (ops/dia.py) emits one shifted multiply-add per diagonal;
XLA streams the x vector again for every tap, so the achieved bandwidth is
roughly half of roofline.  This kernel keeps the whole (padded) x vector
resident in VMEM and walks the row tiles once, applying all taps per tile —
x is read from HBM once, the diagonal values once, y written once: the
mandatory traffic only.

Grid: 1-D over row tiles.  vals[n_off, R] is tiled (n_off, T) per step; x
stays un-tiled in VMEM (supported up to ~12 MB, i.e. ~3M f32 rows per
part — above that the caller falls back to the XLA path).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-part x buffers larger than this stay on the XLA path
MAX_X_VMEM_BYTES = 12 * 1024 * 1024
MIN_ROWS_FOR_PALLAS = 4096


# Mosaic vector loads must start at a multiple of the native 1-D tile
ALIGN = 1024


def _pick_tile(R: int, n_off: int = 1, itemsize: int = 4) -> int:
    """Largest row tile dividing R whose streamed values block
    (n_off diagonals x T rows) fits the ~2 MB per-buffer VMEM budget —
    wide stencils (e.g. the 81-offset Q1 elasticity band) take a smaller
    tile instead of falling off the Pallas path (same rule as
    gs_pallas._pick_tile)."""
    for t in (16384, 8192, 4096, 2048, 1024):
        if R % t == 0 and n_off * t * itemsize <= 2 * 1024 * 1024:
            return t
    return 0


def _dia_kernel(offsets: Tuple[int, ...], lo: int, T: int, vals_ref, x_ref, y_ref):
    i = pl.program_id(0)
    base = pl.multiple_of(i * T, T)
    acc = None
    for d in range(len(offsets)):
        off = offsets[d] - lo  # static, >= 0
        q, r = divmod(off, ALIGN)
        # aligned window load, then static in-register shift by the residue
        W = x_ref[pl.ds(base + q * ALIGN, T + ALIGN)]
        seg = jax.lax.slice(W, (r,), (r + T,))
        term = vals_ref[d, :] * seg
        acc = term if acc is None else acc + term
    y_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "lo", "span", "R", "n_cols_pad")
)
def _dia_spmv_pallas(vals, x, *, offsets, lo, span, R, n_cols_pad):
    if lo == 0 and x.shape[0] >= span + ALIGN:
        xpad = x  # caller pre-padded (e.g. the colored-GS flat buffer)
    else:
        xpad = jnp.zeros((span + ALIGN,), dtype=x.dtype)
        xpad = jax.lax.dynamic_update_slice(xpad, x, (-lo,))
    n_off = vals.shape[0]
    T = _pick_tile(R, n_off, vals.dtype.itemsize)
    kernel = functools.partial(_dia_kernel, offsets, lo, T)
    out_dtype = jnp.promote_types(vals.dtype, x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec((n_off, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded x
        ],
        out_specs=pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R,), out_dtype),
    )(vals, xpad)


def _dia_kernel_flat(
    offsets: Tuple[int, ...], lo: int, T: int, vals_ref, x_ref, y_ref
):
    """Same taps as _dia_kernel but the values block is a contiguous 1-D
    run (segment-major layout) — no sublane padding in the HBM stream."""
    i = pl.program_id(0)
    base = pl.multiple_of(i * T, T)
    acc = None
    for d in range(len(offsets)):
        off = offsets[d] - lo  # static, >= 0
        q, r = divmod(off, ALIGN)
        W = x_ref[pl.ds(base + q * ALIGN, T + ALIGN)]
        seg = jax.lax.slice(W, (r,), (r + T,))
        term = vals_ref[pl.ds(d * T, T)] * seg
        acc = term if acc is None else acc + term
    y_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "lo", "span", "R", "n_cols_pad", "T")
)
def _dia_spmv_pallas_flat(vflat, x, *, offsets, lo, span, R, n_cols_pad, T):
    n_off = len(offsets)
    kernel = functools.partial(_dia_kernel_flat, offsets, lo, T)
    out_dtype = jnp.promote_types(vflat.dtype, x.dtype)

    # 1-D blocks cannot be batched by the default pallas vmap rule (the
    # batched block's last two dims would be (1, block)); under vmap
    # (SerialBackend, P parts on one device) run per part with lax.map —
    # parts execute sequentially on one core either way.
    @jax.custom_batching.custom_vmap
    def run(vflat, x):
        if lo == 0 and x.shape[0] >= span + ALIGN:
            xpad = x  # caller pre-padded (e.g. the colored-GS flat buffer)
        else:
            xpad = jnp.zeros((span + ALIGN,), dtype=x.dtype)
            xpad = jax.lax.dynamic_update_slice(xpad, x, (-lo,))
        return pl.pallas_call(
            kernel,
            grid=(R // T,),
            in_specs=[
                pl.BlockSpec(
                    (n_off * T,), lambda i: (i,), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded x
            ],
            out_specs=pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R,), out_dtype),
        )(vflat, xpad)

    @run.def_vmap
    def _run_batched(axis_size, in_batched, *args):  # noqa: ANN001
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        return jax.lax.map(lambda t: run(*t), args), True

    return run(vflat, x)


def dia_spmv_pallas_flat(offsets, vflat, x, n_cols_pad: int, *, R: int, T: int):
    lo = min(min(offsets), 0)
    hi = max(max(offsets) + R, n_cols_pad)
    return _dia_spmv_pallas_flat(
        vflat, x, offsets=tuple(offsets), lo=lo, span=hi - lo, R=R,
        n_cols_pad=n_cols_pad, T=T,
    )


def _dia_kernel_flat_df(
    offsets: Tuple[int, ...], lo: int, T: int,
    vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref,
):
    """df64 (two-float) variant of _dia_kernel_flat: values and x are
    (hi, lo) f32 pairs; each tap is an error-free Dekker two_prod folded
    into a Knuth two_sum-compensated accumulator (~28 VPU flops per tap
    vs 1 FMA — the price of f64-equivalent precision on f32 hardware).
    See ops/df64.py for the algorithms and validation."""
    from .df64 import (
        quick_two_sum_raw as quick_two_sum,
        two_prod_raw as two_prod,
        two_sum_raw as two_sum,
    )

    i = pl.program_id(0)
    base = pl.multiple_of(i * T, T)
    acc_h = jnp.zeros((T,), jnp.float32)
    acc_l = jnp.zeros((T,), jnp.float32)
    for d in range(len(offsets)):
        off = offsets[d] - lo  # static, >= 0
        q, r = divmod(off, ALIGN)
        Wh = xh_ref[pl.ds(base + q * ALIGN, T + ALIGN)]
        Wl = xl_ref[pl.ds(base + q * ALIGN, T + ALIGN)]
        sh = jax.lax.slice(Wh, (r,), (r + T,))
        sl = jax.lax.slice(Wl, (r,), (r + T,))
        vh = vh_ref[pl.ds(d * T, T)]
        vl = vl_ref[pl.ds(d * T, T)]
        p, e = two_prod(vh, sh)
        e = e + (vh * sl + vl * sh)
        acc_h, c = two_sum(acc_h, p)
        acc_l = acc_l + (c + e)
    yh, yl = quick_two_sum(acc_h, acc_l)
    yh_ref[...] = yh
    yl_ref[...] = yl


@functools.partial(
    jax.jit, static_argnames=("offsets", "lo", "span", "R", "n_cols_pad", "T")
)
def _dia_spmv_pallas_flat_df(
    vfh, vfl, xh, xl, *, offsets, lo, span, R, n_cols_pad, T
):
    n_off = len(offsets)
    kernel = functools.partial(_dia_kernel_flat_df, offsets, lo, T)

    @jax.custom_batching.custom_vmap
    def run(vfh, vfl, xh, xl):
        def pad(x):
            xpad = jnp.zeros((span + ALIGN,), dtype=x.dtype)
            return jax.lax.dynamic_update_slice(xpad, x, (-lo,))

        return pl.pallas_call(
            kernel,
            grid=(R // T,),
            in_specs=[
                pl.BlockSpec((n_off * T,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_off * T,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((R,), jnp.float32),
                jax.ShapeDtypeStruct((R,), jnp.float32),
            ),
        )(vfh, vfl, pad(xh), pad(xl))

    @run.def_vmap
    def _run_batched(axis_size, in_batched, *args):  # noqa: ANN001
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        out = jax.lax.map(lambda t: run(*t), args)
        return out, (True, True)

    return run(vfh, vfl, xh, xl)


def dia_spmv_pallas_flat_df(
    offsets, vfh, vfl, x_pair, n_cols_pad: int, *, R: int, T: int
):
    lo = min(min(offsets), 0)
    hi = max(max(offsets) + R, n_cols_pad)
    return _dia_spmv_pallas_flat_df(
        vfh, vfl, x_pair[0], x_pair[1], offsets=tuple(offsets), lo=lo,
        span=hi - lo, R=R, n_cols_pad=n_cols_pad, T=T,
    )


def dia_spmv_pallas_df_viable(offsets, R: int, n_cols_pad: int) -> bool:
    """Two f32 x buffers resident + two value streams per tile."""
    if not offsets or R < MIN_ROWS_FOR_PALLAS or _pick_tile(R, 2 * len(offsets), 4) == 0:
        return False
    lo = min(min(offsets), 0)
    hi = max(max(offsets) + R, n_cols_pad)
    return (hi - lo + ALIGN) * 8 <= MAX_X_VMEM_BYTES


def dia_spmv_pallas_viable(offsets, R: int, n_cols_pad: int, itemsize: int) -> bool:
    if itemsize > 4:
        # f64: the TPU X64 software rewriting does not handle custom
        # calls (Pallas kernels) — use the XLA stencil path
        return False
    if (
        not offsets
        or R < MIN_ROWS_FOR_PALLAS
        or _pick_tile(R, len(offsets), itemsize) == 0
    ):
        return False
    lo = min(min(offsets), 0)
    hi = max(max(offsets) + R, n_cols_pad)
    return (hi - lo + ALIGN) * itemsize <= MAX_X_VMEM_BYTES


def dia_spmv_pallas(offsets, vals, x, n_cols_pad: int):
    R = vals.shape[-1]
    lo = min(min(offsets), 0)
    hi = max(max(offsets) + R, n_cols_pad)
    return _dia_spmv_pallas(
        vals, x, offsets=tuple(offsets), lo=lo, span=hi - lo, R=R,
        n_cols_pad=n_cols_pad,
    )
