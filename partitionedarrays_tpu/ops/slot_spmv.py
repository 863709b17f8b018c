"""Slot-format unstructured SpMV: lane-gather at HBM roofline.

The generic gather path (ops/ell.py) lowers ``x[cols]`` through XLA's
serial TPU gather at ~0.15 Gelem/s — measured 13.4 ms for a 1.9M-nnz
operator (650x below the DIA path, round-2 VERDICT item #2).  TPU has no
general hardware gather, but Mosaic DOES vectorize one restricted form:
``take_along_axis(x, idx, axis=-1)`` on equal-shape 2-D operands — each
vreg row gathers within its OWN 128 lanes (``tpu.dynamic_gather``; the
sublane variant is limited to a single vreg).  Measured on v5e: a fused
lane-gather+multiply plane runs 1.9M slots in ~20 us — HBM-bound.

The SLOT format restructures y = A @ x around that primitive:

- Output rows are tiled ``rows_per_tile`` (Rt) per grid step; row r of a
  tile owns ``L = 128 // Rt`` fixed lanes (the reduction is a blind
  per-lane column sum, so lane ownership cannot vary).
- x is viewed 2-D as ``x2d[s, l] = x[128 s + l]``; each tile reads a
  contiguous WINDOW of S x2d rows at a per-tile base (so matrix rows
  must be locality-ordered; the planner bails otherwise and callers
  keep the plain ELL fallback).
- Each tile gets Q SLOT-ROWS; slot-row k carries one x2d source row
  ``srow[t, k]``.  A nonzero (r, c, v) lands in a slot-row whose srow
  equals c//128, at one of row r's lanes, with idx = c%128 and value v.
  The planner allocates ``n_{t,s} = max_r ceil(m_{r,s}/L)`` slot-rows
  per source row s (m = row r's nonzeros in column block s), which is
  what bounds padding — a naive dense (depth x window) layout measured
  9% utilization on Q1 elasticity; this compaction reaches ~nnz/max
  packing.
- Kernel per tile: route window rows to slot-rows with a one-hot MXU
  matmul (Q x S x 128 MACs — noise), one lane-gather, one multiply, one
  sublane sum; XLA folds each row's L lanes outside the kernel.

Per-SpMV traffic: idx + vals per slot (8 B), srow (4 B/slot-row);
everything else is VMEM-resident.

Capability parity: the reference's general CSR spmv!
(/root/reference/src/sparse_utils.jl:649-669) — its TPU-native form for
matrices that are not banded in local indices (Galerkin products on
non-box aggregates, generic FEM, permuted operators).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


class SlotMeta(NamedTuple):
    rows_per_tile: int  # Rt
    n_slot_rows: int  # Q
    window: int  # S (x2d rows per tile window)
    n_tiles: int
    n_rows: int  # true row count (pre tile padding)
    s_total: int  # x2d rows the kernel expects (padded)


class SlotPlan(NamedTuple):
    meta: SlotMeta
    idx: np.ndarray  # [P, n_tiles, Q, 128] int8 (target lane in window row; lanes < 128 fit int8 — a 4x smaller stream on the dominant slot traffic)
    vals: np.ndarray  # [P, n_tiles, Q, 128]
    srow: np.ndarray  # [P, n_tiles, Q] int32 (window row per slot-row)
    base: np.ndarray  # [P, n_tiles] int32 (x2d window base row)
    fill: List[np.ndarray]  # per part: flat slot positions in CSR data order


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if x > 0 else 0


def _entries(csr: sp.csr_matrix):
    nnz_row = np.diff(csr.indptr)
    r = np.repeat(np.arange(csr.shape[0], dtype=np.int64), nnz_row)
    c = csr.indices.astype(np.int64)
    return r, c


def _group_q(r, cblk):
    """q = occurrence index within each (row, column-block) group.
    CSR order (r sorted, c sorted within row) makes groups runs."""
    key = r * (int(cblk.max()) + 2) + cblk
    new = np.empty(key.shape, bool)
    new[0] = True
    np.not_equal(key[1:], key[:-1], out=new[1:])
    gstart = np.flatnonzero(new)
    glen = np.diff(np.r_[gstart, key.size])
    q = np.arange(key.size) - np.repeat(gstart, glen)
    return q, gstart, glen


def _plan_dims(csr: sp.csr_matrix, rt: int):
    """(Q, S, base) for one block at rows_per_tile=rt."""
    R = csr.shape[0]
    n_tiles = max(_round_up(R, rt) // rt, 1)
    if csr.nnz == 0:
        return 1, 8, np.zeros((n_tiles,), np.int32)
    L = 128 // rt
    r, c = _entries(csr)
    cblk = c >> 7
    t = r // rt
    bmin = np.full((n_tiles,), np.iinfo(np.int64).max)
    bmax = np.full((n_tiles,), -1)
    np.minimum.at(bmin, t, cblk)
    np.maximum.at(bmax, t, cblk)
    empty = bmax < 0
    bmin[empty] = 0
    bmax[empty] = 0
    base = (bmin // 8) * 8
    S = _round_up(max(int((bmax - base).max()) + 1, 8), 8)
    q, gstart, glen = _group_q(r, cblk)
    # n_{t,s} = max over rows in tile of ceil(m_{r,s} / L)
    gt = t[gstart]
    gs = (cblk - base[t])[gstart]
    need = -(-glen // L)
    nts = np.zeros((n_tiles, S), np.int64)
    np.maximum.at(nts, (gt, gs), need)
    Q = int(nts.sum(1).max())
    return max(Q, 1), S, base.astype(np.int32)


# guards: slot tensors worse than this are no win over the ELL gather
_MAX_SLOT_BYTES = 768 * 1024 * 1024
_MAX_WINDOW_ROWS = 2048
_MAX_X2D_VMEM = 8 * 1024 * 1024
_MAX_Q = 4096


def plan_dim_table(
    blocks: Sequence[sp.spmatrix], n_rows_pad: int
) -> np.ndarray:
    """Per-rt (Q, S, max_base) dims over these blocks — the quantity a
    multi-process build allgather-maxes to agree on a common slot layout
    (psparse_local)."""
    csrs = [b.tocsr() for b in blocks]
    for b in csrs:
        b.sort_indices()
    out = np.zeros((5, 3), np.int64)
    for k, rt in enumerate((128, 64, 32, 16, 8)):
        dims = [_plan_dims(b, rt) for b in csrs]
        out[k, 0] = max(d[0] for d in dims)
        out[k, 1] = max(d[1] for d in dims)
        out[k, 2] = max(int(d[2].max()) for d in dims)
    return out


def build_slot_plan(
    blocks: Sequence[sp.spmatrix], n_rows_pad: int, n_cols_pad: int,
    force_rt: Optional[int] = None,
    force_dims: Optional[Tuple[int, int, int]] = None,
) -> Optional[SlotPlan]:
    """Plan the slot layout for per-part CSR blocks (common static shape
    across parts).  Returns None when the format is not viable (huge row
    span, pathological packing, tensor too large) — callers keep the
    plain ELL gather.  ``force_rt`` pins rows_per_tile (the fused GS
    sweep kernel requires 128 so one tile is one x2d row);
    ``force_dims=(Q, S, s_total)`` pins the padded dims (cross-process
    agreement in psparse_local — requires force_rt)."""
    csrs = [b.tocsr() for b in blocks]
    for b in csrs:
        b.sort_indices()
    if n_cols_pad == 0:
        return None
    if all(b.nnz == 0 for b in csrs) and force_dims is None:
        # locally empty: without forced dims there is nothing to plan.
        # WITH force_dims (the cross-process agreed-dims path) an all-zero
        # plan is built instead — a process whose local blocks happen to
        # be empty must still compile the same program as its peers, or a
        # per-process None would desync the collective setup (distributed
        # hang).
        return None
    best = None
    for rt in (128, 64, 32, 16, 8) if force_rt is None else (force_rt,):
        dims = [_plan_dims(b, rt) for b in csrs]
        Q = max(d[0] for d in dims)
        S = max(d[1] for d in dims)
        if force_dims is not None:
            Q = max(Q, int(force_dims[0]))
            S = max(S, int(force_dims[1]))
        # pad the tile count to a multiple of 8 so the kernel can batch
        # tiles per grid step (padding tiles are all-zero slots)
        n_tiles = _round_up(max(_round_up(n_rows_pad, rt) // rt, 1), 8)
        cost = len(csrs) * n_tiles * Q * 128 * 8
        if S > _MAX_WINDOW_ROWS or Q > _MAX_Q:
            continue
        if best is None or cost < best[0]:
            best = (cost, rt, Q, S, n_tiles, dims)
    if best is None or best[0] > _MAX_SLOT_BYTES:
        return None
    cost, rt, Q, S, n_tiles, dims = best
    s_total = _round_up(n_cols_pad, 128) // 128
    s_total = _round_up(
        max(s_total, int(max(d[2].max() for d in dims)) + S, 8), 8
    )
    if force_dims is not None:
        s_total = max(s_total, int(force_dims[2]))
    if s_total * 512 > _MAX_X2D_VMEM:
        return None
    P = len(csrs)
    L = 128 // rt
    idx = np.zeros((P, n_tiles, Q, 128), np.int8)
    vals = np.zeros((P, n_tiles, Q, 128), csrs[0].dtype)
    srow = np.zeros((P, n_tiles, Q), np.int32)
    base = np.zeros((P, n_tiles), np.int32)
    fill: List[np.ndarray] = []
    for p, (csr, (_, _, b_p)) in enumerate(zip(csrs, dims)):
        base[p, : b_p.size] = b_p
        if csr.nnz == 0:
            fill.append(np.zeros((0,), np.int64))
            continue
        r, c = _entries(csr)
        cblk = c >> 7
        t = r // rt
        s_loc = cblk - b_p[t]
        q, gstart, glen = _group_q(r, cblk)
        gt = t[gstart]
        gs = s_loc[gstart]
        need = -(-glen // L)
        nts = np.zeros((n_tiles, S), np.int64)
        np.maximum.at(nts, (gt, gs), need)
        offs = np.concatenate(
            [np.zeros((n_tiles, 1), np.int64), np.cumsum(nts, 1)[:, :-1]], 1
        )
        k = offs[t, s_loc] + q // L  # slot-row within tile
        lane = (r % rt) * L + (q % L)
        flat3 = (t * Q + k)
        srow[p].reshape(-1)[flat3] = s_loc.astype(np.int32)
        flat = flat3 * 128 + lane
        idx[p].reshape(-1)[flat] = (c & 127).astype(np.int8)
        vals[p].reshape(-1)[flat] = csr.data
        fill.append(flat)
    meta = SlotMeta(rt, Q, S, n_tiles, n_rows_pad, s_total)
    return SlotPlan(meta, idx, vals, srow, base, fill)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def slot_onehot(srow, S: int, dtype=jnp.float32):
    """Per-tile routing matrices (n_tiles, Q, S): computed once at
    freeze from the plan's srow (storing f32 beats rebuilding the
    compare+select every SpMV — the one-hot stream is ~S/256 of the slot
    stream)."""
    return (
        srow[..., None] == jnp.arange(S, dtype=srow.dtype)
    ).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("rt", "Q", "S", "n_tiles", "n_rows", "s_total")
)
def _slot_spmv_pallas(
    idx, vals, onehot, base, x, *, rt, Q, S, n_tiles, n_rows, s_total
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = 128 // rt

    # batch TB tiles per grid step: single-tile slabs (Q*128*8 B, ~30 KB
    # at Q=30) make the DMA pipeline grid-overhead-bound
    TB = 1
    while (
        TB * 2 * Q * 128 * 8 <= 2 * 1024 * 1024 and n_tiles % (TB * 2) == 0
    ):
        TB *= 2
    nsteps = n_tiles // TB

    @jax.custom_batching.custom_vmap
    def run(idx, vals, onehot, base, x):
        x2d = jnp.zeros((s_total * 128,), x.dtype).at[: x.shape[0]].set(x)
        x2d = x2d.reshape(s_total, 128)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # per-tile window base rows
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d, whole
                pl.BlockSpec(
                    (TB, Q, 128), lambda t, b: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TB, Q, 128), lambda t, b: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TB, Q, S), lambda t, b: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TB, 1, 128), lambda t, b: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        )

        def kernel(b_ref, x_ref, i_ref, v_ref, oh_ref, o_ref):
            t = pl.program_id(0)
            for j in range(TB):
                win = x_ref[pl.ds(b_ref[t * TB + j], S), :]  # (S, 128)
                # route window rows to slot-rows on the MXU.  HIGHEST:
                # the routing must be EXACT — the default f32 matmul
                # runs bf16 passes (measured 2e-3 relative error)
                op = jnp.dot(
                    oh_ref[j], win,
                    preferred_element_type=x_ref.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (Q, 128)
                g = jnp.take_along_axis(op, i_ref[j], axis=1)
                o_ref[j, 0, :] = jnp.sum(g * v_ref[j], axis=0)

        lanes = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, 128), x.dtype),
        )(base, x2d, idx, vals, onehot)
        y = lanes.reshape(n_tiles, rt, L).sum(-1).reshape(-1)
        return y[:n_rows]

    @run.def_vmap
    def _run_batched(axis_size, in_batched, *args):  # noqa: ANN001
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        return jax.lax.map(lambda t: run(*t), args), True

    return run(idx, vals, onehot, base, x)


def refill_slot_vals(plan: SlotPlan, blocks: Sequence[sp.spmatrix]) -> np.ndarray:
    """New slot value planes at FIXED sparsity: scatter each part's CSR
    data (sorted-indices order — the order ``fill`` was built in) into the
    cached flat slot positions."""
    csrs = [b.tocsr() for b in blocks]
    for b in csrs:
        b.sort_indices()
    vals = np.zeros_like(plan.vals)
    for p, (csr, flat) in enumerate(zip(csrs, plan.fill)):
        if flat.size:
            vals[p].reshape(-1)[flat] = csr.data
    return vals


def slot_spmv_ref(idx, vals, srow, base, x, meta: SlotMeta):
    """XLA twin of the slot kernel (per part; identical math, any
    backend) — the CPU-mesh / validation path."""
    rt, Q, S, n_tiles, n_rows, s_total = meta
    L = 128 // rt
    x2d = jnp.zeros((s_total * 128,), x.dtype).at[: x.shape[0]].set(x)
    x2d = x2d.reshape(s_total, 128)
    rows = base[:, None] + srow  # (n_tiles, Q) absolute x2d rows
    op = x2d[rows]  # (n_tiles, Q, 128)
    g = jnp.take_along_axis(op, idx.astype(jnp.int32), axis=-1)
    lanes = (g * vals).sum(1)  # (n_tiles, 128)
    y = lanes.reshape(n_tiles, rt, L).sum(-1).reshape(-1)
    return y[:n_rows]


def slot_spmv(idx, vals, srow, onehot, base, x, meta: SlotMeta):
    """Per-part SPMD slot SpMV: Pallas on TPU, XLA twin elsewhere (also
    for f64 values — the TPU X64 software rewriting does not handle
    custom calls, same gate as dia_spmv_pallas_viable)."""
    from .. import config

    if (
        config.pallas_enabled()
        and onehot is not None
        and np.dtype(vals.dtype).itemsize <= 4
        and np.dtype(x.dtype).itemsize <= 4
    ):
        return _slot_spmv_pallas(
            idx, vals, onehot, base, x,
            rt=meta.rows_per_tile, Q=meta.n_slot_rows, S=meta.window,
            n_tiles=meta.n_tiles, n_rows=meta.n_rows, s_total=meta.s_total,
        )
    return slot_spmv_ref(idx, vals, srow, base, x, meta)
