"""Direct construction of constant-coefficient stencil operators.

The generic ``psparse`` pipeline (triplets -> owner classification -> COO
compression -> DIA/ELL freeze) is format-agnostic but wasteful for the one
case that dominates this framework's workloads: a constant-coefficient
stencil on a C-ordered box partition (HPCG's 27-pt operator,
HPCG/src/sparse_matrix.jl:27-80; the gallery FDM Laplacians,
src/gallery.jl:12-98).  For those the sparsity is *known in closed form*:

- the own_own block is exactly DIA with one diagonal per stencil offset
  (local offset = dot(delta, local C-strides)), and every diagonal's value
  pattern is a separable product of 1-D boundary masks;
- the own_ghost block only has entries on the part-box surface, one per
  stencil leg that crosses into a neighboring part while staying inside
  the global domain.

So we can build the frozen device blocks (and the scipy host mirrors)
directly — no triplet materialization, no global-id hash lookups, no COO
sort — which turns minutes of setup into seconds at HPCG scales.

Boundary condition: legs leaving the global domain are dropped
(zero-Dirichlet truncation), matching both reference generators.
"""
from __future__ import annotations

from functools import reduce
from typing import Dict, List, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

from ..parallel.p_range import INT, PRange, uniform_partition


def _axis_masks(
    loc: Sequence[int], org: Sequence[int], gshape: Sequence[int], delta: Sequence[int]
):
    """Per-axis 1-D masks for a stencil leg ``delta`` from a box with local
    dims ``loc`` at global origin ``org``:
    returns (inside_local[d], inside_global[d]) boolean 1-D arrays."""
    in_loc, in_glob = [], []
    for d in range(len(loc)):
        c = np.arange(loc[d], dtype=np.int64)
        t = c + delta[d]
        in_loc.append((t >= 0) & (t < loc[d]))
        g = org[d] + t
        in_glob.append((g >= 0) & (g < gshape[d]))
    return in_loc, in_glob


def _outer_and(masks: Sequence[np.ndarray]) -> np.ndarray:
    """AND of 1-D boolean masks broadcast over the box (C order), raveled."""
    nd = len(masks)
    shaped = [
        m.reshape((1,) * d + (-1,) + (1,) * (nd - d - 1)) for d, m in enumerate(masks)
    ]
    return reduce(np.logical_and, shaped).ravel()


def _host_dia_mirror(loc, n_own_c, all_offs, terms, dtype) -> sp.dia_matrix:
    """scipy dia mirror of the own_own block, built from the closed form.
    scipy's dia format indexes data by COLUMN (data[k, j] = A[j - off, j])
    while our diagonals are row-indexed — shift accordingly."""
    R = int(np.prod(loc))
    n_off = len(all_offs)
    data = np.zeros((max(n_off, 1), n_own_c), dtype=dtype)
    for k, o in enumerate(all_offs):
        diag = None
        for delta, value in terms[o]:
            in_loc, _ = _axis_masks(loc, (0,) * len(loc), loc, delta)
            m = _outer_and(in_loc) * np.asarray(value, dtype=dtype)
            diag = m if diag is None else diag + m
        if diag is None:
            continue
        if o >= 0:
            w = min(R, n_own_c - o)
            if w > 0:
                data[k, o : o + w] = diag[:w]
        else:
            w = min(R + o, n_own_c)
            if w > 0:
                data[k, :w] = diag[-o : -o + w]
    return sp.dia_matrix((data, np.array(all_offs)), shape=(R, n_own_c))


class _LazyStencilBlocks(dict):
    """Host block dict whose scipy 'oo' mirror materializes on first access.

    The closed-form constructor keeps the own_own diagonals device-resident;
    host-side algebra (generic AMG setup, centralize, spmm, ...) still works
    — it just pays the host materialization cost only when actually used.
    """

    def __init__(self, oh, builder):
        super().__init__(oh=oh)
        self._builder = builder

    def __getitem__(self, k):
        if k == "oo" and not dict.__contains__(self, "oo"):
            dict.__setitem__(self, "oo", self._builder())
        return dict.__getitem__(self, k)

    def get(self, k, default=None):
        if k == "oo":
            return self["oo"]
        return dict.get(self, k, default)


def stencil_psparse(
    parts_per_dir: Sequence[int],
    gshape: Sequence[int],
    stencil: Sequence[Tuple[Tuple[int, ...], float]],
    backend,
    dtype=np.float64,
    with_host_blocks: bool = True,
    host_only: bool = False,
):
    """Assembled PSparseMatrix of a constant-coefficient stencil operator.

    ``stencil``: iterable of (offset tuple, value); include the center.
    Semantically identical to feeding the stencil's triplets through
    ``psparse(..., assembled=True)`` (tested against it), but built in
    closed form: O(n_offsets) vectorized passes for the ghost surface, and
    the own_own DIA diagonals generated ON DEVICE from per-axis masks (a
    few KB shipped instead of hundreds of MB per level at HPCG scales;
    the host scipy mirror becomes a lazy thunk).

    ``host_only=True`` builds ONLY the host blocks (no device freeze):
    the closed-form f64 source for the official-precision (df64) HPCG
    configuration on f32-only devices, where jnp.asarray of f64 values
    would truncate — device_df64 splits the f64 HOST blocks instead.
    """
    from ..psparse import PSparseMatrix, _sorted_ghosts, DeviceSpMat
    from ..ops.blocks import DeviceBlock, freeze_block, make_dia_block
    from ..ops.sparse_host import compresscoo
    from ..pvector import _layout_cache
    import jax
    import jax.numpy as jnp

    gshape = tuple(int(v) for v in gshape)
    parts_per_dir = tuple(int(v) for v in parts_per_dir)
    nd = len(gshape)
    stencil = [(tuple(int(x) for x in d), float(v)) for d, v in stencil]

    row_partition = uniform_partition(parts_per_dir, gshape)
    P = len(row_partition)

    # --- per-part box geometry (C-order boxes)
    part_org: List[Tuple[int, ...]] = []
    part_loc: List[Tuple[int, ...]] = []
    for li in row_partition:
        org_coords = np.unravel_index(int(li.own_to_global[0]), gshape)
        end_coords = np.unravel_index(int(li.own_to_global[-1]), gshape)
        org = tuple(int(v) for v in org_coords)
        loc = tuple(int(e - o + 1) for o, e in zip(org, end_coords))
        assert int(np.prod(loc)) == li.n_own
        part_org.append(org)
        part_loc.append(loc)

    equal_boxes = len(set(part_loc)) == 1
    gstrides = np.array(
        [int(np.prod(gshape[d + 1 :], dtype=np.int64)) for d in range(nd)],
        dtype=np.int64,
    )

    # local offset -> [(delta, value), ...] (shared when boxes are equal)
    def _terms_for(loc):
        strides = [int(np.prod(loc[d + 1 :], dtype=np.int64)) for d in range(nd)]
        terms: Dict[int, list] = {}
        for delta, value in stencil:
            off = int(sum(d * s for d, s in zip(delta, strides)))
            terms.setdefault(off, []).append((delta, value))
        return terms

    # --- ghost surface (host, O(surface) nnz) + column partitions
    col_partition = []
    oh_csrs: List[sp.csr_matrix] = []
    # own-leg masks depend only on (loc, delta): share across equal boxes
    own_mask_cache: Dict[Tuple[Tuple[int, ...], Tuple[int, ...]], np.ndarray] = {}
    for p, li in enumerate(row_partition):
        org, loc = part_org[p], part_loc[p]
        ghost_rows, ghost_gids, ghost_vals = [], [], []
        for delta, value in stencil:
            in_loc, in_glob = _axis_masks(loc, org, gshape, delta)
            # legs inside the global domain but outside this part's box
            # touch ghost columns (only possible when the part has a
            # neighbor there)
            if all(l.all() for l in in_loc):
                continue
            key = (loc, delta)
            own_mask = own_mask_cache.get(key)
            if own_mask is None:
                own_mask = own_mask_cache[key] = _outer_and(in_loc)
            gmask = _outer_and(in_glob) & ~own_mask
            rows = np.flatnonzero(gmask)
            if rows.size == 0:
                continue
            coords = np.unravel_index(rows, loc)
            gid = np.zeros(rows.size, dtype=np.int64)
            for d in range(nd):
                gid += (org[d] + coords[d] + delta[d]) * gstrides[d]
            ghost_rows.append(rows.astype(INT))
            ghost_gids.append(gid.astype(INT))
            ghost_vals.append(np.full(rows.size, value, dtype=dtype))

        # ghost column set (sorted by owner, then gid — same convention as
        # the generic constructor)
        if ghost_gids:
            tg = np.concatenate(ghost_gids)
            gids = np.unique(tg)
            owners = np.asarray(li.global_to_owner(gids), dtype=INT)
            gids, owners = _sorted_ghosts(gids, owners)
            li_col = li.union_ghost(gids, owners)
            jcg = li_col.global_to_ghost(tg)
            oh = compresscoo(
                np.concatenate(ghost_rows),
                jcg,
                np.concatenate(ghost_vals),
                li.n_own,
                li_col.n_ghost,
            )
        else:
            li_col = li
            oh = sp.csr_matrix((li.n_own, 0), dtype=dtype)
        col_partition.append(li_col)
        oh_csrs.append(oh)

    row_pr = PRange(row_partition)
    col_pr = PRange(col_partition)
    rlay = _layout_cache(row_pr)
    clay = _layout_cache(col_pr)

    # --- own_own DIA diagonals
    if host_only:
        with_host_blocks = True
    if equal_boxes and host_only:
        loc = part_loc[0]
        R = int(np.prod(loc))
        terms = _terms_for(loc)
        all_offs = sorted(terms)
        blocks = [
            _LazyStencilBlocks(
                oh_csrs[p],
                (lambda loc=loc, ncc=col_partition[p].n_own: _host_dia_mirror(
                    loc, ncc, all_offs, terms, dtype
                )),
            )
            for p in range(P)
        ]
        A = PSparseMatrix(blocks, row_pr, col_pr, backend, assembled=True)
        A._dtype_cache = np.dtype(dtype)
        return A
    if equal_boxes:
        loc = part_loc[0]
        R = int(np.prod(loc))
        terms = _terms_for(loc)
        all_offs = sorted(terms)
        n_off = len(all_offs)
        n_own_pad = rlay.n_own_pad
        # device closed form: ship only per-axis masks (few KB); every
        # part's own_own block is IDENTICAL (legs that stay inside the
        # local box never see the global boundary), so build once and
        # broadcast over parts on device.
        single_term = all(len(terms[o]) == 1 for o in all_offs)

        def _axis_factors(delta):
            fs = []
            for d in range(nd):
                c = np.arange(loc[d], dtype=np.int64)
                t = c + delta[d]
                fs.append(((t >= 0) & (t < loc[d])).astype(dtype))
            return fs

        if single_term:
            axes = [
                np.zeros((max(n_off, 1), loc[d]), dtype=dtype) for d in range(nd)
            ]
            for k, o in enumerate(all_offs):
                delta, value = terms[o][0]
                fs = _axis_factors(delta)
                fs[0] = fs[0] * np.asarray(value, dtype=dtype)
                for d in range(nd):
                    axes[d][k] = fs[d]

            def _build(*ms):
                v = ms[0].reshape((max(n_off, 1), loc[0]) + (1,) * (nd - 1))
                for d in range(1, nd):
                    shape = (max(n_off, 1),) + (1,) * d + (loc[d],) + (1,) * (nd - 1 - d)
                    v = v * ms[d].reshape(shape)
                v = v.reshape(max(n_off, 1), -1)
                out = jnp.zeros((max(n_off, 1), n_own_pad), v.dtype)
                out = out.at[:, : v.shape[1]].set(v)
                return jnp.broadcast_to(out[None], (P, max(n_off, 1), n_own_pad))

            vals_dev = jax.jit(_build)(*[jnp.asarray(a) for a in axes])
        else:
            # rare (degenerate boxes where distinct deltas alias the same
            # offset): sum dense per-term products on device
            def _build2(ms_list):
                acc = jnp.zeros((max(n_off, 1), R), ms_list[0][1][0].dtype)
                for k, ms in ms_list:
                    v = ms[0].reshape((loc[0],) + (1,) * (nd - 1))
                    for d in range(1, nd):
                        shape = (1,) * d + (loc[d],) + (1,) * (nd - 1 - d)
                        v = v * ms[d].reshape(shape)
                    acc = acc.at[k].add(v.reshape(-1))
                out = jnp.zeros((max(n_off, 1), n_own_pad), acc.dtype)
                out = out.at[:, :R].set(acc)
                return jnp.broadcast_to(out[None], (P, max(n_off, 1), n_own_pad))

            ms_list = []
            for k, o in enumerate(all_offs):
                for delta, value in terms[o]:
                    fs = _axis_factors(delta)
                    fs[0] = fs[0] * np.asarray(value, dtype=dtype)
                    ms_list.append((k, [jnp.asarray(f) for f in fs]))
            vals_dev = jax.jit(lambda: _build2(ms_list))()

        oo_dev = make_dia_block(tuple(all_offs), clay.n_own_pad, vals_dev)

        # lazy scipy host mirrors (consumers materialize on demand)
        blocks: List[dict] = []
        for p in range(P):
            n_own_c = col_partition[p].n_own
            if with_host_blocks:
                blocks.append(
                    _LazyStencilBlocks(
                        oh_csrs[p],
                        (lambda loc=loc, ncc=n_own_c: _host_dia_mirror(
                            loc, ncc, all_offs, terms, dtype
                        )),
                    )
                )
            else:
                blocks.append(
                    {"oo": sp.csr_matrix((R, n_own_c), dtype=dtype), "oh": oh_csrs[p]}
                )

        # exact nnz in closed form (masked zeros are never stored as nz)
        nnz_own_part = 0
        for o in all_offs:
            if len(terms[o]) == 1:
                delta, value = terms[o][0]
                if value != 0.0:
                    nnz_own_part += int(
                        np.prod([max(loc[d] - abs(delta[d]), 0) for d in range(nd)])
                    )
            else:
                deltas_vals = terms[o]
                diag = None
                for delta, value in deltas_vals:
                    in_loc, _ = _axis_masks(loc, (0,) * nd, loc, delta)
                    m = _outer_and(in_loc) * value
                    diag = m if diag is None else diag + m
                nnz_own_part += int(np.count_nonzero(diag))
        nnz_total = P * nnz_own_part + sum(m.nnz for m in oh_csrs)
        oo_dia_host = None  # smoother setup uses the device path
    else:
        # general path (unequal boxes, e.g. remainder partitions): dense
        # host diagonals per part, as in the generic constructor
        part_dia: List[Dict[int, np.ndarray]] = []
        for p, li in enumerate(row_partition):
            org, loc = part_org[p], part_loc[p]
            R = int(np.prod(loc))
            strides = [int(np.prod(loc[d + 1 :], dtype=np.int64)) for d in range(nd)]
            diags: Dict[int, np.ndarray] = {}
            for delta, value in stencil:
                off = int(sum(dd * s for dd, s in zip(delta, strides)))
                in_loc, _ = _axis_masks(loc, org, gshape, delta)
                own_mask = _outer_and(in_loc)
                if own_mask.any():
                    diag = diags.setdefault(off, np.zeros(R, dtype=dtype))
                    diag += own_mask * np.asarray(value, dtype=dtype)
            part_dia.append(diags)
        all_offs = sorted({o for d in part_dia for o in d})
        n_off = len(all_offs)
        vals = np.zeros((P, max(n_off, 1), rlay.n_own_pad), dtype=dtype)
        for p, diags in enumerate(part_dia):
            R = int(np.prod(part_loc[p]))
            for k, o in enumerate(all_offs):
                if o in diags:
                    vals[p, k, :R] = diags[o]
        oo_dev = (
            None
            if host_only
            else make_dia_block(tuple(all_offs), clay.n_own_pad, jnp.asarray(vals))
        )
        blocks = []
        for p in range(P):
            R = int(np.prod(part_loc[p]))
            n_own_c = col_partition[p].n_own
            if with_host_blocks:
                data = np.zeros((max(n_off, 1), n_own_c), dtype=dtype)
                for k, o in enumerate(all_offs):
                    diag = part_dia[p].get(o)
                    if diag is None:
                        continue
                    if o >= 0:
                        w = min(R, n_own_c - o)
                        if w > 0:
                            data[k, o : o + w] = diag[:w]
                    else:
                        w = min(R + o, n_own_c)
                        if w > 0:
                            data[k, :w] = diag[-o : -o + w]
                A_oo = sp.dia_matrix((data, np.array(all_offs)), shape=(R, n_own_c))
            else:
                A_oo = sp.csr_matrix((R, n_own_c), dtype=dtype)
            blocks.append({"oo": A_oo, "oh": oh_csrs[p]})
        nnz_total = int(
            sum(int(np.count_nonzero(d)) for diags in part_dia for d in diags.values())
            + sum(m.nnz for m in oh_csrs)
        )
        oo_dia_host = (tuple(all_offs), vals)

    A = PSparseMatrix(blocks, row_pr, col_pr, backend, assembled=True)
    if not host_only:
        oh_dev = freeze_block(oh_csrs, rlay.n_own_pad, max(clay.n_ghost_pad, 1))
        A._device = backend.shard(DeviceSpMat(oo_dev, oh_dev, None, None))
    A._oo_dia_host = oo_dia_host
    A._dtype_cache = np.dtype(dtype)
    A._nnz_cache = nnz_total
    return A


def stencil_rhs_counts(
    parts_per_dir: Sequence[int],
    gshape: Sequence[int],
    offsets: Sequence[Tuple[int, ...]],
) -> List[np.ndarray]:
    """Per-part count of stencil legs that stay inside the global domain
    (per own row, C-order).  Used for rhs formulas like HPCG's
    ``b = 26 - n_offdiag`` (HPCG/src/sparse_matrix.jl:27-80)."""
    gshape = tuple(int(v) for v in gshape)
    nd = len(gshape)
    counts = []
    for li in uniform_partition(tuple(int(v) for v in parts_per_dir), gshape):
        org_coords = np.unravel_index(int(li.own_to_global[0]), gshape)
        end_coords = np.unravel_index(int(li.own_to_global[-1]), gshape)
        org = tuple(int(v) for v in org_coords)
        loc = tuple(int(e - o + 1) for o, e in zip(org, end_coords))
        acc = np.zeros(int(np.prod(loc)), dtype=np.int64)
        for delta in offsets:
            _, in_glob = _axis_masks(loc, org, gshape, delta)
            acc += _outer_and(in_glob)
        counts.append(acc)
    return counts
