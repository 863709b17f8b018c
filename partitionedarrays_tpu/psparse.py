"""PSparseMatrix: a row-partitioned distributed sparse matrix.

Capability parity with the reference's PSparseMatrix
(src/p_sparse_matrix.jl): split 4-block local storage (SplitMatrix,
:582-668), the COO constructor ``psparse(I,J,V,rows,cols)`` with
disassembled/subassembled/assembled states (:1150-1286), re-assembly at
fixed sparsity ``psparse!`` (:1291-1305), ``assemble`` (:1564-1816) and
``consistent`` (:1821-2040) state changes, latency-hiding SpMV ``mul!``
(:2090-2162), ``dense_diag`` (:2166), ``sparse_diag_matrix`` (:2192),
``spmm``/``spmtm``/``rap`` (:2212-2296), ``repartition`` (:2371),
``centralize`` (:2463), ``psystem`` (:2475) and the LU fallback (:2561).

TPU-native split of responsibilities:

- **Setup on host** (this file, numpy/scipy): triplet shuffling to row
  owners, ghost-column discovery, 4-block classification, CSR compression,
  sparse products (spmm/spmtm/rap) — all DISTRIBUTED over per-part blocks
  with per-neighbor triplet/request exchanges (peak memory O(local nnz)
  per part); the exchange graph is computed directly, no runtime NBX.
  Only ``centralize``/``to_global_scipy`` (debug/LU fallback) ever build a
  global matrix.
- **Iteration on device**: each block frozen into padded ELL
  (ops/ell.py); SpMV = ghost exchange (edge-colored ppermute rounds,
  scheduled by XLA concurrently with the own_own block product — the
  dataflow form of the reference's comm/compute overlap at
  src/p_sparse_matrix.jl:2098-2101) + gather/multiply/reduce per block.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .backends import Backend
from .ops.blocks import DeviceBlock, freeze_block
from .ops.sparse_host import compresscoo, precompute_nzindex
from .parallel.exchange_plan import VectorLayout
from .parallel.p_range import (
    INT,
    LocalIndices,
    PRange,
    find_owner,
)
from .pvector import PVector, Task, _layout_cache, backend_shard, pzeros


def as_prange(x) -> PRange:
    return x if isinstance(x, PRange) else PRange(list(x))


def _sorted_ghosts(gids: np.ndarray, owners: np.ndarray):
    order = np.lexsort((gids, owners))
    return gids[order], owners[order]


# ---------------------------------------------------------------------------
# device-resident data
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class DeviceSpMat:
    """Frozen device blocks (DeviceBlock each: DIA fast path or ELL)."""

    def __init__(self, oo, oh, ho=None, hh=None):
        self.oo = oo
        self.oh = oh
        self.ho = ho
        self.hh = hh

    def tree_flatten(self):
        return (self.oo, self.oh, self.ho, self.hh), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = cls.__new__(cls)
        (obj.oo, obj.oh, obj.ho, obj.hh) = ch
        return obj

    def nbytes(self) -> int:
        return sum(
            b.nbytes() for b in (self.oo, self.oh, self.ho, self.hh) if b is not None
        )

    def astype(self, dtype) -> "DeviceSpMat":
        return DeviceSpMat(
            *(
                b.astype(dtype) if b is not None else None
                for b in (self.oo, self.oh, self.ho, self.hh)
            )
        )


# ---------------------------------------------------------------------------
# the container
# ---------------------------------------------------------------------------

class _HostRef:
    """Identity-keyed aux wrapper: hashable/comparable by host object id so
    jit caching works across calls with the same matrix."""

    __slots__ = ("obj",)

    def __init__(self, obj):
        self.obj = obj

    def __hash__(self):
        return id(self.obj)

    def __eq__(self, other):
        return isinstance(other, _HostRef) and other.obj is self.obj

@jax.tree_util.register_pytree_node_class
class PSparseMatrix:
    """blocks[p] = dict with scipy CSR blocks 'oo','oh' (+'ho','hh' when
    subassembled); row/col partitions carry the ghost structure.

    Registered as a pytree whose LEAVES are the frozen device (ELL) arrays:
    passing the matrix through ``jax.jit`` ships the arrays as arguments
    instead of baking hundreds of MB of constants into the program (which
    would blow up compile payloads).  Host metadata travels as aux data
    keyed by object identity, so repeated jit calls with the same matrix
    hit the compilation cache."""

    def __init__(
        self,
        blocks: List[dict],
        row_prange: PRange,
        col_prange: PRange,
        backend: Backend,
        assembled: bool,
    ):
        self.blocks = blocks
        self.row_prange = row_prange
        self.col_prange = col_prange
        self.backend = backend
        self.assembled = assembled
        self._device: Optional[DeviceSpMat] = None
        self._device_T = None
        self._device_df = None
        # optional closed-form caches set by structured constructors
        # (ops/stencil.py): exact nnz, host copy of the own_own DIA values
        self._nnz_cache: Optional[int] = None
        self._oo_dia_host = None
        self._dtype_cache = None

    # -- pytree protocol ----------------------------------------------
    def tree_flatten(self):
        # freeze on first flatten; device arrays (and the lazily-built
        # transpose / df64 pair, if any) are the leaves — they ride jit as
        # ARGUMENTS instead of baked constants
        return (self.device(), self._device_T, self._device_df), _HostRef(self)

    @classmethod
    def tree_unflatten(cls, host_ref, children):
        dev, dev_t, dev_df = children
        host = host_ref.obj
        obj = cls.__new__(cls)
        obj.__dict__.update(host.__dict__)
        obj._device = dev
        obj._device_T = dev_t
        obj._device_df = dev_df
        return obj

    # -- info ----------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return (self.row_prange.n_global, self.col_prange.n_global)

    @property
    def dtype(self):
        # cache set by closed-form constructors whose host 'oo' mirror is
        # built lazily (ops/stencil.py) — a dtype query must not force it
        if self._dtype_cache is not None:
            return self._dtype_cache
        return self.blocks[0]["oo"].dtype

    def nnz(self) -> int:
        if self._nnz_cache is not None:
            return self._nnz_cache
        tot = 0
        for b in self.blocks:
            for k in ("oo", "oh", "ho", "hh"):
                if b.get(k) is not None:
                    tot += b[k].nnz
        return tot

    def __repr__(self):
        return (
            f"PSparseMatrix({self.shape[0]}x{self.shape[1]}, P="
            f"{self.row_prange.n_parts}, nnz={self.nnz()}, "
            f"assembled={self.assembled})"
        )

    # parity accessors (own_own_values etc., src/p_sparse_matrix.jl:32-54)
    def own_own_values(self) -> List[sp.csr_matrix]:
        return [b["oo"] for b in self.blocks]

    def own_ghost_values(self) -> List[sp.csr_matrix]:
        return [b["oh"] for b in self.blocks]

    def ghost_own_values(self) -> List[Optional[sp.csr_matrix]]:
        return [b.get("ho") for b in self.blocks]

    def ghost_ghost_values(self) -> List[Optional[sp.csr_matrix]]:
        return [b.get("hh") for b in self.blocks]

    # -- device freeze -------------------------------------------------
    def row_layout(self) -> VectorLayout:
        return _layout_cache(self.row_prange)

    def col_layout(self) -> VectorLayout:
        return _layout_cache(self.col_prange)

    def device(self) -> DeviceSpMat:
        if self._device is None:
            if getattr(self, "_local_only", False):
                self._device = _freeze_local_ell(self)
                return self._device
            rlay = self.row_layout()
            clay = self.col_layout()
            no = rlay.n_own_pad
            ngc = max(clay.n_ghost_pad, 1)
            if not hasattr(self, "_freeze_caches"):
                self._freeze_caches = {}
            oo = freeze_block(
                [b["oo"] for b in self.blocks], no, clay.n_own_pad,
                cache=self._freeze_caches.setdefault("oo", {}),
            )
            oh = freeze_block(
                [b["oh"] for b in self.blocks], no, ngc,
                cache=self._freeze_caches.setdefault("oh", {}),
            )
            ho = hh = None
            if not self.assembled:
                ng = max(rlay.n_ghost_pad, 1)
                ho = freeze_block(
                    [b["ho"] if b.get("ho") is not None else sp.csr_matrix((li.n_ghost, b["oo"].shape[1]), dtype=self.dtype)
                     for b, li in zip(self.blocks, self.row_prange.partition())],
                    ng,
                    clay.n_own_pad,
                )
                hh = freeze_block(
                    [b["hh"] if b.get("hh") is not None else sp.csr_matrix((li.n_ghost, b["oh"].shape[1]), dtype=self.dtype)
                     for b, li in zip(self.blocks, self.row_prange.partition())],
                    ng,
                    ngc,
                )
            self._device = self.backend.shard(DeviceSpMat(oo, oh, ho, hh))
        return self._device

    def device_transpose(self):
        """Frozen (own_own^T, own_ghost^T) blocks for the transpose SpMV."""
        if self._device_T is None:
            if _is_local_only(self):
                self._device_T = _freeze_local_transpose(self)
                return self._device_T
            clay = self.col_layout()
            rlay = self.row_layout()
            ooT = freeze_block(
                [b["oo"].T.tocsr() for b in self.blocks], clay.n_own_pad, rlay.n_own_pad
            )
            ohT = freeze_block(
                [b["oh"].T.tocsr() for b in self.blocks],
                max(clay.n_ghost_pad, 1),
                rlay.n_own_pad,
            )
            self._device_T = self.backend.shard((ooT, ohT))
        return self._device_T

    def invalidate_device(self):
        self._device = None
        self._device_T = None
        self._device_df = None
        self._oo_dia_host = None

    # -- local (blockwise) algebra --------------------------------------
    # Parity: scalar/additive matrix ops used blockwise by block_arrays.jl
    # tests (2*A, +A, -A, B+A, B-A) and `I - A` (src/p_sparse_matrix.jl:2309).
    # These are purely local: partitions are unchanged, scipy handles the
    # per-part sparse algebra on host, the device freeze is rebuilt lazily.
    def _map_blocks(self, f) -> "PSparseMatrix":
        new_blocks = []
        for b in self.blocks:
            nb = {k: (f(v) if v is not None else None) for k, v in b.items()}
            new_blocks.append(nb)
        out = PSparseMatrix(
            new_blocks, self.row_prange, self.col_prange, self.backend, self.assembled
        )
        if getattr(self, "_local_only", False):
            # blockwise maps keep placeholders as placeholders: the result
            # is still per-process
            out._local_only = True
        return out

    def _zip_blocks(self, other: "PSparseMatrix", f) -> "PSparseMatrix":
        if (
            other.row_prange is not self.row_prange
            or other.col_prange is not self.col_prange
        ) and other.shape != self.shape:
            raise ValueError("matrix shapes/partitions do not match")
        new_blocks = []
        for ba, bb in zip(self.blocks, other.blocks):
            nb = {}
            for k in set(ba) | set(bb):
                va, vb = ba.get(k), bb.get(k)
                if va is None and vb is None:
                    nb[k] = None
                elif va is None:
                    nb[k] = f(sp.csr_matrix(vb.shape, dtype=vb.dtype), vb)
                elif vb is None:
                    nb[k] = f(va, sp.csr_matrix(va.shape, dtype=va.dtype))
                else:
                    nb[k] = f(va, vb)
            new_blocks.append(nb)
        out = PSparseMatrix(
            new_blocks, self.row_prange, self.col_prange, self.backend, self.assembled
        )
        if getattr(self, "_local_only", False) or getattr(other, "_local_only", False):
            out._local_only = True
        return out

    def copy(self) -> "PSparseMatrix":
        return self._map_blocks(lambda m: m.copy())

    def astype(self, dtype) -> "PSparseMatrix":
        """Blockwise host dtype conversion (e.g. the f32 preconditioner
        copy of an f64 operator for ``cg_df64``)."""
        return self._map_blocks(lambda m: m.astype(dtype))

    def __mul__(self, a):
        if not np.isscalar(a):
            return NotImplemented
        return self._map_blocks(lambda m: (m * a).tocsr())

    __rmul__ = __mul__

    def __truediv__(self, a):
        if not np.isscalar(a):
            return NotImplemented
        return self * (1.0 / a)

    def __neg__(self):
        return self * -1.0

    def __pos__(self):
        return self

    def __add__(self, other):
        if not isinstance(other, PSparseMatrix):
            return NotImplemented
        return self._zip_blocks(other, lambda a, b: (a + b).tocsr())

    def __sub__(self, other):
        if not isinstance(other, PSparseMatrix):
            return NotImplemented
        return self._zip_blocks(other, lambda a, b: (a - b).tocsr())


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def _build_part_blocks(
    li_row: LocalIndices,
    li_col: LocalIndices,
    I: np.ndarray,
    J: np.ndarray,
    V: np.ndarray,
    subassembled: bool,
    dtype,
):
    """Classify local triplets (global ids) into split blocks.

    Returns (blocks dict, row LocalIndices w/ ghosts, col LocalIndices w/
    ghosts, classification info for the reuse cache).
    """
    I = np.asarray(I, dtype=INT)
    J = np.asarray(J, dtype=INT)
    V = np.asarray(V, dtype=dtype)

    # --- rows
    iro = li_row.global_to_own(I)
    row_is_own = iro >= 0
    if subassembled:
        gI = I[~row_is_own]
        li_row2 = li_row
        if gI.size:
            gids = np.unique(gI)
            # only genuinely NEW ghost rows need an owner lookup; when the
            # partition already carries every touched ghost (e.g. rows_co in
            # consistent_matrix) identity is preserved so layout caches and
            # block alignment (spmm) keep working
            new_g = gids[li_row.global_to_ghost(gids) < 0]
            if new_g.size:
                if li_row.global_to_owner is None:
                    raise ValueError(
                        "subassembled psparse requires global_to_owner on rows"
                    )
                owners = np.asarray(li_row.global_to_owner(new_g), dtype=INT)
                new_g, owners = _sorted_ghosts(new_g, owners)
                li_row2 = li_row.union_ghost(new_g, owners)
        irg = li_row2.global_to_ghost(I)
    else:
        assert row_is_own.all(), "assembled psparse: off-owner rows present"
        li_row2 = li_row
        irg = np.full(I.shape, -1, dtype=INT)

    # --- cols
    jco = li_col.global_to_own(J)
    col_is_own = jco >= 0
    gJ = J[~col_is_own]
    ghost_j = np.unique(gJ) if gJ.size else np.zeros(0, dtype=INT)
    # drop ids already ghosts of li_col
    if ghost_j.size:
        already = li_col.global_to_ghost(ghost_j) >= 0
        new_j = ghost_j[~already]
    else:
        new_j = ghost_j
    if new_j.size:
        if li_col.global_to_owner is None:
            raise ValueError("psparse requires global_to_owner on cols")
        owners = np.asarray(li_col.global_to_owner(new_j), dtype=INT)
        new_j, owners = _sorted_ghosts(new_j, owners)
        li_col2 = li_col.union_ghost(new_j, owners)
    else:
        li_col2 = li_col
    jcg = li_col2.global_to_ghost(J)

    no_r, ng_r = li_row2.n_own, li_row2.n_ghost
    no_c, ng_c = li_col2.n_own, li_col2.n_ghost

    def coo_block(sel, ri, ci, m, n):
        return compresscoo(ri[sel], ci[sel], V[sel], m, n)

    m_oo = row_is_own & col_is_own
    m_oh = row_is_own & ~col_is_own
    blocks = {
        "oo": coo_block(m_oo, iro, jco, no_r, no_c),
        "oh": coo_block(m_oh, iro, jcg, no_r, ng_c),
    }
    if subassembled:
        m_ho = ~row_is_own & col_is_own
        m_hh = ~row_is_own & ~col_is_own
        blocks["ho"] = coo_block(m_ho, irg, jco, ng_r, no_c)
        blocks["hh"] = coo_block(m_hh, irg, jcg, ng_r, ng_c)
    info = (iro, irg, jco, jcg, row_is_own, col_is_own)
    return blocks, li_row2, li_col2, info


def psparse(
    I_parts: Sequence[np.ndarray],
    J_parts: Sequence[np.ndarray],
    V_parts: Sequence[np.ndarray],
    rows,
    cols,
    backend: Backend,
    assembled: bool = False,
    assemble: bool = True,
    reuse: bool = False,
    dtype=None,
    indices: str = "global",
    restore_ids: bool = True,
):
    """Main constructor (parity: psparse, src/p_sparse_matrix.jl:1150-1286).

    Input states: disassembled (per-part COO with off-owner rows; default),
    or ``assembled=True`` (all triplets already in own rows).  With
    ``assemble=True`` the result is assembled (ghost-row contributions moved
    to owners); with ``assemble=False`` it stays subassembled with
    ghost_own/ghost_ghost blocks.  With ``reuse=True`` returns ``(A, cache)``
    for ``psparse_refill``.

    ``indices="local"`` (parity: the ``indices=:local`` kwarg,
    src/p_sparse_matrix.jl:1150-1161): I/J are per-part LOCAL ids into
    ``rows``/``cols`` (whose partitions must already carry any ghost ids the
    triplets touch); they are mapped to global ids here and the constructor
    proceeds identically.  NOTE: accepting ``indices="local"`` on the
    DISASSEMBLED path (``assembled=False, assemble=True``) is a documented
    superset of the reference API — the reference asserts
    ``indices === :global`` when disassembled
    (src/p_sparse_matrix.jl:1163-1168); here the local->global remap makes
    it well-defined.  ``restore_ids`` is accepted for API parity; it is
    a no-op because this constructor never mutates its inputs (the
    reference's in-place global->local compression is what needs undoing,
    src/p_sparse_matrix.jl:1199-1208).
    """
    rows_pr = as_prange(rows)
    cols_pr = as_prange(cols)
    P = rows_pr.n_parts
    dtype = dtype or np.asarray(V_parts[0]).dtype
    if indices not in ("global", "local"):
        raise ValueError(f"indices must be 'global' or 'local', got {indices!r}")
    if indices == "local":
        from .parallel.p_range import map_local_to_global

        I_parts = [
            map_local_to_global(np.asarray(I_parts[p], dtype=INT), rows_pr[p])
            for p in range(P)
        ]
        J_parts = [
            map_local_to_global(np.asarray(J_parts[p], dtype=INT), cols_pr[p])
            for p in range(P)
        ]

    if assembled or not assemble:
        tri = [
            (
                np.asarray(I_parts[p], dtype=INT),
                np.asarray(J_parts[p], dtype=INT),
                np.asarray(V_parts[p], dtype=dtype),
                np.full(len(np.asarray(I_parts[p])), p, dtype=INT),
                np.arange(len(np.asarray(I_parts[p])), dtype=INT),
            )
            for p in range(P)
        ]
    else:
        # shuffle triplets to their row owners (host all-to-all; parity:
        # assemble_coo!, src/p_sparse_matrix.jl:213-289).  One stable
        # argsort-by-owner per part + O(1) run slicing — the former
        # per-destination boolean masks were O(P * nnz_p) per part and
        # dominated large-P setup (round-2 VERDICT item #4).
        owners = find_owner(rows_pr.partition(), I_parts)
        sorted_parts = []
        for p in range(P):
            I = np.asarray(I_parts[p], dtype=INT)
            J = np.asarray(J_parts[p], dtype=INT)
            V = np.asarray(V_parts[p], dtype=dtype)
            o = np.asarray(owners[p], dtype=INT)
            ordr = np.argsort(o, kind="stable")
            so = o[ordr]
            bounds = np.searchsorted(so, np.arange(P + 1))
            sorted_parts.append(
                (I[ordr], J[ordr], V[ordr], ordr.astype(INT), bounds)
            )
        tri = []
        z = np.zeros(0, dtype=INT)
        for d in range(P):
            segs = [
                (sI[b[d]:b[d + 1]], sJ[b[d]:b[d + 1]], sV[b[d]:b[d + 1]],
                 np.full(b[d + 1] - b[d], p, dtype=INT), sidx[b[d]:b[d + 1]])
                for p, (sI, sJ, sV, sidx, b) in enumerate(sorted_parts)
                if b[d + 1] > b[d]
            ]
            if segs:
                tri.append(
                    tuple(np.concatenate([s[k] for s in segs]) for k in range(5))
                )
            else:
                tri.append((z, z, np.zeros(0, dtype=dtype), z, z))

    subassembled = not (assembled or assemble)
    new_rows, new_cols, all_blocks, infos = [], [], [], []
    for p in range(P):
        I, J, V, op_, oi_ = tri[p]
        blocks, li_r, li_c, info = _build_part_blocks(
            rows_pr[p], cols_pr[p], I, J, V, subassembled, dtype
        )
        all_blocks.append(blocks)
        new_rows.append(li_r)
        new_cols.append(li_c)
        infos.append(info)

    A = PSparseMatrix(
        all_blocks,
        PRange(new_rows) if subassembled else rows_pr,
        PRange(new_cols),
        backend,
        assembled=not subassembled,
    )
    if not reuse:
        return A
    cache = _build_reuse_cache(A, tri, infos)
    return A, cache


def _build_reuse_cache(A: PSparseMatrix, tri, infos):
    """Per original part: (dest_part, block id, data position) of each
    original triplet (parity: the psparse! reuse cache,
    src/p_sparse_matrix.jl:1291-1305)."""
    order = ("oo", "oh", "ho", "hh")
    P = len(tri)
    n_orig = np.zeros(P, dtype=np.int64)
    for p in range(P):
        _, _, _, op_, oi_ = tri[p]
        if op_.size:
            np.maximum.at(n_orig, op_, oi_.astype(np.int64) + 1)
    # flat per-origin slot arrays (one scatter per destination block instead
    # of a python loop over origin parts; round-4 VERDICT weak #4)
    offsets = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(n_orig, out=offsets[1:])
    total = int(offsets[-1])
    dp_flat = np.full(total, -1, dtype=INT)
    db_flat = np.full(total, -1, dtype=INT)
    dx_flat = np.full(total, -1, dtype=INT)
    for p in range(P):
        I, J, V, op_, oi_ = tri[p]
        iro, irg, jco, jcg, rown, coln = infos[p]
        for bi, name in enumerate(order):
            blk = A.blocks[p].get(name)
            if blk is None:
                continue
            if name == "oo":
                sel = rown & coln
                ri, ci = iro, jco
            elif name == "oh":
                sel = rown & ~coln
                ri, ci = iro, jcg
            elif name == "ho":
                sel = ~rown & coln
                ri, ci = irg, jco
            else:
                sel = ~rown & ~coln
                ri, ci = irg, jcg
            if not sel.any():
                continue
            pos = precompute_nzindex(blk, ri[sel], ci[sel])
            flat = offsets[op_[sel]] + oi_[sel]
            dp_flat[flat] = p
            db_flat[flat] = bi
            dx_flat[flat] = pos
    dest_part = [dp_flat[offsets[q] : offsets[q + 1]] for q in range(P)]
    dest_block = [db_flat[offsets[q] : offsets[q + 1]] for q in range(P)]
    dest_pos = [dx_flat[offsets[q] : offsets[q + 1]] for q in range(P)]
    return (dest_part, dest_block, dest_pos)


def psparse_refill(A: PSparseMatrix, V_parts, cache) -> None:
    """Refill values at fixed sparsity (parity: psparse!,
    src/p_sparse_matrix.jl:1291-1305).  Host-side; invalidates the frozen
    device arrays so the next ``device()`` re-freezes."""
    order = ("oo", "oh", "ho", "hh")
    dest_part, dest_block, dest_pos = cache
    for b in A.blocks:
        for name in order:
            if b.get(name) is not None:
                b[name].data[:] = 0
    for q, V in enumerate(V_parts):
        V = np.asarray(V)
        dp, db, dx = dest_part[q], dest_block[q], dest_pos[q]
        ok = dx >= 0
        key = dp[ok] * 4 + db[ok]
        for k in np.unique(key):
            m = key == k
            np.add.at(
                A.blocks[int(k) // 4][order[int(k) % 4]].data,
                dx[ok][m],
                V[ok][m],
            )
    A.invalidate_device()


class DeviceRefill:
    """Compiled re-fill of the FROZEN device blocks at fixed sparsity
    (parity: psparse!, src/p_sparse_matrix.jl:1291-1305 — re-designed so
    Newton/ODE re-assembly never leaves the device).

    Built once from a matrix and its ``psparse(reuse=True)`` cache: for
    every original triplet it precomputes (destination part, flat slot in
    the frozen DIA/ELL value array), composing the reuse cache's CSR data
    position with the static freeze layout (DIA: slot = d*R + row; ELL:
    slot = row*K + lane).  Calling it with the stacked new values
    ``V[P, n_orig_pad]`` returns a fresh :class:`DeviceSpMat` via one
    scatter-add per block — pass it to ``spmv(A, x, dev=...)``.
    """

    def __init__(self, A: PSparseMatrix, cache):
        order = ("oo", "oh", "ho", "hh")
        dev = A.device()
        devs = {"oo": dev.oo, "oh": dev.oh, "ho": dev.ho, "hh": dev.hh}
        dest_part, dest_block, dest_pos = cache
        P = len(A.blocks)
        self.n_orig = [dp.shape[0] for dp in dest_part]
        self.n_orig_pad = max([1] + self.n_orig)
        self.dtype = A.dtype
        # per (part, block): csr data position -> flat slot
        slot_of_pos = {}
        for name in order:
            db = devs[name]
            if db is None:
                continue
            for p in range(P):
                csr = A.blocks[p].get(name)
                if csr is None:
                    continue
                csr = csr.tocsr()
                nnz_row = np.diff(csr.indptr)
                rows = np.repeat(np.arange(csr.shape[0]), nnz_row)
                if db.kind == "dia":
                    offs = np.asarray(db.offsets, dtype=np.int64)
                    d = np.searchsorted(offs, csr.indices.astype(np.int64) - rows)
                    R = db.vals.shape[-1]
                    slot = d * R + rows
                else:
                    lane = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], nnz_row)
                    K = db.vals.shape[-1]
                    slot = rows * K + lane
                slot_of_pos[(p, name)] = slot.astype(np.int64)
        # scatter tables per block: (orig part, orig pos, dest part, slot)
        self.tables = {}
        for bi, name in enumerate(order):
            if devs[name] is None:
                continue
            qs, ts, ps, slots = [], [], [], []
            for q in range(P):
                sel = np.flatnonzero(
                    (dest_block[q] == bi) & (dest_part[q] >= 0) & (dest_pos[q] >= 0)
                )
                if not sel.size:
                    continue
                dps = dest_part[q][sel]
                qs.append(np.full(sel.size, q, dtype=np.int32))
                ts.append(sel.astype(np.int32))
                ps.append(dps.astype(np.int32))
                slot_q = np.empty(sel.size, dtype=np.int64)
                for p_ in np.unique(dps):
                    m = dps == p_
                    slot_q[m] = slot_of_pos[(int(p_), name)][dest_pos[q][sel[m]]]
                slots.append(slot_q)
            if qs:
                self.tables[name] = tuple(
                    jnp.asarray(np.concatenate(a))
                    for a in (qs, ts, ps, slots)
                )
            else:
                self.tables[name] = None
        # static output shapes + shared column/offset structure
        self._shape = {
            name: (None if devs[name] is None else tuple(int(s) for s in devs[name].vals.shape))
            for name in order
        }
        self._dev = devs

    def stack_values(self, V_parts) -> jnp.ndarray:
        """Host helper: per-part original-value arrays -> [P, n_orig_pad]."""
        P = len(V_parts)
        out = np.zeros((P, self.n_orig_pad), dtype=self.dtype)
        for q, v in enumerate(V_parts):
            v = np.asarray(v)
            out[q, : v.size] = v
        return jnp.asarray(out)

    def __call__(self, V_stacked: jnp.ndarray) -> DeviceSpMat:
        from .ops.blocks import DeviceBlock, make_dia_block

        out = {}
        for name in ("oo", "oh", "ho", "hh"):
            db = self._dev[name]
            if db is None:
                out[name] = None
                continue
            Pn, *rest = self._shape[name]
            flat_n = int(np.prod(rest))
            tab = self.tables[name]
            if tab is None:
                newv = jnp.zeros((Pn, flat_n), dtype=V_stacked.dtype)
            else:
                q, t, p, slot = tab
                vals = V_stacked[q, t]
                newv = (
                    jnp.zeros((Pn, flat_n), dtype=V_stacked.dtype)
                    .at[p, slot]
                    .add(vals)
                )
            newv = newv.reshape(self._shape[name]).astype(db.vals.dtype)
            if db.kind == "dia":
                out[name] = make_dia_block(db.offsets, db.n_cols_pad, newv)
            else:
                out[name] = DeviceBlock(
                    "ell", None, db.n_cols_pad, db.cols, newv
                )
        return DeviceSpMat(out["oo"], out["oh"], out["ho"], out["hh"])


def device_refill_plan(A: PSparseMatrix, cache) -> DeviceRefill:
    """Build the compiled-refill plan (see :class:`DeviceRefill`)."""
    return DeviceRefill(A, cache)


def psparse_from_blocks(
    blocks: List[dict], rows: PRange, cols: PRange, backend: Backend, assembled=True
) -> PSparseMatrix:
    """Parity: psparse_from_split_blocks (src/p_sparse_matrix.jl:1307-1332)."""
    return PSparseMatrix(blocks, as_prange(rows), as_prange(cols), backend, assembled)


# ---------------------------------------------------------------------------
# host global view (setup-time ops)
# ---------------------------------------------------------------------------

def _is_local_only(A: PSparseMatrix) -> bool:
    return bool(getattr(A, "_local_only", False))


def _require_full_blocks(A: PSparseMatrix, op: str) -> None:
    """Loud guard (round-3 VERDICT missing #2): a ``psparse_local`` matrix
    holds REAL host blocks only for ``backend.local_parts()`` — every other
    part is an empty placeholder.  Host setup operations that iterate all
    parts' blocks would silently sum those placeholders and return PARTIAL
    results; operations without a per-process implementation must refuse."""
    if _is_local_only(A):
        raise ValueError(
            f"{op}: unsupported on a per-process (_local_only) PSparseMatrix "
            "— non-local parts hold empty placeholder blocks, so this host "
            "setup operation would silently return partial results. "
            "Use replicate_psparse(A) first if the matrix is small enough to "
            "hold on every process."
        )


def _data_parts(A: PSparseMatrix) -> List[int]:
    """Parts whose host blocks are REAL on this process: all parts for an
    ordinary matrix, ``backend.local_parts()`` for a per-process one."""
    if _is_local_only(A):
        return list(A.backend.local_parts())
    return list(range(A.row_prange.n_parts))


def _route_msgs(backend, P, msgs, dtypes, local_only, stats=None):
    """Deliver part-to-part setup messages.  Ordinary (replicated-host)
    mode: every part's messages were produced in this process — plain
    passthrough.  Per-process mode: cross-process messages ride the
    edge-colored ppermute exchange (parallel/host_exchange.py)."""
    if not local_only:
        if stats is not None:
            stats.update(wire_bytes=0, wire_entries=0, n_rounds=0, cross_msgs=0)
        return dict(msgs)
    from .parallel.host_exchange import exchange_part_messages

    return exchange_part_messages(backend, P, msgs, dtypes, stats=stats)


def _sync_ghosted_partition(backend, P, base_parts, built: dict):
    """Full per-part LocalIndices list: the data parts supply their built
    (ghosted) indices; the rest are reconstructed from allgathered ghost
    metadata (O(surface)) on the matching base — identical on every
    process."""
    if len(built) == P:
        return [built[p] for p in range(P)]
    from .parallel.host_exchange import allgather_part_arrays

    gids = allgather_part_arrays(
        backend, P, {p: li.ghost_to_global for p, li in built.items()}, INT
    )
    gown = allgather_part_arrays(
        backend, P, {p: li.ghost_to_owner for p, li in built.items()}, INT
    )
    return [
        built[p] if p in built else base_parts[p].replace_ghost(gids[p], gown[p])
        for p in range(P)
    ]


def _placeholder_blocks(li_r, li_c, dtype, subassembled: bool = False) -> dict:
    b = {
        "oo": sp.csr_matrix((li_r.n_own, li_c.n_own), dtype=dtype),
        "oh": sp.csr_matrix((li_r.n_own, li_c.n_ghost), dtype=dtype),
    }
    if subassembled:
        b["ho"] = sp.csr_matrix((li_r.n_ghost, li_c.n_own), dtype=dtype)
        b["hh"] = sp.csr_matrix((li_r.n_ghost, li_c.n_ghost), dtype=dtype)
    return b


def _psparse_auto(tri: dict, rows: PRange, cols: PRange, backend, dtype, local_only):
    """Disassembled-COO construction routed by execution mode: per-process
    triplets go through ``psparse_local`` (cross-process off-owner
    shuffle), replicated ones through the ordinary constructor."""
    P = rows.n_parts
    if local_only:
        I = [tri[p][0] if p in tri else None for p in range(P)]
        J = [tri[p][1] if p in tri else None for p in range(P)]
        V = [tri[p][2] if p in tri else None for p in range(P)]
        return psparse_local(I, J, V, rows, cols, backend, dtype=dtype)
    I = [tri[p][0] for p in range(P)]
    J = [tri[p][1] for p in range(P)]
    V = [tri[p][2] for p in range(P)]
    return psparse(
        I, J, V, rows, cols, backend, assembled=False, assemble=True, dtype=dtype
    )


def to_global_scipy(A: PSparseMatrix) -> sp.csr_matrix:
    """Sum all per-part blocks into one global CSR (host)."""
    _require_full_blocks(A, "to_global_scipy")
    m, n = A.shape
    Is, Js, Vs = [], [], []
    for b, li_r, li_c in zip(A.blocks, A.row_prange.partition(), A.col_prange.partition()):
        maps = {
            "oo": (li_r.own_to_global, li_c.own_to_global),
            "oh": (li_r.own_to_global, li_c.ghost_to_global),
            "ho": (li_r.ghost_to_global, li_c.own_to_global),
            "hh": (li_r.ghost_to_global, li_c.ghost_to_global),
        }
        for name, (rm, cm) in maps.items():
            blk = b.get(name)
            if blk is None or blk.nnz == 0:
                continue
            coo = blk.tocoo()
            Is.append(rm[coo.row])
            Js.append(cm[coo.col])
            Vs.append(coo.data)
    if not Is:
        return sp.csr_matrix((m, n), dtype=A.dtype)
    G = sp.coo_matrix(
        (np.concatenate(Vs), (np.concatenate(Is), np.concatenate(Js))), shape=(m, n)
    )
    G.sum_duplicates()
    G = G.tocsr()
    G.sort_indices()
    return G


def psparse_from_global(
    G: sp.spmatrix, rows, cols, backend: Backend
) -> PSparseMatrix:
    """Split a global host matrix into an assembled PSparseMatrix."""
    rows_pr = as_prange(rows)
    cols_pr = as_prange(cols)
    G = G.tocsr()
    I_parts, J_parts, V_parts = [], [], []
    for li in rows_pr.partition():
        sub = G[li.own_to_global]
        coo = sub.tocoo()
        I_parts.append(li.own_to_global[coo.row])
        J_parts.append(coo.col.astype(INT))
        V_parts.append(coo.data)
    return psparse(
        I_parts, J_parts, V_parts, rows_pr, cols_pr, backend, assembled=True
    )


def centralize(A: PSparseMatrix) -> sp.csr_matrix:
    """Parity: centralize (src/p_sparse_matrix.jl:2463-2470)."""
    return to_global_scipy(A)


def gather_global_scipy(A: PSparseMatrix, max_rows: Optional[int] = None) -> sp.csr_matrix:
    """Global CSR of ``A`` on EVERY process — ``to_global_scipy`` for a
    replicated matrix, a triplet allgather for a per-process one.  Host
    memory O(global): intended for SMALL matrices (the AMG coarse level,
    debugging); ``max_rows`` guards accidental pod-scale gathers."""
    if not _is_local_only(A):
        return to_global_scipy(A)
    if max_rows is not None and A.shape[0] > max_rows:
        raise ValueError(
            f"gather_global_scipy: {A.shape[0]} rows exceeds max_rows="
            f"{max_rows} — refusing an O(global) gather of a large "
            "per-process matrix"
        )
    from .parallel.host_exchange import allgather_part_arrays

    P = A.row_prange.n_parts
    row_parts = A.row_prange.partition()
    col_parts = A.col_prange.partition()
    tri = {
        p: _part_triplets(
            A.blocks[p], row_parts[p], col_parts[p],
            ("oo", "oh") if A.assembled else ("oo", "oh", "ho", "hh"),
        )
        for p in _data_parts(A)
    }
    backend = A.backend
    Is = allgather_part_arrays(backend, P, {p: t[0] for p, t in tri.items()}, INT)
    Js = allgather_part_arrays(backend, P, {p: t[1] for p, t in tri.items()}, INT)
    Vs = allgather_part_arrays(backend, P, {p: t[2] for p, t in tri.items()}, A.dtype)
    m, n = A.shape
    G = sp.coo_matrix(
        (np.concatenate(Vs), (np.concatenate(Is), np.concatenate(Js))),
        shape=(m, n),
    )
    G.sum_duplicates()
    G = G.tocsr()
    G.sort_indices()
    return G


def replicate_psparse(A: PSparseMatrix, max_rows: Optional[int] = 1_000_000) -> PSparseMatrix:
    """Full-blocks (replicated-host) copy of a per-process matrix: every
    part's triplets are allgathered and re-split.  O(global) host memory —
    for small matrices (AMG coarse levels) and debugging."""
    if not _is_local_only(A):
        return A
    G = gather_global_scipy(A, max_rows=max_rows)
    rows = PRange([li.remove_ghost() for li in A.row_prange.partition()])
    cols = PRange([li.remove_ghost() for li in A.col_prange.partition()])
    return psparse_from_global(G, rows, cols, A.backend)


def _part_triplets(
    b: dict, li_r: LocalIndices, li_c: LocalIndices, names=("oo", "oh")
):
    """Global-id (I, J, V) triplets of the selected blocks of ONE part.
    Purely local: touches only this part's data."""
    row_maps = {
        "oo": li_r.own_to_global, "oh": li_r.own_to_global,
        "ho": li_r.ghost_to_global, "hh": li_r.ghost_to_global,
    }
    col_maps = {
        "oo": li_c.own_to_global, "oh": li_c.ghost_to_global,
        "ho": li_c.own_to_global, "hh": li_c.ghost_to_global,
    }
    Is, Js, Vs = [], [], []
    for name in names:
        blk = b.get(name)
        if blk is None or blk.nnz == 0:
            continue
        coo = blk.tocoo()
        Is.append(row_maps[name][coo.row])
        Js.append(col_maps[name][coo.col])
        Vs.append(coo.data)
    if not Is:
        z = np.zeros(0, dtype=INT)
        return z, z, np.zeros(0, dtype=b["oo"].dtype)
    return np.concatenate(Is), np.concatenate(Js), np.concatenate(Vs)


def _hstack_local(b: dict, which=("oo", "oh")) -> sp.csr_matrix:
    """[own_cols | ghost_cols] local-row block of one part as CSR."""
    mats = [b[k] for k in which if b.get(k) is not None]
    if len(mats) == 1:
        return mats[0].tocsr()
    return sp.hstack(mats, format="csr")


# ---------------------------------------------------------------------------
# the fixed-sparsity reuse tier (round-4 VERDICT missing #1)
#
# Parity: the reference's in-place forms of every expensive setup op —
# assemble! with cache (src/p_sparse_matrix.jl:1762-1816), in-place
# consistent! (:1991-2040), spmm!/spmtm! (:2227-2296), rap! (:2212-2225).
# Design: each `reuse=True` construction records, for every value it moved,
# a (source part, source block, data position) tag that rides along the
# triplet pipeline; after construction the tags compose with the
# destination block positions into a frozen value-routing plan.  The
# in-place `*_into` form is then a pure value gather/scatter (plus the
# numeric scipy product for spmm/spmtm) — no ghost discovery, no
# classification, no symbolic products.
# ---------------------------------------------------------------------------

_BLOCK_ORDER = ("oo", "oh", "ho", "hh")
_TAG_SHIFT = 40
_TAG_MASK = np.int64((1 << _TAG_SHIFT) - 1)


def _canon_csr(blk) -> sp.csr_matrix:
    """Canonical (sorted-indices) CSR view of a host block.  Tag positions
    address canonical CSR data order, so EVERY reuse-tier access — build
    and refill alike — must go through this: blocks may be stored in other
    formats (the stencil constructor keeps a DIA host mirror) whose .data
    order differs.  A csr input is sorted IN PLACE (stays canonical);
    other formats convert deterministically."""
    m = blk.tocsr()
    if not m.has_sorted_indices:
        m.sort_indices()
    return m


def _canon_data(blk) -> np.ndarray:
    return _canon_csr(blk).data


def _canonicalize_blocks(A: "PSparseMatrix") -> None:
    """Normalize every host block of ``A`` to canonical CSR IN PLACE (the
    stencil constructors keep DIA host mirrors whose .data order differs).
    Reuse-tier entry points call this once per matrix object so refills
    can address .data directly instead of re-converting per call."""
    for b in A.blocks:
        for name in _BLOCK_ORDER:
            v = b.get(name)
            if v is None:
                continue
            if not sp.issparse(v) or v.format != "csr":
                b[name] = _canon_csr(v)
            elif not v.has_sorted_indices:
                v.sort_indices()


def _tag_base(p: int, bi: int) -> np.int64:
    return np.int64((p * 4 + bi) << _TAG_SHIFT)


def _part_triplets_tagged(
    b: dict, li_r: LocalIndices, li_c: LocalIndices, p: int, names=("oo", "oh")
):
    """``_part_triplets`` that also returns the source tag of every triplet
    (tags address positions in ``b[name].data`` storage order)."""
    row_maps = {
        "oo": li_r.own_to_global, "oh": li_r.own_to_global,
        "ho": li_r.ghost_to_global, "hh": li_r.ghost_to_global,
    }
    col_maps = {
        "oo": li_c.own_to_global, "oh": li_c.ghost_to_global,
        "ho": li_c.own_to_global, "hh": li_c.ghost_to_global,
    }
    Is, Js, Vs, Ts = [], [], [], []
    for name in names:
        blk = b.get(name)
        if blk is None or blk.nnz == 0:
            continue
        m = _canon_csr(blk)
        coo = m.tocoo()  # data stays in canonical CSR storage order
        Is.append(row_maps[name][coo.row])
        Js.append(col_maps[name][coo.col])
        Vs.append(coo.data)
        Ts.append(
            _tag_base(p, _BLOCK_ORDER.index(name))
            | np.arange(m.nnz, dtype=np.int64)
        )
    if not Is:
        z = np.zeros(0, dtype=INT)
        return z, z, np.zeros(0, dtype=b["oo"].dtype), np.zeros(0, np.int64)
    return (
        np.concatenate(Is),
        np.concatenate(Js),
        np.concatenate(Vs),
        np.concatenate(Ts),
    )


def _dst_maps(blocks: dict, info):
    """(dst block id, dst data position) per input triplet of a
    ``_build_part_blocks`` call (composes the classification masks with a
    vectorized nzindex lookup)."""
    iro, irg, jco, jcg, rown, coln = info
    n = rown.shape[0]
    dst_block = np.full(n, -1, dtype=np.int64)
    dst_pos = np.full(n, -1, dtype=np.int64)
    sels = {
        "oo": (rown & coln, iro, jco),
        "oh": (rown & ~coln, iro, jcg),
        "ho": (~rown & coln, irg, jco),
        "hh": (~rown & ~coln, irg, jcg),
    }
    for bi, name in enumerate(_BLOCK_ORDER):
        blk = blocks.get(name)
        if blk is None:
            continue
        sel, ri, ci = sels[name]
        if not sel.any():
            continue
        idx = np.flatnonzero(sel)
        rsel = ri[sel]
        csel = ci[sel]
        # fast path: when the selected triplets are exactly the block's
        # canonical storage order (the COMMON case — canonical product
        # inputs with ascending own orders keep classification-mask
        # subsets canonical), positions are just arange; the O(nnz)
        # equality check is ~10x cheaper than the binary search
        pos = None
        if rsel.size == blk.nnz:
            blk_rows = np.repeat(
                np.arange(blk.shape[0], dtype=rsel.dtype), np.diff(blk.indptr)
            )
            if np.array_equal(blk_rows, rsel) and np.array_equal(
                blk.indices, csel
            ):
                pos = np.arange(blk.nnz, dtype=np.int64)
        if pos is None:
            pos = precompute_nzindex(blk, rsel, csel)
        dst_block[idx] = bi
        dst_pos[idx] = pos
    return dst_block, dst_pos


class _MatRoutes:
    """Frozen value-routing plan between two fixed-sparsity PSparseMatrix
    objects: ``refill`` zeroes the destination data arrays and scatter-adds
    every source value at its recorded position.

    PER-PROCESS matrices (``_local_only``): the destination side may
    record routes whose SOURCE part lives on another process (its tag
    rode the construction-time wire).  ``finalize_multiprocess`` sends
    each remote source a one-time request descriptor (which block
    positions to ship); every ``refill`` then runs ONE collective value
    exchange — cross-process refill traffic is exactly the values that
    crossed at construction (O(surface)), and the routing never re-runs."""

    def __init__(self):
        self._acc: dict = {}
        self.routes: list = []
        self.send_plan: dict = {}   # (src_p, dst_p) -> (sbi, spos)
        self.recv_scatter: dict = {}  # (src_p, dst_p) -> (dbi, dpos)
        self.multiprocess = False

    def add(self, dst_p: int, tags, dst_block, dst_pos) -> None:
        ok = (dst_pos >= 0) & (dst_block >= 0)
        tags, dst_block, dst_pos = tags[ok], dst_block[ok], dst_pos[ok]
        if not tags.size:
            return
        key = (tags >> _TAG_SHIFT) * 4 + dst_block
        spos = tags & _TAG_MASK
        order = np.argsort(key, kind="stable")
        ks = key[order]
        cuts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        for i, st in enumerate(cuts):
            en = cuts[i + 1] if i + 1 < cuts.size else ks.size
            sk = int(ks[st])
            src_key, dbi = sk // 4, sk % 4
            src_p, src_bi = src_key // 4, src_key % 4
            sel = order[st:en]
            self._acc.setdefault((dst_p, dbi, src_p, src_bi), []).append(
                (spos[sel], dst_pos[sel])
            )

    def finalize(self) -> "_MatRoutes":
        for k, segs in self._acc.items():
            spos = np.concatenate([s for s, _ in segs])
            dpos = np.concatenate([d for _, d in segs])
            self.routes.append(k + (spos, dpos))
        self._acc = {}
        return self

    def finalize_multiprocess(self, backend, P: int, dtype) -> "_MatRoutes":
        """One-time setup of the cross-process refill exchange: routes
        whose source part is remote become (a) a request descriptor sent
        to the source's process and (b) a local scatter plan aligned with
        the values that descriptor will produce.  COLLECTIVE."""
        from .parallel.host_exchange import exchange_part_messages

        self.multiprocess = True
        self.dtype = np.dtype(dtype)
        local = set(backend.local_parts())
        local_routes, remote = [], {}
        for r in self.routes:
            (dst_p, dbi, src_p, sbi, spos, dpos) = r
            if src_p in local:
                local_routes.append(r)
            else:
                remote.setdefault((dst_p, src_p), []).append(r)
        self.routes = local_routes
        reqs: dict = {}
        for (dst_p, src_p), rs in sorted(remote.items()):
            rs = sorted(rs, key=lambda r: (r[1], r[3]))  # (dbi, sbi)
            sbi = np.concatenate(
                [np.full(r[4].size, r[3], dtype=np.int64) for r in rs]
            )
            spos = np.concatenate([r[4] for r in rs]).astype(np.int64)
            dbi = np.concatenate(
                [np.full(r[5].size, r[1], dtype=np.int64) for r in rs]
            )
            dpos = np.concatenate([r[5] for r in rs]).astype(np.int64)
            reqs[(dst_p, src_p)] = (sbi, spos)
            self.recv_scatter[(src_p, dst_p)] = (dbi, dpos)
        rcv = exchange_part_messages(
            backend, P, reqs, (np.int64, np.int64)
        )
        # rcv keys are (dst_p, src_p) with src_p LOCAL here: this process
        # must ship src_p's values to dst_p on every refill
        for (dst_p, src_p), (sbi, spos) in rcv.items():
            self.send_plan[(src_p, dst_p)] = (sbi, spos)
        return self

    def refill(self, src, out: "PSparseMatrix", data_of=None) -> None:
        """``data_of(src_p, block_name) -> values`` overrides the default
        source accessor (a PSparseMatrix's canonical block data) — e.g.
        the spmtm refill routes values straight out of the recomputed
        local products."""
        if data_of is None:
            _canonicalize_blocks(src)
            data_of = lambda p, name: _canon_data(src.blocks[p][name])
        for b in out.blocks:
            for name in _BLOCK_ORDER:
                if b.get(name) is not None:
                    b[name].data[:] = 0
        for (dst_p, dbi, src_p, sbi, spos, dpos) in self.routes:
            sdata = data_of(src_p, _BLOCK_ORDER[sbi])
            ddata = out.blocks[dst_p][_BLOCK_ORDER[dbi]].data
            np.add.at(ddata, dpos, sdata[spos])
        if self.multiprocess:
            from .parallel.host_exchange import exchange_part_messages

            msgs: dict = {}
            for (src_p, dst_p), (sbi, spos) in sorted(self.send_plan.items()):
                vals = np.empty(spos.size, dtype=self.dtype)
                for bi in np.unique(sbi):
                    m = sbi == bi
                    vals[m] = data_of(src_p, _BLOCK_ORDER[int(bi)])[spos[m]]
                msgs[(src_p, dst_p)] = (vals,)
            rcv = exchange_part_messages(
                out.backend, out.row_prange.n_parts, msgs, (self.dtype,)
            )
            for (src_p, dst_p), (vals,) in rcv.items():
                dbi, dpos = self.recv_scatter[(src_p, dst_p)]
                for bi in np.unique(dbi):
                    m = dbi == bi
                    np.add.at(
                        out.blocks[dst_p][_BLOCK_ORDER[int(bi)]].data,
                        dpos[m],
                        vals[m],
                    )
        out.invalidate_device()


def _hstack_with_tags(b: dict, p: int, names=("oo", "oh"), want_tags=True):
    """Row-wise [block0 | block1 | ...] CSR (scipy's C hstack) plus
    per-block fill maps (``loc.data[fill[bi]] = b[name].data``) and —
    optionally — per-entry source tags.  Valid because for CANONICAL
    blocks the hstack output is canonical with every row's block-k entries
    contiguous in block order (block k's columns all precede block
    k+1's), so the fill positions follow from pure indptr arithmetic."""
    mats = [(name, _canon_csr(b[name])) for name in names if b.get(name) is not None]
    nrows = mats[0][1].shape[0]
    if len(mats) == 1:
        name, m = mats[0]
        bi = _BLOCK_ORDER.index(name)
        fill = {bi: np.arange(m.nnz, dtype=np.int64)}
        tags = (
            _tag_base(p, bi) | np.arange(m.nnz, dtype=np.int64)
            if want_tags
            else None
        )
        # copy: the result becomes a cache-owned working operand whose data
        # a refill overwrites — returning the live block would silently
        # mutate the matrix the cache was built from
        return m.copy(), tags, fill
    loc = sp.hstack([m for _, m in mats], format="csr")
    cnts = [np.diff(m.indptr).astype(np.int64) for _, m in mats]
    indptr = loc.indptr.astype(np.int64)
    tags = np.empty(loc.nnz, dtype=np.int64) if want_tags else None
    fill = {}
    acc = np.zeros(nrows, dtype=np.int64)
    for (name, m), cnt in zip(mats, cnts):
        within = np.arange(m.nnz, dtype=np.int64) - np.repeat(
            m.indptr[:-1].astype(np.int64), cnt
        )
        out_pos = np.repeat(indptr[:-1] + acc, cnt) + within
        bi = _BLOCK_ORDER.index(name)
        if want_tags:
            tags[out_pos] = _tag_base(p, bi) | np.arange(m.nnz, dtype=np.int64)
        fill[bi] = out_pos
        acc += cnt
    return loc, tags, fill


def _csr_row_slice_positions(M: sp.csr_matrix, rows: np.ndarray) -> np.ndarray:
    """Positions in ``M.data`` of the entries of ``M[rows]`` in its storage
    order (scipy row slicing preserves within-row order)."""
    rows = np.asarray(rows)
    cnt = (M.indptr[rows + 1] - M.indptr[rows]).astype(np.int64)
    starts = np.repeat(M.indptr[rows].astype(np.int64), cnt)
    csum = np.cumsum(cnt) - cnt
    offs = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(csum, cnt)
    return starts + offs


def assemble_matrix(A: PSparseMatrix, reuse: bool = False) -> Task:
    """Subassembled -> assembled (parity: assemble,
    src/p_sparse_matrix.jl:1564-1756; with ``reuse=True`` the task yields
    ``(out, cache)`` for :func:`assemble_matrix_into` — parity: the
    in-place assemble! with cache, :1762-1816).

    Distributed algorithm on per-part blocks: each part turns its
    ghost-row blocks (ho/hh) into global triplets, groups them by the row
    owner (a per-neighbor triplet message, the host-tier analogue of the
    reference's three async exchanges at :1733-1736), and every owner
    merges the received triplets with its own oo/oh blocks.  Peak memory
    is O(local nnz) per part; no global matrix is ever materialized.
    On a per-process (``psparse_local``-built) matrix the messages ride
    the cross-process exchange and only local parts' blocks are built."""
    if A.assembled:
        return Task((A, None)) if reuse else Task(A)
    local_only = _is_local_only(A)
    P = A.row_prange.n_parts
    dtype = A.dtype
    row_parts = A.row_prange.partition()
    col_parts = A.col_prange.partition()
    data = _data_parts(A)
    # pack: per-destination triplet messages from the ghost-row blocks
    msgs: dict = {}
    own_tri: dict = {}
    for p in data:
        b, li_r, li_c = A.blocks[p], row_parts[p], col_parts[p]
        if reuse:
            own_tri[p] = _part_triplets_tagged(b, li_r, li_c, p, ("oo", "oh"))
            Ig, Jg, Vg, Tg = _part_triplets_tagged(
                b, li_r, li_c, p, ("ho", "hh")
            )
        else:
            own_tri[p] = _part_triplets(b, li_r, li_c, ("oo", "oh"))
            Ig, Jg, Vg = _part_triplets(b, li_r, li_c, ("ho", "hh"))
        if Ig.size:
            owners = li_r.ghost_to_owner[li_r.global_to_ghost(Ig)]
            order = np.argsort(owners, kind="stable")
            owners_s = owners[order]
            cuts = np.flatnonzero(np.diff(owners_s)) + 1
            for grp in np.split(order, cuts):
                msg = (Ig[grp], Jg[grp], Vg[grp])
                if reuse:
                    msg = msg + (Tg[grp],)
                msgs[(p, int(owners[grp[0]]))] = msg
    wire_dtypes = (INT, INT, dtype) + ((np.int64,) if reuse else ())
    rcv = _route_msgs(A.backend, P, msgs, wire_dtypes, local_only)
    # unpack + merge on each owner
    blocks: dict = {}
    built_cols: dict = {}
    routes = _MatRoutes() if reuse else None
    for p in data:
        chunks = [own_tri[p]] + [rcv[k] for k in sorted(rcv) if k[1] == p]
        I = np.concatenate([c[0] for c in chunks])
        J = np.concatenate([c[1] for c in chunks])
        V = np.concatenate([c[2] for c in chunks])
        b2, _, li_c2, info = _build_part_blocks(
            row_parts[p].remove_ghost(), col_parts[p], I, J, V, False, dtype
        )
        blocks[p] = b2
        built_cols[p] = li_c2
        if reuse:
            T = np.concatenate([c[3] for c in chunks])
            routes.add(p, T, *_dst_maps(b2, info))
    new_cols = _sync_ghosted_partition(A.backend, P, col_parts, built_cols)
    new_rows = [li.remove_ghost() for li in row_parts]
    all_blocks = [
        blocks[p]
        if p in blocks
        else _placeholder_blocks(new_rows[p], new_cols[p], dtype)
        for p in range(P)
    ]
    out = PSparseMatrix(
        all_blocks, PRange(new_rows), PRange(new_cols), A.backend, True
    )
    if local_only:
        out._local_only = True
    if reuse:
        routes.finalize()
        if local_only:
            routes.finalize_multiprocess(A.backend, P, dtype)
        return Task((out, routes))
    return Task(out)


def assemble_matrix_into(out: PSparseMatrix, A: PSparseMatrix, cache) -> None:
    """In-place re-assembly at fixed sparsity (parity: assemble!,
    src/p_sparse_matrix.jl:1762-1816): ``out`` gets the values of the
    re-filled subassembled ``A`` through the frozen routing plan — a pure
    value scatter, no ghost discovery or classification."""
    if cache is None:
        assert out is A, "cache-less assemble_matrix_into: A was already assembled"
        return
    cache.refill(A, out)


def consistent_matrix(
    A: PSparseMatrix, rows_co: PRange, reuse: bool = False
) -> Task:
    """Assembled -> overlapped: fetch the rows a part ghosts
    (parity: consistent, src/p_sparse_matrix.jl:1821-2040).  ``rows_co`` is
    a row partition with the wanted ghost rows.  With ``reuse=True`` the
    task yields ``(out, cache)`` for :func:`consistent_matrix_into`
    (parity: in-place consistent!, :1991-2040).

    Distributed algorithm: the wanted-rows requests need no exchange —
    partition METADATA is replicated, so every owner reads which of its
    rows each part ghosts straight out of ``rows_co``; owners reply with
    the triplets of those rows (the reference's snd of own rows wanted by
    others, :1836-2040); the receiver classifies its existing oo/oh plus
    the received rows into the four split blocks, union-ghosting any new
    columns.  Peak memory is O(local nnz + fetched nnz) per part.  On a
    per-process matrix the replies ride the cross-process exchange and
    only local parts' blocks are built."""
    assert A.assembled
    local_only = _is_local_only(A)
    P = rows_co.n_parts
    dtype = A.dtype
    data = _data_parts(A)
    co_parts = rows_co.partition()
    col_parts = A.col_prange.partition()
    # group every requester's ghosts BY OWNER once (argsort + split:
    # O(total_ghosts log), not an O(P^2) per-(owner, part) mask scan)
    data_set = set(data)
    wanted_by_owner: dict = {}  # owner -> [(requester, gids), ...]
    for p in range(P):
        li = co_parts[p]
        if li.n_ghost == 0:
            continue
        owners = np.asarray(li.ghost_to_owner)
        order = np.argsort(owners, kind="stable")
        so = owners[order]
        cuts = np.flatnonzero(np.r_[True, so[1:] != so[:-1]])
        for k, start in enumerate(cuts):
            end = cuts[k + 1] if k + 1 < cuts.size else so.size
            o = int(so[start])
            if o == p or o not in data_set:
                continue
            wanted_by_owner.setdefault(o, []).append(
                (p, np.asarray(li.ghost_to_global)[order[start:end]])
            )
    # reply construction: owners extract the requested rows as triplets
    msgs: dict = {}
    for o in data:
        reqs = wanted_by_owner.get(o)
        if not reqs:
            continue
        b, li_r, li_c = A.blocks[o], A.row_prange[o], col_parts[o]
        if reuse:
            loc, loc_tags, _ = _hstack_with_tags(b, o)
        else:
            loc = _hstack_local(b)
            loc_tags = None
        col_g = np.concatenate([li_c.own_to_global, li_c.ghost_to_global])
        for p, gids in reqs:
            pos = li_r.global_to_own(gids)
            assert (pos >= 0).all(), "consistent_matrix: requested non-own row"
            sub = loc[pos].tocoo()
            msg = (gids[sub.row], col_g[sub.col], sub.data)
            if reuse:
                msg = msg + (loc_tags[_csr_row_slice_positions(loc, pos)],)
            msgs[(o, p)] = msg
    wire_dtypes = (INT, INT, dtype) + ((np.int64,) if reuse else ())
    rcv = _route_msgs(A.backend, P, msgs, wire_dtypes, local_only)
    # merge on the requester: own rows stay, fetched rows become ho/hh
    blocks: dict = {}
    built_cols: dict = {}
    routes = _MatRoutes() if reuse else None
    for p in data:
        own = (
            _part_triplets_tagged(A.blocks[p], A.row_prange[p], col_parts[p], p)
            if reuse
            else _part_triplets(A.blocks[p], A.row_prange[p], col_parts[p])
        )
        chunks = [own] + [rcv[k] for k in sorted(rcv) if k[1] == p]
        I = np.concatenate([c[0] for c in chunks])
        J = np.concatenate([c[1] for c in chunks])
        V = np.concatenate([c[2] for c in chunks])
        b2, _, li_c2, info = _build_part_blocks(
            co_parts[p], col_parts[p], I, J, V, True, dtype
        )
        blocks[p] = b2
        built_cols[p] = li_c2
        if reuse:
            T = np.concatenate([c[3] for c in chunks])
            routes.add(p, T, *_dst_maps(b2, info))
    new_cols = _sync_ghosted_partition(A.backend, P, col_parts, built_cols)
    all_blocks = [
        blocks[p]
        if p in blocks
        else _placeholder_blocks(co_parts[p], new_cols[p], dtype, subassembled=True)
        for p in range(P)
    ]
    out = PSparseMatrix(
        all_blocks, PRange(list(co_parts)), PRange(new_cols), A.backend, False
    )
    if local_only:
        out._local_only = True
    if reuse:
        routes.finalize()
        if local_only:
            routes.finalize_multiprocess(A.backend, P, dtype)
        return Task((out, routes))
    return Task(out)


def consistent_matrix_into(out: PSparseMatrix, A: PSparseMatrix, cache) -> None:
    """In-place refresh of an overlapped matrix from new values of the
    assembled ``A`` at fixed sparsity (parity: in-place consistent!,
    src/p_sparse_matrix.jl:1991-2040): a pure value scatter through the
    frozen routing plan — the wanted-rows replies and the 4-block
    classification are never recomputed."""
    cache.refill(A, out)


# ---------------------------------------------------------------------------
# SpMV (the hot path)
# ---------------------------------------------------------------------------

def spmv(
    A: PSparseMatrix,
    x: PVector,
    alpha=1.0,
    dev=None,
    beta=None,
    y: Optional[PVector] = None,
) -> PVector:
    """result = alpha * A @ x [+ beta * y]  (parity: 5-arg mul!(c,A,b,α,β),
    src/p_sparse_matrix.jl:2105-2142; 3-arg form when ``y`` is None).

    x must be partitioned by ``A.col_prange``; ``y`` (if given) by
    ``A.row_prange``.  The ghost exchange and the own_own block product are
    data-independent, so XLA overlaps them (the compiled analogue of the
    reference's latency hiding).  alpha/beta are traced scalars — the
    ``alpha*(...) + beta*y`` epilogue fuses into the SpMV consumer, so the
    5-arg form saves one full vector read+write pass over
    ``alpha*spmv(...) + beta*y``.

    ``dev``: optional substitute :class:`DeviceSpMat` with the same
    structure as ``A.device()`` (e.g. a reduced-precision values copy)."""
    if dev is None:
        dev = A.device()
    clay = x.layout
    rlay = A.row_layout()
    if clay is not A.col_layout() and clay is rlay:
        # x arrived on the ROW layout (e.g. a solver's returned iterate for
        # a square operator with matching own partitions): silently using
        # its (ghost-free) layout would DROP every own_ghost contribution.
        # Re-home to the column layout — own values are shared, ghost slots
        # are refilled by the consistent exchange below.
        clay = A.col_layout()
        x = PVector(
            x.own,
            jnp.zeros((clay.n_parts, clay.n_ghost_pad), dtype=x.own.dtype),
            clay,
            x.backend,
        )
    backend = A.backend
    has_cg = clay.n_ghost_pad > 0 and clay.consistent_plan.n_rounds > 0
    has_y = y is not None
    if has_y and beta is None:
        beta = 1.0
    # alpha==1.0 (the hot default) statically skips the epilogue entirely:
    # a Pallas SpMV output cannot fuse with outer XLA elementwise ops, so an
    # unconditional `alpha*out` would cost a full extra vector pass
    has_alpha = not (isinstance(alpha, (int, float)) and alpha == 1.0)
    # scalars must carry the leading parts axis to ride vmap/shard_map
    P = rlay.n_parts

    def _b(s):
        return jnp.broadcast_to(jnp.asarray(s, x.own.dtype), (P,))

    extras = ()
    if has_alpha:
        extras += (_b(alpha),)
    if has_y:
        extras += (_b(beta), y.own)

    def epilogue(out, rest):
        i = 0
        if has_alpha:
            out = rest[i] * out
            i += 1
        if has_y:
            out = out + rest[i] * rest[i + 1]
        return out

    if A.assembled:
        if has_cg:
            def make_f():
                def f(xo, xg, cplan, oo, oh, *rest):
                    g = cplan.apply(xo, xg, "set")
                    return epilogue(oo.spmv(xo) + oh.spmv(g), rest)

                return f

            y_own = backend.spmd_cached(("spmv_cg", has_alpha, has_y), make_f)(
                x.own, x.ghost, clay.consistent_plan, dev.oo, dev.oh, *extras
            )
        else:
            def make_f():
                def f(xo, oo, *rest):
                    return epilogue(oo.spmv(xo), rest)

                return f

            y_own = backend.spmd_cached(("spmv", has_alpha, has_y), make_f)(
                x.own, dev.oo, *extras
            )
        y_ghost = jnp.zeros((rlay.n_parts, rlay.n_ghost_pad), dtype=y_own.dtype)
    else:
        def make_f(has_cg=has_cg):
            def f(xo, xg, cplan, rplan, oo, oh, ho, hh, *rest):
                g = cplan.apply(xo, xg, "set") if has_cg else xg
                yo = oo.spmv(xo) + oh.spmv(g)
                yg = ho.spmv(xo) + hh.spmv(g)
                yo = rplan.apply(yg, yo, "add")
                return epilogue(yo, rest)

            return f

        y_own = backend.spmd_cached(
            ("spmv_sub", has_cg, has_alpha, has_y), make_f
        )(
            x.own, x.ghost, clay.consistent_plan, rlay.assemble_plan,
            dev.oo, dev.oh, dev.ho, dev.hh, *extras,
        )
        y_ghost = jnp.zeros((rlay.n_parts, rlay.n_ghost_pad), dtype=y_own.dtype)
    return PVector(y_own, y_ghost, rlay, backend)


def spmtv(
    A: PSparseMatrix,
    x: PVector,
    alpha=1.0,
    beta=None,
    y: Optional[PVector] = None,
) -> PVector:
    """result = alpha * A.T @ x [+ beta * y] (parity: the 5-arg transpose
    mul!, src/p_sparse_matrix.jl:2144-2162 — which, like this function,
    asserts ``a.assembled``: the reference has no subassembled transpose
    path either).  Result is partitioned by ``A.col_prange``; ghost-column
    contributions are assembled back to their owners (reversed
    communication pattern); the alpha/beta epilogue fuses into the
    assembled result (one extra pass saved vs ``alpha*spmtv(...)+beta*y``)."""
    assert A.assembled, (
        "spmtv requires an assembled matrix (the reference's transpose mul! "
        "asserts a.assembled too, src/p_sparse_matrix.jl:2146)"
    )
    ooT, ohT = A.device_transpose()
    clay = A.col_layout()
    backend = A.backend
    has_cg = clay.n_ghost_pad > 0 and clay.assemble_plan.n_rounds > 0
    has_alpha = not (isinstance(alpha, (int, float)) and alpha == 1.0)
    has_y = y is not None
    if has_y and beta is None:
        beta = 1.0
    P = clay.n_parts

    def _b(s, dtype):
        return jnp.broadcast_to(jnp.asarray(s, dtype), (P,))

    extras = ()
    if has_alpha:
        extras += (_b(alpha, x.own.dtype),)
    if has_y:
        extras += (_b(beta, x.own.dtype), y.own)

    def epilogue(out, rest):
        i = 0
        if has_alpha:
            out = rest[i] * out
            i += 1
        if has_y:
            out = out + rest[i] * rest[i + 1]
        return out

    if has_cg:
        def make_f():
            def f(xo, aplan, ooT, ohT, *rest):
                yo = ooT.spmv(xo)
                yg = ohT.spmv(xo)
                yo = aplan.apply(yg, yo, "add")
                return epilogue(yo, rest)

            return f

        y_own = backend.spmd_cached(("spmtv_cg", has_alpha, has_y), make_f)(
            x.own, clay.assemble_plan, ooT, ohT, *extras
        )
    else:
        def make_f():
            def f(xo, ooT, *rest):
                return epilogue(ooT.spmv(xo), rest)

            return f

        y_own = backend.spmd_cached(("spmtv", has_alpha, has_y), make_f)(
            x.own, ooT, *extras
        )
    y_ghost = jnp.zeros((clay.n_parts, clay.n_ghost_pad), dtype=y_own.dtype)
    return PVector(y_own, y_ghost, clay, backend)


# ---------------------------------------------------------------------------
# derived operators (host/setup)
# ---------------------------------------------------------------------------

def dense_diag(A: PSparseMatrix) -> PVector:
    """Diagonal as a PVector on the row partition
    (parity: dense_diag, src/p_sparse_matrix.jl:2166-2188)."""
    from .pvector import pvector_from_own

    # per-process matrices: placeholder blocks yield zero rows for
    # non-local parts, and the multiprocess shard materializes only the
    # local rows — correct without a guard
    parts = []
    for b, li_r, li_c in zip(A.blocks, A.row_prange.partition(), A.col_prange.partition()):
        # diagonal lives in own_own where global row id == global col id
        oo = b["oo"].tocsr()
        d = np.zeros(li_r.n_own, dtype=A.dtype)
        gcols = li_c.own_to_global
        growz = li_r.own_to_global
        coo = oo.tocoo()
        m = gcols[coo.col] == growz[coo.row]
        d[coo.row[m]] = coo.data[m]
        parts.append(d)
    return pvector_from_own(parts, A.row_prange, A.backend)


def sparse_diag_matrix(v: PVector, rows: Optional[PRange] = None) -> PSparseMatrix:
    """Diagonal matrix from a PVector (parity: sparse_diag_matrix,
    src/p_sparse_matrix.jl:2192-2210)."""
    pr = rows or v.layout.pr
    own_only = PRange([li.remove_ghost() for li in pr.partition()])
    I_parts = [li.own_to_global for li in own_only.partition()]
    V_parts = v.own_values()
    return psparse(
        I_parts, I_parts, V_parts, own_only, own_only, v.backend, assembled=True
    )


class _SpmmCache:
    """Frozen plan for values-only re-evaluation of C = A @ B at fixed
    sparsity of both operands (parity: spmm!,
    src/p_sparse_matrix.jl:2227-2261): the consistent-fetch of B refreshes
    through its own routing plan, the local [A|ghost] x [[B],[Bghost]]
    CSR operands refresh through per-block fill maps, the numeric scipy
    product is recomputed, and its canonical values scatter straight into
    C's frozen blocks."""

    def __init__(self, Bc, bc_cache):
        self.Bc = Bc
        self.bc_cache = bc_cache
        self.parts: dict = {}

    def refill(
        self, C: PSparseMatrix, A: PSparseMatrix, B: PSparseMatrix,
        refresh_b: bool = True,
    ):
        _canonicalize_blocks(A)
        if refresh_b:
            consistent_matrix_into(self.Bc, B, self.bc_cache)
        for p, (A_loc, a_fill, B_loc, b_fill, dst) in self.parts.items():
            for bi, idx in a_fill.items():
                A_loc.data[idx] = _canon_data(A.blocks[p][_BLOCK_ORDER[bi]])
            for bi, idx in b_fill.items():
                B_loc.data[idx] = _canon_data(self.Bc.blocks[p][_BLOCK_ORDER[bi]])
            Cm = A_loc @ B_loc
            Cm.sum_duplicates()
            Cm.sort_indices()
            for name, cpos, dpos in dst:
                d = C.blocks[p][name].data
                d[:] = 0
                d[dpos] = Cm.data[cpos]
        C.invalidate_device()


def spmm(A: PSparseMatrix, B: PSparseMatrix, reuse: bool = False):
    """C = A @ B (parity: spmm, src/p_sparse_matrix.jl:2227-2261; with
    ``reuse=True`` returns ``(C, cache)`` for :func:`spmm_into`).

    Distributed algorithm: ``consistent(B)`` fetches the B-rows matching
    A's ghost columns (the reference's :2246), then each part multiplies
    its local [oo|oh] row block of A by the local
    [[oo,oh],[ho,hh]] block of the fetched B — A's local column space and
    Bc's local row space are aligned by construction.  Peak memory is
    O(local nnz) per part."""
    assert A.assembled and B.assembled
    local_only = _is_local_only(A) or _is_local_only(B)
    if _is_local_only(A) != _is_local_only(B):
        raise ValueError("spmm: mixed per-process and replicated operands")
    from .parallel.p_range import matching_own_indices

    rows_co = PRange(
        [
            lb.replace_ghost(lc.ghost_to_global, lc.ghost_to_owner)
            for lb, lc in zip(B.row_prange.partition(), A.col_prange.partition())
        ]
    )
    for lb, lc in zip(B.row_prange.partition(), A.col_prange.partition()):
        if not matching_own_indices(lb, lc):
            raise ValueError("spmm: A's column owners must match B's row owners")
    if reuse:
        Bc, bc_cache = consistent_matrix(B, rows_co, reuse=True).wait()
        cache = _SpmmCache(Bc, bc_cache)
    else:
        Bc = consistent_matrix(B, rows_co).wait()
        cache = None
    dtype = np.result_type(A.dtype, B.dtype)
    P = A.row_prange.n_parts
    data = _data_parts(A)
    a_rows = A.row_prange.partition()
    bc_rows = Bc.row_prange.partition()
    bc_cols = Bc.col_prange.partition()
    blocks: dict = {}
    built_cols: dict = {}
    for p in data:
        ba, bb = A.blocks[p], Bc.blocks[p]
        li_ra, li_rb, li_cb = a_rows[p], bc_rows[p], bc_cols[p]
        if reuse:
            A_loc, _, a_fill = _hstack_with_tags(ba, p, want_tags=False)
            top, _, top_fill = _hstack_with_tags(
                bb, p, ("oo", "oh"), want_tags=False
            )
            if li_rb.n_ghost:
                bot, _, bot_fill = _hstack_with_tags(
                    bb, p, ("ho", "hh"), want_tags=False
                )
                B_loc = sp.vstack([top, bot], format="csr")
                b_fill = dict(top_fill)
                for bi, idx in bot_fill.items():
                    b_fill[bi] = idx + top.nnz
            else:
                B_loc = top
                b_fill = top_fill
        else:
            A_loc = _hstack_local(ba)  # own rows x [own|ghost] cols of A
            top = _hstack_local(bb, ("oo", "oh"))
            if li_rb.n_ghost:
                bot = _hstack_local(bb, ("ho", "hh"))
                B_loc = sp.vstack([top, bot], format="csr")
            else:
                B_loc = top
        C_csr = A_loc @ B_loc
        if reuse:
            C_csr.sum_duplicates()
            C_csr.sort_indices()
        C_loc = C_csr.tocoo()
        col_g = np.concatenate([li_cb.own_to_global, li_cb.ghost_to_global])
        I = li_ra.own_to_global[C_loc.row]
        J = col_g[C_loc.col]
        b2, _, li_c2, info = _build_part_blocks(
            li_ra.remove_ghost(),
            li_cb.remove_ghost(),
            I,
            J,
            C_loc.data.astype(dtype, copy=False),
            False,
            dtype,
        )
        blocks[p] = b2
        built_cols[p] = li_c2
        if reuse:
            dst_block, dst_pos = _dst_maps(b2, info)
            dst = []
            for bi, name in enumerate(_BLOCK_ORDER[:2]):
                sel = np.flatnonzero((dst_block == bi) & (dst_pos >= 0))
                if sel.size:
                    dst.append((name, sel, dst_pos[sel]))
            cache.parts[p] = (A_loc, a_fill, B_loc, b_fill, dst)
    col_base = [li.remove_ghost() for li in bc_cols]
    new_cols = _sync_ghosted_partition(A.backend, P, col_base, built_cols)
    new_rows = [li.remove_ghost() for li in a_rows]
    all_blocks = [
        blocks[p]
        if p in blocks
        else _placeholder_blocks(new_rows[p], new_cols[p], dtype)
        for p in range(P)
    ]
    out = PSparseMatrix(
        all_blocks, PRange(new_rows), PRange(new_cols), A.backend, True
    )
    if local_only:
        out._local_only = True
    if reuse:
        return out, cache
    return out


def spmm_into(
    C: PSparseMatrix,
    A: PSparseMatrix,
    B: PSparseMatrix,
    cache: _SpmmCache,
    refresh_b: bool = True,
) -> None:
    """Values-only C = A @ B at fixed sparsity (parity: spmm!,
    src/p_sparse_matrix.jl:2248-2261).  ``refresh_b=False`` skips the
    consistent-copy refresh of B — valid ONLY when B's values are frozen
    since the last refill (e.g. the tentative prolongator P0)."""
    cache.refill(C, A, B, refresh_b=refresh_b)


class _SpmtmCache:
    """Frozen plan for values-only C = A^T @ B at fixed sparsity (parity:
    spmtm!, src/p_sparse_matrix.jl:2286-2296): local operands refresh
    through fill maps, the transpose through a cached CSR->CSC position
    permutation, and the canonical local products refill the output
    through the psparse reuse cache (the owner shuffle is frozen)."""

    def __init__(self):
        self.parts: dict = {}
        self.pcache = None
        self.routes = None  # per-process mode: a _MatRoutes plan instead

    def refill(self, C: PSparseMatrix, A: PSparseMatrix, B: PSparseMatrix):
        _canonicalize_blocks(A)
        _canonicalize_blocks(B)
        P = C.row_prange.n_parts
        vals = {p: None for p in range(P)}
        for p, (A_loc, a_fill, AT, tpos, B_loc, b_fill) in self.parts.items():
            for bi, idx in a_fill.items():
                A_loc.data[idx] = _canon_data(A.blocks[p][_BLOCK_ORDER[bi]])
            for bi, idx in b_fill.items():
                B_loc.data[idx] = _canon_data(B.blocks[p][_BLOCK_ORDER[bi]])
            AT.data[tpos] = A_loc.data
            Cm = AT @ B_loc
            Cm.sum_duplicates()
            Cm.sort_indices()
            vals[p] = Cm.data
        if self.routes is not None:
            # per-process: route the recomputed product values through the
            # frozen plan (cross-process values ride ONE exchange)
            self.routes.refill(
                None, C, data_of=lambda p, name: vals[p]
            )
            return
        V_parts = [
            vals[p] if vals[p] is not None else np.zeros(0, dtype=C.dtype)
            for p in range(P)
        ]
        psparse_refill(C, V_parts, self.pcache)


def spmtm(A: PSparseMatrix, B: PSparseMatrix, reuse: bool = False):
    """C = A.T @ B (parity: spmtm, src/p_sparse_matrix.jl:2263-2296; with
    ``reuse=True`` returns ``(C, cache)`` for :func:`spmtm_into`).

    Distributed: each part computes its local contribution
    [oo|oh]_A^T @ [oo|oh]_B (a subassembled result on A's column
    partition, the reference's :2263-2296), then the disassembled-COO
    constructor shuffles the ghost-row contributions to their owners."""
    assert A.assembled and B.assembled
    local_only = _is_local_only(A) or _is_local_only(B)
    if _is_local_only(A) != _is_local_only(B):
        raise ValueError("spmtm: mixed per-process and replicated operands")
    if A.row_prange.n_global != B.row_prange.n_global:
        raise ValueError("spmtm: A and B must share the row partition")
    dtype = np.result_type(A.dtype, B.dtype)
    a_cols = A.col_prange.partition()
    b_cols = B.col_prange.partition()
    cache = _SpmtmCache() if reuse else None
    tri: dict = {}
    for p in _data_parts(A):
        ba, bb = A.blocks[p], B.blocks[p]
        li_ca, li_cb = a_cols[p], b_cols[p]
        if reuse:
            A_loc, _, a_fill = _hstack_with_tags(ba, p, want_tags=False)
            B_loc, _, b_fill = _hstack_with_tags(bb, p, want_tags=False)
            AT = A_loc.T.tocsr()
            AT.sort_indices()
            acoo = A_loc.tocoo()
            tpos = precompute_nzindex(AT, acoo.col, acoo.row)
            C_csr = AT @ B_loc
            C_csr.sum_duplicates()
            C_csr.sort_indices()
            cache.parts[p] = (A_loc, a_fill, AT, tpos, B_loc, b_fill)
        else:
            A_loc = _hstack_local(ba)
            B_loc = _hstack_local(bb)
            C_csr = A_loc.T.tocsr() @ B_loc
        C_loc = C_csr.tocoo()
        rg = np.concatenate([li_ca.own_to_global, li_ca.ghost_to_global])
        cg = np.concatenate([li_cb.own_to_global, li_cb.ghost_to_global])
        tri[p] = (
            rg[C_loc.row],
            cg[C_loc.col],
            C_loc.data.astype(dtype, copy=False),
        )
    rows = PRange([li.remove_ghost() for li in a_cols])
    cols = PRange([li.remove_ghost() for li in b_cols])
    if reuse:
        P = rows.n_parts
        if local_only:
            # per-process: the owner shuffle itself carries position tags
            # and freezes into a _MatRoutes plan
            tags = [
                _tag_base(p, 0) | np.arange(tri[p][2].size, dtype=np.int64)
                if p in tri
                else None
                for p in range(P)
            ]
            C, routes = psparse_local(
                [tri[p][0] if p in tri else None for p in range(P)],
                [tri[p][1] if p in tri else None for p in range(P)],
                [tri[p][2] if p in tri else None for p in range(P)],
                rows, cols, A.backend, dtype=dtype, tags=tags,
            )
            cache.routes = routes
            return C, cache
        C, pcache = psparse(
            [tri[p][0] if p in tri else np.zeros(0, dtype=INT) for p in range(P)],
            [tri[p][1] if p in tri else np.zeros(0, dtype=INT) for p in range(P)],
            [tri[p][2] if p in tri else np.zeros(0, dtype=dtype) for p in range(P)],
            rows, cols, A.backend,
            assembled=False, assemble=True, dtype=dtype, reuse=True,
        )
        cache.pcache = pcache
        return C, cache
    return _psparse_auto(tri, rows, cols, A.backend, dtype, local_only)


def spmtm_into(
    C: PSparseMatrix, A: PSparseMatrix, B: PSparseMatrix, cache: _SpmtmCache
) -> None:
    """Values-only C = A^T @ B at fixed sparsity (parity: spmtm!,
    src/p_sparse_matrix.jl:2286-2296)."""
    cache.refill(C, A, B)


def rap(
    R: PSparseMatrix, A: PSparseMatrix, Pm: PSparseMatrix, reuse: bool = False
):
    """Galerkin triple product R @ A @ P (parity: rap,
    src/p_sparse_matrix.jl:2212-2225) — two distributed spmm calls.  With
    ``reuse=True`` returns ``(Ac, cache)`` for :func:`rap_into` (parity:
    rap!, :2212-2225)."""
    if not reuse:
        return spmm(R, spmm(A, Pm))
    AP, c1 = spmm(A, Pm, reuse=True)
    Ac, c2 = spmm(R, AP, reuse=True)
    return Ac, (AP, c1, c2)


def rap_into(Ac: PSparseMatrix, R, A, Pm, cache) -> None:
    """Values-only Galerkin product at fixed sparsity (parity: rap!,
    src/p_sparse_matrix.jl:2212-2225)."""
    AP, c1, c2 = cache
    spmm_into(AP, A, Pm, c1)
    spmm_into(Ac, R, AP, c2)


def transpose_psparse(A: PSparseMatrix) -> PSparseMatrix:
    """A^T, distributed: each part emits its [oo|oh] triplets with row/col
    swapped (contributions to rows owned by the column owners) and the
    disassembled-COO constructor shuffles them home."""
    assert A.assembled
    local_only = _is_local_only(A)
    row_parts = A.row_prange.partition()
    col_parts = A.col_prange.partition()
    tri: dict = {}
    for p in _data_parts(A):
        I, J, V = _part_triplets(A.blocks[p], row_parts[p], col_parts[p])
        tri[p] = (J, I, V)
    rows = PRange([li.remove_ghost() for li in col_parts])
    cols = PRange([li.remove_ghost() for li in row_parts])
    return _psparse_auto(tri, rows, cols, A.backend, A.dtype, local_only)


def identity_minus(A: PSparseMatrix) -> PSparseMatrix:
    """I - A (parity: src/p_sparse_matrix.jl:2309-2315).  Purely blockwise:
    the identity lands in own_own where global row == global col."""
    assert A.assembled
    local_only = _is_local_only(A)
    row_parts = A.row_prange.partition()
    col_parts = A.col_prange.partition()
    data = set(_data_parts(A))
    blocks = []
    for p in range(A.row_prange.n_parts):
        b, li_r, li_c = A.blocks[p], row_parts[p], col_parts[p]
        if p not in data:
            blocks.append(_placeholder_blocks(li_r, li_c, A.dtype))
            continue
        jco = li_c.global_to_own(li_r.own_to_global)
        rows = np.flatnonzero(jco >= 0)
        D = sp.csr_matrix(
            (np.ones(rows.size, dtype=A.dtype), (rows, jco[rows])),
            shape=b["oo"].shape,
        )
        blocks.append({"oo": (D - b["oo"]).tocsr(), "oh": (-b["oh"]).tocsr()})
    out = PSparseMatrix(blocks, A.row_prange, A.col_prange, A.backend, True)
    if local_only:
        out._local_only = True
    return out


def repartition_matrix(
    A: PSparseMatrix, new_rows, new_cols, backend: Optional[Backend] = None
) -> PSparseMatrix:
    """Parity: repartition (src/p_sparse_matrix.jl:2371-2461).  Distributed:
    per-part triplets are shuffled to their new row owners by the
    disassembled-COO constructor (the cross-process shuffle on a
    per-process matrix)."""
    local_only = _is_local_only(A)
    row_parts = A.row_prange.partition()
    col_parts = A.col_prange.partition()
    names = ("oo", "oh") if A.assembled else ("oo", "oh", "ho", "hh")
    tri: dict = {}
    for p in _data_parts(A):
        tri[p] = _part_triplets(A.blocks[p], row_parts[p], col_parts[p], names)
    return _psparse_auto(
        tri, as_prange(new_rows), as_prange(new_cols),
        backend or A.backend, A.dtype, local_only,
    )


def psparse_local(
    I_parts: Sequence[Optional[np.ndarray]],
    J_parts: Sequence[Optional[np.ndarray]],
    V_parts: Sequence[Optional[np.ndarray]],
    rows,
    cols,
    backend: Backend,
    dtype=None,
    tags: Optional[Sequence[Optional[np.ndarray]]] = None,
) -> PSparseMatrix:
    """PER-PROCESS disassembled COO constructor (multihost generic path;
    parity: the reference's per-rank construction, src/mpi_array.jl:42-53 +
    assemble_coo!, src/p_sparse_matrix.jl:213-289).

    Each process supplies triplets ONLY for ``backend.local_parts()``
    (other entries None).  Only OFF-OWNER triplets whose owner part lives
    on another process ride the wire — through edge-colored ppermute
    rounds padded per round (parallel/host_exchange.py), so the wire cost
    is O(exchanged halo) and peak per-process triplet memory is
    O(local nnz); self-owned and process-local segments never leave the
    host.  Partition METADATA (ghost id lists, O(surface)) is then
    allgathered so every process holds identical PRanges and exchange
    plans; non-local parts keep empty placeholder blocks and the device
    freeze materializes only local shards through MeshBackend.shard's
    lazy providers.

    Result is an assembled PSparseMatrix with ``_local_only=True`` —
    host setup ops without a per-process implementation raise loudly
    (see ``_require_full_blocks``).  The wire-cost stats of the shuffle
    are left in ``backend._last_local_build_stats`` for tests.

    ``tags``: optional per-part int64 source tags riding the shuffle —
    the reuse tier's construction-time recording; when given, returns
    ``(A, routes)`` with the frozen cross-process value-routing plan."""
    from .parallel.host_exchange import (
        allgather_part_arrays,
        exchange_part_messages,
    )

    rows_pr = as_prange(rows)
    cols_pr = as_prange(cols)
    P = rows_pr.n_parts
    local = list(backend.local_parts())
    if dtype is None:
        dtype = np.asarray(V_parts[local[0]]).dtype
    row_parts = rows_pr.partition()

    # -- 1. bucket local triplets by owner part; keep owner-local
    #    segments out of the exchange entirely ---------------------------
    local_set = set(local)
    kept: dict = {}
    msgs: dict = {}
    for p in local:
        I = np.asarray(I_parts[p], dtype=INT)
        J = np.asarray(J_parts[p], dtype=INT)
        V = np.asarray(V_parts[p], dtype=dtype)
        T = (
            np.asarray(tags[p], dtype=np.int64) if tags is not None else None
        )
        full = [np.zeros(0, dtype=INT)] * P
        full[p] = I
        o = np.asarray(find_owner(row_parts, full)[p], dtype=INT)
        ordr = np.argsort(o, kind="stable")
        so = o[ordr]
        Is, Js, Vs = I[ordr], J[ordr], V[ordr]
        Ts = T[ordr] if T is not None else None
        bounds = np.searchsorted(so, np.arange(P + 1))
        for d in range(P):
            lo, hi = bounds[d], bounds[d + 1]
            if hi <= lo:
                continue
            seg = (Is[lo:hi], Js[lo:hi], Vs[lo:hi])
            if Ts is not None:
                seg = seg + (Ts[lo:hi],)
            if d in local_set:
                kept.setdefault(d, []).append(seg)
            else:
                msgs[(p, d)] = seg
    stats: dict = {}
    wire_dtypes = (INT, INT, dtype) + ((np.int64,) if tags is not None else ())
    rcv = exchange_part_messages(
        backend, P, msgs, wire_dtypes, stats=stats
    )
    backend._last_local_build_stats = stats

    # -- 2. build local blocks -------------------------------------------
    routes = _MatRoutes() if tags is not None else None
    blocks_local, ghost_meta = {}, {}
    z = np.zeros(0, dtype=INT)
    for p in local:
        chunks = kept.get(p, []) + [
            rcv[k] for k in sorted(rcv) if k[1] == p
        ]
        I = np.concatenate([c[0] for c in chunks]) if chunks else z
        J = np.concatenate([c[1] for c in chunks]) if chunks else z
        V = (
            np.concatenate([c[2] for c in chunks])
            if chunks
            else np.zeros(0, dtype=dtype)
        )
        blocks, li_r2, li_c2, info = _build_part_blocks(
            row_parts[p], cols_pr[p], I.astype(INT), J.astype(INT),
            V.astype(dtype), False, dtype
        )
        blocks_local[p] = blocks
        ghost_meta[p] = (li_c2.ghost_to_global, li_c2.ghost_to_owner)
        if routes is not None:
            T_cat = (
                np.concatenate([c[3] for c in chunks])
                if chunks
                else np.zeros(0, dtype=np.int64)
            )
            routes.add(p, T_cat, *_dst_maps(blocks, info))

    # -- 3. sync column-ghost metadata (O(surface)) ----------------------
    gids = allgather_part_arrays(
        backend, P, {p: g for p, (g, _) in ghost_meta.items()}, INT,
        stats=stats,
    )
    gown = allgather_part_arrays(
        backend, P, {p: o for p, (_, o) in ghost_meta.items()}, INT,
        stats=stats,
    )

    new_cols, all_blocks = [], []
    for p in range(P):
        g, o = gids[p], gown[p]
        li_c2 = (
            cols_pr[p].union_ghost(*_sorted_ghosts(g, o))
            if g.size
            else cols_pr[p]
        )
        if p in blocks_local:
            # local parts rebuilt identically (union_ghost is deterministic)
            all_blocks.append(blocks_local[p])
        else:
            n_own = row_parts[p].n_own
            all_blocks.append(
                {
                    "oo": sp.csr_matrix((n_own, li_c2.n_own), dtype=dtype),
                    "oh": sp.csr_matrix((n_own, li_c2.n_ghost), dtype=dtype),
                }
            )
        new_cols.append(li_c2)

    A = PSparseMatrix(
        all_blocks, rows_pr, PRange(new_cols), backend, assembled=True
    )
    A._local_only = True
    # freeze eagerly: the lazy-provider shard protocol
    # (make_array_from_callback) cannot run under a jit trace, and setup
    # is the natural place for the one-time local materialization anyway
    A.device()
    if routes is not None:
        routes.finalize()
        routes.finalize_multiprocess(backend, P, dtype)
        return A, routes
    return A


def _agree_max_i32(backend, arr: np.ndarray) -> np.ndarray:
    """Elementwise max of a small int array across processes (identity in
    a single process).  int32 wire — fine for dims/offsets metadata."""
    if not getattr(backend, "is_multiprocess", False):
        return np.asarray(arr, dtype=np.int64)
    import jax.experimental.multihost_utils as mhu

    return np.asarray(
        mhu.process_allgather(np.asarray(arr, dtype=np.int32))
    ).max(0).astype(np.int64)


def _agreed_dia_offsets(A: PSparseMatrix, local) -> Optional[tuple]:
    """Cross-process-agreed DIA offset set for the own_own block of a
    per-process matrix (round-3 VERDICT missing #4): the union of each
    process's local offsets, allgathered — identical on every process —
    with the same viability guards freeze_block applies.  None when the
    block is not band-limited."""
    from .ops.dia import dia_viable

    max_diags = 128
    offs = dia_viable([A.blocks[p]["oo"] for p in local], max_diags=max_diags)
    kmax = 0
    for p in local:
        b = A.blocks[p]["oo"].tocsr()
        if b.nnz:
            kmax = max(kmax, int(np.diff(b.indptr).max()))
    # wire: [viable, n_offs, kmax, offs(+shift)...] — offsets are local
    # column deltas, |off| < n_own, so an int32 wire is safe
    buf = np.zeros(3 + max_diags, np.int64)
    if offs is not None:
        buf[0] = 1
        buf[1] = offs.size
        buf[2] = kmax
        shift = int(A.col_layout().n_own_pad) + 1
        buf[3 : 3 + offs.size] = offs + shift  # make non-negative... see below
    if not getattr(A.backend, "is_multiprocess", False):
        merged_ok = offs is not None
        union = offs if offs is not None else None
        kmax_g = kmax
    else:
        import jax.experimental.multihost_utils as mhu

        shift = int(A.col_layout().n_own_pad) + 1
        rows = np.asarray(
            mhu.process_allgather(np.asarray(buf, dtype=np.int32))
        ).astype(np.int64)
        if rows.ndim == 1:
            rows = rows[None]
        merged_ok = bool((rows[:, 0] > 0).all())
        if merged_ok:
            offsets = set()
            for r in rows:
                offsets.update((r[3 : 3 + int(r[1])] - shift).tolist())
            union = np.array(sorted(offsets), dtype=np.int64)
            merged_ok = union.size <= max_diags
        else:
            union = None
        kmax_g = int(rows[:, 2].max())
    if not merged_ok or union is None or union.size == 0:
        return None
    # storage guard (same as freeze_block): dense diagonals must not cost
    # more than the ELL footprint
    if union.size > max(2 * kmax_g, 4):
        return None
    return tuple(int(o) for o in union)


def _freeze_local_ell(A: PSparseMatrix) -> "DeviceSpMat":
    """Device freeze for a ``_local_only`` matrix: padded dims (and the
    DIA offset set, when the own_own block is banded) are agreed across
    processes by allgather, then each process materializes ONLY its
    shards through the lazy provider protocol of MeshBackend.shard."""
    from .ops.ell import OOB, csr_to_ell

    rlay = A.row_layout()
    clay = A.col_layout()
    P = rlay.n_parts
    local = set(A.backend.local_parts())
    dims = np.zeros((2,), np.int64)
    for p in local:
        for k, name in enumerate(("oo", "oh")):
            b = A.blocks[p][name]
            nnz_row = np.diff(b.tocsr().indptr)
            if nnz_row.size:
                dims[k] = max(dims[k], int(nnz_row.max()))
    dims = _agree_max_i32(A.backend, dims)

    # agreed-DIA fast path for the own_own block (stencil-band operators
    # keep the streamed DIA kernels + colored-DIA GS on every process)
    dia_offs = _agreed_dia_offsets(A, local)
    if dia_offs is not None:
        from .ops.blocks import make_dia_block
        from .ops.dia import stack_dia

        offs_arr = np.array(dia_offs, dtype=np.int64)
        no = rlay.n_own_pad

        def lazy_dia():
            def thunk():
                def provider(idx):
                    p = idx[0].start if idx[0].start is not None else 0
                    if p in local:
                        return stack_dia([A.blocks[p]["oo"]], no, offs_arr)
                    return np.zeros(
                        (1, max(len(dia_offs), 1), no), np.dtype(A.dtype)
                    )

                return (
                    (P, max(len(dia_offs), 1), no),
                    np.dtype(A.dtype),
                    provider,
                )

            return thunk

        vals_dev = A.backend.shard(lazy_dia())
        oo = make_dia_block(dia_offs, clay.n_own_pad, vals_dev)
        oh = _lazy_ell_block(A, "oh", int(dims[1]), no, max(clay.n_ghost_pad, 1))
        return DeviceSpMat(oo, oh)

    no = rlay.n_own_pad
    slot, slot_meta = _freeze_local_slot(A, rlay, clay)
    oo = _lazy_ell_block(
        A, "oo", int(dims[0]), no, clay.n_own_pad,
        slot=slot, slot_meta=slot_meta,
    )
    oh = _lazy_ell_block(A, "oh", int(dims[1]), no, max(clay.n_ghost_pad, 1))
    return DeviceSpMat(oo, oh)


def _lazy_ell_block(
    A: PSparseMatrix,
    name: str,
    K: int,
    n_rows_pad: int,
    n_cols_pad: int,
    transpose: bool = False,
    slot=None,
    slot_meta=None,
) -> DeviceBlock:
    """ELL DeviceBlock whose [P, rows, K] arrays are materialized ONLY for
    this process's parts (lazy provider protocol of MeshBackend.shard).
    ``K`` must already be cross-process agreed."""
    from .ops.ell import OOB, csr_to_ell

    P = A.row_prange.n_parts
    local = set(A.backend.local_parts())

    def lazy(arr_kind):
        def thunk():
            def provider(idx):
                p = idx[0].start if idx[0].start is not None else 0
                if p in local:
                    blk = A.blocks[p][name]
                    if transpose:
                        blk = blk.T.tocsr()
                    c, v = csr_to_ell(blk, n_rows_pad, K)
                else:  # never requested, but keep it total
                    c = np.full((n_rows_pad, max(K, 1)), OOB, np.int32)
                    v = np.zeros((n_rows_pad, max(K, 1)), A.dtype)
                return (c if arr_kind == 0 else v)[None]

            shape = (P, n_rows_pad, max(K, 1))
            return shape, (np.int32 if arr_kind == 0 else np.dtype(A.dtype)), provider

        return thunk

    shard = A.backend.shard
    return DeviceBlock(
        "ell", None, n_cols_pad, shard(lazy(0)), shard(lazy(1)),
        slot=slot, slot_meta=slot_meta,
    )


def _freeze_local_transpose(A: PSparseMatrix):
    """(own_own^T, own_ghost^T) freeze for a per-process matrix: padded
    ELL dims agreed by allgather-max; only local shards materialized.
    Powers spmtv (AMG restriction) on ``psparse_local``-built operators."""
    rlay = A.row_layout()
    clay = A.col_layout()
    local = set(A.backend.local_parts())
    dims = np.zeros((2,), np.int64)
    for p in local:
        for k, name in enumerate(("oo", "oh")):
            t = A.blocks[p][name].T.tocsr()
            nnz_row = np.diff(t.indptr)
            if nnz_row.size:
                dims[k] = max(dims[k], int(nnz_row.max()))
    dims = _agree_max_i32(A.backend, dims)
    ooT = _lazy_ell_block(
        A, "oo", int(dims[0]), clay.n_own_pad, rlay.n_own_pad, transpose=True
    )
    ohT = _lazy_ell_block(
        A, "oh", int(dims[1]), max(clay.n_ghost_pad, 1), rlay.n_own_pad,
        transpose=True,
    )
    return (ooT, ohT)


def _freeze_local_slot(A: PSparseMatrix, rlay, clay):
    """Cross-process-AGREED slot freeze for the local-only own_own block:
    every process allgather-maxes the per-rt dim table, deterministically
    selects the same (rt, Q, S, s_total), plans its LOCAL parts with the
    forced dims and materializes only its shards lazily.  Returns
    (None, None) when the agreed layout is not viable (callers keep the
    padded-ELL gather)."""
    import jax.experimental.multihost_utils as mhu

    from .ops.slot_spmv import (
        _MAX_Q,
        _MAX_SLOT_BYTES,
        _MAX_WINDOW_ROWS,
        _MAX_X2D_VMEM,
        build_slot_plan,
        plan_dim_table,
    )

    def _ru(x, m):
        return ((x + m - 1) // m) * m if x > 0 else 0

    P = rlay.n_parts
    blocks = [b["oo"] for b in A.blocks]
    tbl = plan_dim_table(blocks, rlay.n_own_pad)
    tbl = np.asarray(mhu.process_allgather(tbl)).max(0)
    best = None
    for k, rt in enumerate((128, 64, 32, 16, 8)):
        Q = max(int(tbl[k, 0]), 1)
        S = max(int(tbl[k, 1]), 8)
        mb = int(tbl[k, 2])
        if S > _MAX_WINDOW_ROWS or Q > _MAX_Q:
            continue
        n_tiles = _ru(max(_ru(rlay.n_own_pad, rt) // rt, 1), 8)
        cost = P * n_tiles * Q * 128 * 8
        if cost > _MAX_SLOT_BYTES:
            continue
        s_total = _ru(max(_ru(clay.n_own_pad, 128) // 128, mb + S, 8), 8)
        if s_total * 512 > _MAX_X2D_VMEM:
            continue
        if best is None or cost < best[0]:
            best = (cost, rt, Q, S, s_total)
    if best is None:
        return None, None
    _, rt, Q, S, s_total = best
    plan = build_slot_plan(
        blocks, rlay.n_own_pad, clay.n_own_pad,
        force_rt=rt, force_dims=(Q, S, s_total),
    )
    if plan is None or plan.meta != plan.meta._replace(
        n_slot_rows=Q, window=S, s_total=s_total
    ):
        return None, None

    local = set(A.backend.local_parts())
    meta = plan.meta

    def lazy(arr, dtype):
        def thunk():
            def provider(idx):
                p = idx[0].start if idx[0].start is not None else 0
                return np.asarray(arr[p], dtype=dtype)[None]

            return (P,) + arr.shape[1:], np.dtype(dtype), provider

        return thunk

    def lazy_onehot():
        def thunk():
            def provider(idx):
                p = idx[0].start if idx[0].start is not None else 0
                oh = (
                    plan.srow[p][..., None] == np.arange(S, dtype=np.int32)
                ).astype(A.dtype)
                return oh[None]

            return (P, meta.n_tiles, Q, S), np.dtype(A.dtype), provider

        return thunk

    shard = A.backend.shard
    slot = (
        shard(lazy(plan.idx, np.int8)),
        shard(lazy(plan.vals, A.dtype)),
        shard(lazy(plan.srow, np.int32)),
        shard(lazy_onehot()),
        shard(lazy(plan.base, np.int32)),
    )
    return slot, meta


def repartition_system(
    A: PSparseMatrix,
    b: Optional["PVector"] = None,
    new_rows=None,
    new_cols=None,
    backend: Optional[Backend] = None,
):
    """Joint matrix(+vector) repartition (parity: the two-argument
    repartition form, src/p_sparse_matrix.jl:2371-2461): returns the
    matrix — and, when ``b`` is given, the rhs moved onto the SAME new
    row partition — as ``A2`` or ``(A2, b2)``."""
    from .pvector import repartition as repartition_vector

    new_rows = as_prange(new_rows if new_rows is not None else A.row_prange)
    new_cols = as_prange(new_cols if new_cols is not None else new_rows)
    A2 = repartition_matrix(A, new_rows, new_cols, backend)
    if b is None:
        return A2
    b2 = repartition_vector(b, A2.row_prange, backend or A.backend)
    return A2, b2


def split_format(A: PSparseMatrix) -> PSparseMatrix:
    """Parity: split_format (src/p_sparse_matrix.jl:1097-1114) — storage
    here is always split; returns A."""
    return A


def split_matrix_blocks(A: PSparseMatrix):
    """(own_own, own_ghost, ghost_own, ghost_ghost) per-part host blocks
    (parity: split_matrix_blocks, src/p_sparse_matrix.jl:582-668)."""
    return (
        A.own_own_values(),
        A.own_ghost_values(),
        A.ghost_own_values(),
        A.ghost_ghost_values(),
    )


split_matrix = split_format  # parity alias


def renumber_matrix(A: PSparseMatrix) -> PSparseMatrix:
    """Same matrix on the renumbered (contiguous-own) partitions
    (parity: renumber, src/p_sparse_matrix.jl:2595-2622).

    ``renumber_partition`` preserves the own and ghost orders within every
    part, so the split blocks carry over UNCHANGED — only the global
    labels in the partitions are rewritten (no data movement at all)."""
    from .parallel.p_range import renumber_partition

    new_rows = PRange(renumber_partition(A.row_prange.partition()))
    new_cols = PRange(renumber_partition(A.col_prange.partition()))
    blocks = [dict(b) for b in A.blocks]
    return PSparseMatrix(blocks, new_rows, new_cols, A.backend, A.assembled)


def psystem(
    I_parts, J_parts, V_parts, Ib_parts, Vb_parts, rows, cols,
    backend: Backend, reuse: bool = False,
):
    """Matrix + rhs together (parity: psystem, src/p_sparse_matrix.jl:2475).
    Returns (A, b) with b partitioned by A's rows; with ``reuse=True``
    returns ``(A, b, cache)`` for :func:`psystem_refill` (parity: the
    psystem ``reuse`` kwarg + psystem!, :2475-2539)."""
    from .pvector import pvector

    if reuse:
        A, mcache = psparse(
            I_parts, J_parts, V_parts, rows, cols, backend, reuse=True
        )
        b, vcache = pvector(Ib_parts, Vb_parts, A.row_prange, backend, reuse=True)
        return A, b, (mcache, vcache)
    A = psparse(I_parts, J_parts, V_parts, rows, cols, backend)
    b = pvector(Ib_parts, Vb_parts, A.row_prange, backend)
    return A, b


def psystem_refill(A: PSparseMatrix, V_parts, Vb_parts, cache):
    """Joint matrix+rhs refill at fixed sparsity (parity: psystem!,
    src/p_sparse_matrix.jl:2475-2539): the matrix refills IN PLACE through
    its psparse cache; the returned rhs is rebuilt through the frozen
    vector assembly plan.  Neither redoes find_owner or ghost discovery."""
    from .pvector import pvector_refill

    mcache, vcache = cache
    psparse_refill(A, V_parts, mcache)
    b = pvector_refill(Vb_parts, vcache)
    return b


# ---------------------------------------------------------------------------
# df64 (official-precision two-float) SpMV — see ops/df64.py
# ---------------------------------------------------------------------------

def device_df64(A: PSparseMatrix):
    """Freeze (hi, lo) f32 DeviceSpMat pair from the f64 host blocks of
    ``A`` (assembled only).  This is the matrix storage of the
    official-precision HPCG configuration: TPU v5e has no f64 unit and
    XLA's x64 software emulation is non-viable for these kernels (a 32^3
    GS sweep never completes), so f64-equivalent precision runs as
    double-float arithmetic (capability parity with the reference's
    Float64-everywhere storage, /root/reference/HPCG/src/sparse_matrix.jl:
    115-118)."""
    from .ops.blocks import freeze_block_pair

    if A._device_df is None:
        assert A.assembled, "device_df64: assemble the matrix first"
        assert np.dtype(A.dtype) == np.float64, (
            "device_df64 expects f64 host blocks (build with dtype=np.float64)"
        )
        rlay = A.row_layout()
        clay = A.col_layout()
        no = rlay.n_own_pad
        ngc = max(clay.n_ghost_pad, 1)
        ooh, ool = freeze_block_pair([b["oo"] for b in A.blocks], no, clay.n_own_pad)
        ohh, ohl = freeze_block_pair([b["oh"] for b in A.blocks], no, ngc)
        A._device_df = A.backend.shard(
            (DeviceSpMat(ooh, ohh), DeviceSpMat(ool, ohl))
        )
    return A._device_df


def spmv_df64(A: PSparseMatrix, x_pair) -> Tuple["PVector", "PVector"]:
    """y = A @ x with matrix and vector in df64 (x_pair: (PVector, PVector)
    hi/lo on ``A.col_prange``).  Ghost exchange runs once per component;
    everything else is the compensated two-float pipeline (exact products,
    error-free accumulations) — the result matches the f64 SpMV to
    ~1e-13 relative (tests/test_df64.py)."""
    from .ops.blocks import block_spmv_df
    from .ops import df64 as df

    xh, xl = x_pair
    devh, devl = device_df64(A)
    clay = xh.layout
    rlay = A.row_layout()
    backend = A.backend
    has_cg = clay.n_ghost_pad > 0 and clay.consistent_plan.n_rounds > 0

    if has_cg:
        def make_f():
            def f(xoh, xol, xgh, xgl, cplan, dh, dl):
                gh = cplan.apply(xoh, xgh, "set")
                gl = cplan.apply(xol, xgl, "set")
                y1 = block_spmv_df(dh.oo, dl.oo, (xoh, xol))
                y2 = block_spmv_df(dh.oh, dl.oh, (gh, gl))
                return df.add(y1, y2)

            return f

        yh, yl = backend.spmd_cached(("spmv_df_cg",), make_f)(
            xh.own, xl.own, xh.ghost, xl.ghost, clay.consistent_plan, devh, devl
        )
    else:
        def make_f():
            def f(xoh, xol, dh, dl):
                return block_spmv_df(dh.oo, dl.oo, (xoh, xol))

            return f

        yh, yl = backend.spmd_cached(("spmv_df",), make_f)(
            xh.own, xl.own, devh, devl
        )
    zg = jnp.zeros((rlay.n_parts, rlay.n_ghost_pad), dtype=yh.dtype)
    return (
        PVector(yh, zg, rlay, backend),
        PVector(yl, zg, rlay, backend),
    )
