"""Speed-of-light Gauss-Seidel for DIA (banded) blocks: mod-m coloring with
a de-interleaved unknown vector.

Classic multicolor GS on a vector machine costs n_colors full SpMV-like
passes per sweep.  For a banded own_own block (diagonal offsets O) we can
do a TRUE Gauss-Seidel sweep at exactly one-SpMV cost with only contiguous
vector ops:

1. Pick the smallest m >= 2 such that no nonzero offset o in O is a
   multiple of m.  Then color(i) = i mod m is a valid coloring (no two
   coupled rows share a color).
2. De-interleave x into xd[m, L] with xd[s, i'] = x[m*i' + s].  A stride-m
   sample of a shifted sequence is a *shifted contiguous row* of xd:
   x[m*i' + c + o] = xd[(c+o) mod m, i' + (c + o - ((c+o) mod m)) / m].
3. Per color c, the GS update touches only row c of xd:
   xd[c] += (bd[c] - sum_d vals_c[d] * shift(xd[s_d], k_d) - ghost_c) / a_ii
   where vals_c is the (setup-time, contiguous) de-interleaved diagonal
   storage.  Forward sweep = colors ascending, backward = descending.

Total work per sweep = nnz multiply-adds, all contiguous slices — same
cost profile as the DIA SpMV.  Ghost-column contributions are frozen per
sweep (hybrid processor-block GS, identical to the reference semantics at
PartitionedSolvers/src/smoothers.jl:104-143).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_mod_coloring(offsets, max_m: int = 512) -> Optional[int]:
    """Smallest m >= 2 with o % m != 0 for every nonzero offset."""
    nz = [abs(int(o)) for o in offsets if o != 0]
    if not nz:
        return 2
    for m in range(2, max_m + 1):
        if all(o % m for o in nz):
            return m
    return None


class ColoredDIAGS:
    """Per-block state for the mod-m colored DIA Gauss-Seidel sweep.

    Built from the stacked DIA storage vals[P, n_off, R] of the own_own
    block; all arrays are host-prepared once and frozen.
    """

    def __init__(self, offsets: Tuple[int, ...], vals: np.ndarray, diag: np.ndarray):
        self.offsets = tuple(int(o) for o in offsets)
        m = find_mod_coloring(self.offsets)
        assert m is not None
        self.m = m
        P, n_off, R = vals.shape
        L = -(-R // m)
        Rp = m * L
        self.R = R
        self.L = L
        # max |row shift| after de-interleaving
        self.K = max(
            (abs((c + o) // m) + 1 for o in self.offsets for c in range(m)),
            default=1,
        )
        # de-interleave diagonal values: vals_d[P, m, n_off, L]
        vp = np.zeros((P, n_off, Rp), dtype=vals.dtype)
        vp[:, :, :R] = vals
        vals_d = vp.reshape(P, n_off, L, m).transpose(0, 3, 1, 2)
        self.vals_d = jnp.asarray(np.ascontiguousarray(vals_d))
        # de-interleaved inverse diagonal (zero on padding -> no-op update)
        dp = np.zeros((P, Rp), dtype=diag.dtype)
        dp[:, :R] = diag
        inv = np.where(dp != 0, 1.0 / np.where(dp != 0, dp, 1.0), 0.0)
        self.invd_d = jnp.asarray(np.ascontiguousarray(inv.reshape(P, L, m).transpose(0, 2, 1)))
        # static schedule: per color, per diagonal -> (source row, shift)
        self.schedule = []
        for c in range(m):
            terms = []
            for d, o in enumerate(self.offsets):
                j = c + o
                s = j % m
                k = (j - s) // m
                terms.append((d, s, k))
            self.schedule.append(terms)

    # -- per-part SPMD sweep ------------------------------------------
    def deinterleave(self, x: jnp.ndarray) -> jnp.ndarray:
        """x[R] (own values, padded) -> xd[m, K + L + K] (zero-edged)."""
        Rp = self.m * self.L
        xp = jnp.zeros((Rp,), x.dtype).at[: self.R].set(x[: self.R])
        xd = xp.reshape(self.L, self.m).T
        return jnp.pad(xd, ((0, 0), (self.K, self.K)))

    def interleave(self, xd: jnp.ndarray) -> jnp.ndarray:
        core = xd[:, self.K : self.K + self.L]
        return core.T.reshape(self.m * self.L)[: self.R]

    def sweep(
        self,
        xo: jnp.ndarray,
        bo: jnp.ndarray,
        ghost_contrib: jnp.ndarray,
        vals_d: jnp.ndarray,
        invd_d: jnp.ndarray,
        order,
    ) -> jnp.ndarray:
        """One GS sweep over colors in ``order`` (per-part arrays).

        ghost_contrib[R] = own_ghost @ x_ghost, frozen for the sweep.
        vals_d/invd_d are the per-part slices of the stacked tables.
        """
        K, L = self.K, self.L
        xd = self.deinterleave(xo)
        bd = self.deinterleave(bo - ghost_contrib)
        for c in order:
            ax = jnp.zeros((L,), xo.dtype)
            for (d, s, k) in self.schedule[c]:
                seg = jax.lax.slice(xd[s], (K + k,), (K + k + L,))
                ax = ax + vals_d[c, d] * seg
            xnew = jax.lax.slice(xd[c], (K,), (K + L,)) + (bd[c, K : K + L] - ax) * invd_d[c]
            xd = jax.lax.dynamic_update_slice(xd, xnew[None, :], (c, K))
        return self.interleave(xd)
