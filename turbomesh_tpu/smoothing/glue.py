"""Inter-block "glue" maps for the multigrid hierarchy.

The round-1/round-2 interior-only V-cycle preconditioned each block with
zero-Dirichlet interfaces, which leaves error modes that are smooth
ACROSS a connection untouched — measured as a large cluster of
barely-preconditioned eigenvalues (GMRES needed ~200 iterations on the
T106 O4H mesh regardless of preconditioner precision). The fix is the
classic parallel-multigrid one: connection face points participate in
the relaxation at EVERY level, with one ghost layer per block face
filled from the partner block (SURVEY.md §7.1 "boundary kinds as masks
and exchange rules"; the reference couples these rows exactly through
its global CSR, smooth.zig:994-1105).

This module precomputes, per multigrid level, a static gather map in the
ghost-augmented padded-stack space (B, N_l+2, M_l+2):

- ghost entries: the out-of-block stencil neighbor of a SMOOTHED
  connection-face point <- the partner block's first interior point
  (minus the connection periodicity for coordinate fields);
- slave entries: CONNECTED face points <- their master point (+ the
  slave offset for coordinate fields),

so one ``Xg.at[dst].set(Xg[src] + s*off)`` glues the whole mesh. At
coarse levels only lattice-aligned points are glued (others degrade to
the zero-Dirichlet behavior — acceptable in a preconditioner).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .classify import BoundaryInfo, Kind


@dataclasses.dataclass
class GlueLevel:
    """Static per-level glue data. N, M are the level's padded block
    dims (without ghosts); indices are ghost-space flat
    (b*(N+2)*(M+2) + (i+1)*(M+2) + (j+1) for a block point (i, j))."""

    N: int
    M: int
    smooth_mask: np.ndarray   # (B, N, M) bool — interior + SMOOTHED faces
    src: np.ndarray           # (G,)
    dst: np.ndarray           # (G,)
    off: np.ndarray           # (G, 2) — added to coordinate fields only


def _decode_shift(shift: int, nj: int):
    """Block-local flat shift -> (di, dj) unit step (shift in {±1, ±nj})."""
    if abs(shift) == 1:
        return 0, int(np.sign(shift))
    return int(shift // nj), 0


def build_glue(mesh, info: BoundaryInfo, N: int, M: int,
               min_size: int = 5, n_levels: int | None = None):
    """Build per-level glue maps + smooth masks for the padded stack.

    Returns a list of GlueLevel, finest first, with the same ladder the
    multigrid uses ((n-1)//2+1 coarsening of the padded dims).
    """
    sizes = [b.size for b in mesh.blocks]
    B = len(sizes)
    starts = mesh.block_row_starts()
    kind = info.kind

    def decode_global(g):
        """global flat id -> (block, i, j)"""
        b = int(np.searchsorted(starts, g, side="right") - 1)
        r = int(g - starts[b])
        nj = sizes[b][1]
        return b, r // nj, r % nj

    # per-level sampled fine indices per block + padded dims
    ii = [np.arange(ni) for ni, nj in sizes]
    jj = [np.arange(nj) for ni, nj in sizes]
    Nl, Ml = N, M
    levels = []
    lvl = 0
    while True:
        # inverse lattice lookups
        inv_i = [np.full(sizes[b][0], -1, dtype=np.int64) for b in range(B)]
        inv_j = [np.full(sizes[b][1], -1, dtype=np.int64) for b in range(B)]
        for b in range(B):
            inv_i[b][ii[b]] = np.arange(len(ii[b]))
            inv_j[b][jj[b]] = np.arange(len(jj[b]))

        Ng, Mg = Nl + 2, Ml + 2

        def gflat(b, ci, cj):
            return b * Ng * Mg + (ci + 1) * Mg + (cj + 1)

        # smooth mask: INTERIOR + SMOOTHED at lattice points
        smooth = np.zeros((B, Nl, Ml), dtype=bool)
        for b in range(B):
            ni, nj = sizes[b]
            kb = kind[starts[b] : starts[b] + ni * nj].reshape(ni, nj)
            ks = kb[np.ix_(ii[b], jj[b])]
            ok = (ks == Kind.INTERIOR) | (ks == Kind.SMOOTHED)
            smooth[b, : len(ii[b]), : len(jj[b])] = ok

        src, dst, off = [], [], []

        # ghost entries per connection (both sides want ghosts: side-0
        # SMOOTHED rows are relaxed; side-1 faces are slaves whose
        # adjacent interiors smooth fine without extra ghosts)
        for cm in info.conn_meta:
            b0, i00, j00 = decode_global(int(cm.g0[0]))
            b1, i10, j10 = decode_global(int(cm.g1[0]))
            nj0, nj1 = sizes[b0][1], sizes[b1][1]
            di_f0, dj_f0 = _decode_shift(cm.fis0, nj0)   # into block 0
            di_f1, dj_f1 = _decode_shift(cm.fis1, nj1)   # into block 1
            di_c0, dj_c0 = _decode_shift(cm.cs0, nj0)    # along face, side 0
            di_c1, dj_c1 = _decode_shift(cm.cs1, nj1)
            pi = (np.zeros(2) if cm.periodicity is None
                  else np.asarray(cm.periodicity, dtype=np.float64))
            L = len(cm.g0)
            for k in range(L):
                i0, j0 = i00 + k * di_c0, j00 + k * dj_c0
                i1, j1 = i10 + k * di_c1, j10 + k * dj_c1
                c_i0, c_j0 = inv_i[b0][i0], inv_j[b0][j0]
                c_i1, c_j1 = inv_i[b1][i1], inv_j[b1][j1]
                if min(c_i0, c_j0, c_i1, c_j1) < 0:
                    continue  # off this level's lattice
                # partner first interior on this level's lattice
                s_i1, s_j1 = c_i1 + di_f1, c_j1 + dj_f1
                if not (0 <= s_i1 < len(ii[b1]) and 0 <= s_j1 < len(jj[b1])):
                    continue
                # ghost position: one lattice step OUTSIDE block 0
                g_i0, g_j0 = c_i0 - di_f0, c_j0 - dj_f0
                dst.append(gflat(b0, g_i0, g_j0))
                src.append(gflat(b1, s_i1, s_j1))
                off.append(-pi)  # local frame: partner coords - periodicity

        # slave entries (x_s = x_m + off; corrections copy exactly)
        for gs, gm, o in zip(info.slave_ids, info.master_ids,
                             info.slave_offsets):
            bs, is_, js = decode_global(int(gs))
            bm, im, jm = decode_global(int(gm))
            c_is, c_js = inv_i[bs][is_], inv_j[bs][js]
            c_im, c_jm = inv_i[bm][im], inv_j[bm][jm]
            if min(c_is, c_js, c_im, c_jm) < 0:
                continue
            dst.append(gflat(bs, c_is, c_js))
            src.append(gflat(bm, c_im, c_jm))
            off.append(np.asarray(o, dtype=np.float64))

        levels.append(GlueLevel(
            N=Nl, M=Ml, smooth_mask=smooth,
            src=np.asarray(src, dtype=np.int64),
            dst=np.asarray(dst, dtype=np.int64),
            off=(np.asarray(off, dtype=np.float64).reshape(-1, 2)),
        ))

        if (n_levels is not None and len(levels) >= n_levels) or \
           min(Nl, Ml) <= min_size or \
           all(min(len(ii[b]), len(jj[b])) <= min_size for b in range(B)):
            break
        ii = [a[::2] for a in ii]
        jj = [a[::2] for a in jj]
        Nl = (Nl - 1) // 2 + 1
        Ml = (Ml - 1) // 2 + 1
        lvl += 1

    return levels
