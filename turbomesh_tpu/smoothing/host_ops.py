"""Matrix-free host-side f64 application of the frozen Winslow system.

Replaces per-Picard-step sparse assembly (system.py) on the refinement
path of the mixed-precision solver: the interior stencil rows are applied
directly — via the native C++/OpenMP kernel (native/winslow.cpp) when
available, else vectorized NumPy — and the perimeter-sized boundary row
groups (connection/junction/sliding) are evaluated from coefficients
frozen once per Picard step. Residuals are exact f64 and identical to the
assembled system's.
"""

from __future__ import annotations

import numpy as np

from .classify import BoundaryInfo, Kind
from .system import _winslow_coefs
from ..native.build import winslow_interior_apply


class HostOperator:
    """Affine residual F(x) of one linearized Picard step, free rows only."""

    def __init__(self, mesh, info: BoundaryInfo, base: np.ndarray,
                 cf: np.ndarray):
        self.info = info
        self.starts = mesh.block_row_starts()
        self.sizes = [b.size for b in mesh.blocks]
        self.P = mesh.num_points
        self.base = np.ascontiguousarray(base)
        self.cf = np.ascontiguousarray(cf)

        kind = info.kind
        self.free = np.zeros((self.P, 2), dtype=bool)
        self.free[kind == Kind.INTERIOR] = True
        self.free[kind == Kind.SMOOTHED] = True
        self.free[kind == Kind.LAPLACIAN] = True
        self.free[info.sliding_ids, 1] = True

        # frozen connection-row coefficients (smooth.zig:994-1105 layout)
        self._conn = []
        for cm in info.conn_meta:
            g0 = cm.g0[1:-1]
            g1 = cm.g1[1:-1]
            sm = kind[g0] == Kind.SMOOTHED
            if not np.any(sm):
                continue
            g0, g1 = g0[sm], g1[sm]
            i_jp1 = base[g1 + cm.fis1]
            if cm.periodicity is not None:
                i_jp1 = i_jp1 - cm.periodicity
                P_, Q_ = cf[g0, 0], cf[g0, 1]
            else:
                P_, Q_ = cf[g0, 1], cf[g0, 0]  # reference quirk
            c = _winslow_coefs(base[g0 - cm.cs0], base[g0 + cm.cs0],
                               base[g0 + cm.fis0], i_jp1, P_, Q_)
            cols = np.stack([
                g0 - cm.cs0 + cm.fis0, g0 + cm.fis0, g0 + cm.cs0 + cm.fis0,
                g0 - cm.cs0, g0, g0 + cm.cs0,
                g1 - cm.cs1 + cm.fis1, g1 + cm.fis1, g1 + cm.cs1 + cm.fis1,
            ], axis=1)  # (n, 9)
            coefs = np.stack([
                c["im1_jm1"], c["i_jm1"], c["ip1_jm1"],
                c["im1_j"], c["i_j"], c["ip1_j"],
                c["im1_jp1"], c["i_jp1"], c["ip1_jp1"],
            ], axis=1)  # (n, 9)
            rhs = np.zeros((len(g0), 2))
            if cm.periodicity is not None:
                csum = c["im1_jp1"] + c["i_jp1"] + c["ip1_jp1"]
                rhs = np.outer(csum, cm.periodicity)
            self._conn.append((g0, cols, coefs, rhs))

        # junction rows
        self._lap = [(lp.global_id, lp.stencil_ids,
                      np.where(lp.stencil_ids == lp.global_id,
                               -(len(lp.stencil_ids) - 1.0), 1.0),
                      lp.rhs)
                     for lp in info.laplacian_points]

    def row_diag(self) -> np.ndarray:
        """Diagonal of the frozen system over free rows (1 elsewhere) — used
        to equilibrate residual norms: raw row scales differ by ~1e8 between
        tiny-cell stencil rows (~cell area) and equality/junction rows (~1),
        so an unscaled norm hides errors in clustered boundary layers."""
        d = np.ones((self.P, 2))
        for (ni, nj), s in zip(self.sizes, self.starts):
            n = ni * nj
            base_b = self.base[s : s + n].reshape(ni, nj, 2)
            x_xi = 0.5 * (base_b[2:, 1:-1] - base_b[:-2, 1:-1])
            x_eta = 0.5 * (base_b[1:-1, 2:] - base_b[1:-1, :-2])
            g11 = np.sum(x_xi * x_xi, axis=-1)
            g22 = np.sum(x_eta * x_eta, axis=-1)
            db = d[s : s + n].reshape(ni, nj, 2)
            db[1:-1, 1:-1] = (-2.0 * (g11 + g22))[..., None]
        for g0, cols, coefs, rhs in self._conn:
            d[g0] = coefs[:, 4][:, None]  # c_ij slot
        for gid, stencil, w, rhs in self._lap:
            d[gid] = -(len(stencil) - 1.0)
        sl = self.info.sliding_ids
        d[sl, 1] = 1.0
        return np.where(self.free & (d != 0.0), d, 1.0)

    def substitute(self, x: np.ndarray) -> np.ndarray:
        info = self.info
        x[info.slave_ids] = x[info.master_ids] + info.slave_offsets
        return x

    def residual(self, x: np.ndarray) -> np.ndarray:
        """F(x) over free rows; x must already have slaves substituted."""
        out = np.zeros_like(x)

        # interior rows: native C++ kernel per block, NumPy fallback
        for (ni, nj), s in zip(self.sizes, self.starts):
            n = ni * nj
            base_b = self.base[s : s + n].reshape(ni, nj, 2)
            cf_b = self.cf[s : s + n].reshape(ni, nj, 2)
            x_b = np.ascontiguousarray(x[s : s + n].reshape(ni, nj, 2))
            out_b = out[s : s + n].reshape(ni, nj, 2)
            if not winslow_interior_apply(base_b, cf_b, x_b, out_b):
                c = _winslow_coefs(
                    base_b[:-2, 1:-1], base_b[2:, 1:-1],
                    base_b[1:-1, :-2], base_b[1:-1, 2:],
                    cf_b[1:-1, 1:-1, 0], cf_b[1:-1, 1:-1, 1],
                )
                out_b[1:-1, 1:-1] = (
                    c["i_j"][..., None] * x_b[1:-1, 1:-1]
                    + c["ip1_j"][..., None] * x_b[2:, 1:-1]
                    + c["im1_j"][..., None] * x_b[:-2, 1:-1]
                    + c["i_jp1"][..., None] * x_b[1:-1, 2:]
                    + c["i_jm1"][..., None] * x_b[1:-1, :-2]
                    + c["ip1_jp1"][..., None] * x_b[2:, 2:]
                    + c["ip1_jm1"][..., None] * x_b[2:, :-2]
                    + c["im1_jp1"][..., None] * x_b[:-2, 2:]
                    + c["im1_jm1"][..., None] * x_b[:-2, :-2]
                )

        # connection rows
        for g0, cols, coefs, rhs in self._conn:
            out[g0] = np.einsum("nk,nkd->nd", coefs, x[cols]) - rhs

        # junction rows
        for gid, stencil, w, rhs in self._lap:
            out[gid] = w @ x[stencil] - rhs

        # sliding rows: y - y_neighbor (x pinned via free mask)
        sl = self.info.sliding_ids
        nb = self.info.sliding_neighbor_ids
        out[sl, 1] = x[sl, 1] - x[nb, 1]
        out[sl, 0] = 0.0

        return np.where(self.free, out, 0.0)
