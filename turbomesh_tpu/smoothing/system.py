"""Host-side sparse system: the exact reference discretization, assembled
with NumPy and solved with a scipy direct factorization.

Reference parity: smooth.zig RowCompressedMatrixSystem2d (entire struct).
This is the correctness oracle for the TPU device solver and the direct
small-mesh path (stands in for the reference's UMFPACK/PETSc backends).

Row equations per point kind (see classify.Kind):

  INTERIOR   9-pt Winslow stencil, P,Q from the control function
             (smooth.zig:923-992; StencilData smooth.zig:171-216)
  FIXED      x = current coordinate (smooth.zig:790-796)
  SMOOTHED   9-pt Winslow spanning the connection: 3 interior points of
             each block + 3 on the connection; ghost neighbor shifted by
             -periodicity, RHS periodicity * (sum of block-1 coefs)
             (smooth.zig:994-1105). NOTE the deliberate reference quirk:
             the non-periodic path passes (cf.y, cf.x) as (P, Q) while
             the periodic path passes (cf.x, cf.y) (smooth.zig:1041 vs
             1083-1084) — replicated.
  CONNECTED  x_slave = x_master + offset (smooth.zig:804-812, 904-915)
  LAPLACIAN  sum(x_stencil) - (n-1) x_self = accumulated periodicity
             (smooth.zig:813-836, 917-921)
  SLIDING    x-solve: x = initial x; y-solve: y = y(first interior
             neighbor) (smooth.zig:837-859, 1115-1165)
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .classify import BoundaryInfo, Kind


def _winslow_coefs(im1_j, ip1_j, i_jm1, i_jp1, P, Q):
    """9-point stencil coefficients (smooth.zig:192-215). Inputs (..., 2).

    Returns dict of coefficient arrays keyed like the reference's enum.
    """
    x_xi = 0.5 * (ip1_j[..., 0] - im1_j[..., 0])
    x_eta = 0.5 * (i_jp1[..., 0] - i_jm1[..., 0])
    y_xi = 0.5 * (ip1_j[..., 1] - im1_j[..., 1])
    y_eta = 0.5 * (i_jp1[..., 1] - i_jm1[..., 1])

    g22 = x_eta * x_eta + y_eta * y_eta
    g12 = x_xi * x_eta + y_xi * y_eta
    g11 = x_xi * x_xi + y_xi * y_xi

    return {
        "i_j": -2.0 * g22 - 2.0 * g11,
        "ip1_j": g22 * (1 + 0.5 * P),
        "im1_j": g22 * (1 - 0.5 * P),
        "i_jp1": g11 * (1 + 0.5 * Q),
        "i_jm1": g11 * (1 - 0.5 * Q),
        "ip1_jp1": -0.5 * g12,
        "ip1_jm1": 0.5 * g12,
        "im1_jp1": 0.5 * g12,
        "im1_jm1": -0.5 * g12,
    }


class SparseSystem:
    """Assembles and solves the global linear system for one Picard step."""

    def __init__(self, mesh, info: BoundaryInfo):
        self.info = info
        self.starts = mesh.block_row_starts()
        self.sizes = [b.size for b in mesh.blocks]
        self.P = mesh.num_points
        self._static = self._build_static_rows(info)

    # ---- static rows (kind-dependent, coordinate-independent columns) -------

    def _build_static_rows(self, info):
        rows, cols, vals = [], [], []
        kind = info.kind

        fixed_ids = np.nonzero(kind == Kind.FIXED)[0]
        rows.append(fixed_ids)
        cols.append(fixed_ids)
        vals.append(np.ones(len(fixed_ids)))

        # connected slaves: x_master - x_slave = -offset  (row = slave id)
        rows.append(info.slave_ids)
        cols.append(info.master_ids)
        vals.append(np.ones(len(info.slave_ids)))
        rows.append(info.slave_ids)
        cols.append(info.slave_ids)
        vals.append(-np.ones(len(info.slave_ids)))

        for lp in info.laplacian_points:
            n = len(lp.stencil_ids)
            v = np.ones(n)
            v[lp.stencil_ids == lp.global_id] = -(n - 1)
            rows.append(np.full(n, lp.global_id))
            cols.append(lp.stencil_ids)
            vals.append(v)

        return (np.concatenate(rows).astype(np.int64),
                np.concatenate(cols).astype(np.int64),
                np.concatenate(vals))

    # ---- per-iteration assembly ---------------------------------------------

    def assemble(self, coords: np.ndarray, cf: np.ndarray):
        """Build matrix pieces common to the x and y solves.

        coords: (P, 2) current flat coordinates; cf: (P, 2) control function.
        Returns (rows, cols, vals, rhs (P,2)).
        """
        info = self.info
        kind = info.kind
        rows_l, cols_l, vals_l = [list(x) for x in ([], [], [])]
        rhs = np.zeros((self.P, 2))

        # interior 9-pt stencils, vectorized per block
        for (ni, nj), s in zip(self.sizes, self.starts):
            pts = coords[s : s + ni * nj].reshape(ni, nj, 2)
            pq = cf[s : s + ni * nj].reshape(ni, nj, 2)
            c = _winslow_coefs(
                pts[:-2, 1:-1], pts[2:, 1:-1], pts[1:-1, :-2], pts[1:-1, 2:],
                pq[1:-1, 1:-1, 0], pq[1:-1, 1:-1, 1],
            )
            ii, jj = np.meshgrid(
                np.arange(1, ni - 1), np.arange(1, nj - 1), indexing="ij"
            )
            base = s + ii * nj + jj  # (ni-2, nj-2)
            for key, off in (
                ("im1_jm1", -nj - 1), ("im1_j", -nj), ("im1_jp1", -nj + 1),
                ("i_jm1", -1), ("i_j", 0), ("i_jp1", 1),
                ("ip1_jm1", nj - 1), ("ip1_j", nj), ("ip1_jp1", nj + 1),
            ):
                rows_l.append(base.ravel())
                cols_l.append((base + off).ravel())
                vals_l.append(c[key].ravel())

        # smoothed connection rows, vectorized per connection
        for cm in info.conn_meta:
            g0 = cm.g0[1:-1]
            g1 = cm.g1[1:-1]
            sm = kind[g0] == Kind.SMOOTHED
            if not np.any(sm):
                continue
            g0 = g0[sm]
            g1 = g1[sm]
            im1_j = coords[g0 - cm.cs0]
            ip1_j = coords[g0 + cm.cs0]
            i_jm1 = coords[g0 + cm.fis0]
            i_jp1 = coords[g1 + cm.fis1]
            if cm.periodicity is not None:
                i_jp1 = i_jp1 - cm.periodicity
                P_, Q_ = cf[g0, 0], cf[g0, 1]
            else:
                # reference argument-order quirk (smooth.zig:1083-1084)
                P_, Q_ = cf[g0, 1], cf[g0, 0]
            c = _winslow_coefs(im1_j, ip1_j, i_jm1, i_jp1, P_, Q_)
            for key, col in (
                ("im1_jm1", g0 - cm.cs0 + cm.fis0),
                ("i_jm1", g0 + cm.fis0),
                ("ip1_jm1", g0 + cm.cs0 + cm.fis0),
                ("im1_j", g0 - cm.cs0),
                ("i_j", g0),
                ("ip1_j", g0 + cm.cs0),
                ("im1_jp1", g1 - cm.cs1 + cm.fis1),
                ("i_jp1", g1 + cm.fis1),
                ("ip1_jp1", g1 + cm.cs1 + cm.fis1),
            ):
                rows_l.append(g0)
                cols_l.append(col)
                vals_l.append(c[key])
            if cm.periodicity is not None:
                csum = c["im1_jp1"] + c["i_jp1"] + c["ip1_jp1"]
                rhs[g0, 0] = cm.periodicity[0] * csum
                rhs[g0, 1] = cm.periodicity[1] * csum

        # static rows
        srows, scols, svals = self._static
        rows_l.append(srows)
        cols_l.append(scols)
        vals_l.append(svals)

        # static rhs: fixed -> current coords; connected -> -offset;
        # laplacian -> accumulated periodicity
        fixed_ids = np.nonzero(kind == Kind.FIXED)[0]
        rhs[fixed_ids] = coords[fixed_ids]
        rhs[info.slave_ids] = -info.slave_offsets
        for lp in info.laplacian_points:
            rhs[lp.global_id] = lp.rhs

        return (np.concatenate(rows_l), np.concatenate(cols_l),
                np.concatenate(vals_l), rhs)

    def solve(self, coords: np.ndarray, cf: np.ndarray) -> np.ndarray:
        """One linear solve pair (x then y system) -> new (P, 2) coords."""
        info = self.info
        rows, cols, vals, rhs = self.assemble(coords, cf)
        new = np.empty_like(coords)

        sl = info.sliding_ids
        nb = info.sliding_neighbor_ids

        # x-system: sliding rows x = current x
        rx = np.concatenate([rows, sl, sl])
        cx = np.concatenate([cols, sl, nb])
        vx = np.concatenate([vals, np.ones(len(sl)), np.zeros(len(sl))])
        bx = rhs[:, 0].copy()
        bx[sl] = coords[sl, 0]
        Ax = sp.csr_matrix((vx, (rx, cx)), shape=(self.P, self.P))
        Ax.sum_duplicates()
        new[:, 0] = spla.spsolve(Ax, bx)

        # y-system: sliding rows y - y_neighbor = 0
        ry = np.concatenate([rows, sl, sl])
        cy = np.concatenate([cols, sl, nb])
        vy = np.concatenate([vals, np.ones(len(sl)), -np.ones(len(sl))])
        by = rhs[:, 1].copy()
        by[sl] = 0.0
        Ay = sp.csr_matrix((vy, (ry, cy)), shape=(self.P, self.P))
        Ay.sum_duplicates()
        new[:, 1] = spla.spsolve(Ay, by)

        return new
