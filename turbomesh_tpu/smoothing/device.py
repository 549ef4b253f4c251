"""TPU device solver: matrix-free elliptic smoothing on dense block stacks.

This replaces the reference's global-CSR + GMRES/BiCGStab/ILU0/UMFPACK
machinery (smooth.zig:277-1166, GMRES.zig, BiCGStab.zig) with the
TPU-idiomatic formulation (SURVEY.md §7.1):

- the mesh is a padded stack ``X: (B, N, M, 2)`` of dense per-block arrays;
- the linearized Winslow system of one Picard step is applied matrix-free:
  interior 9-pt stencils are vectorized VPU ops over the whole stack;
  inter-block connection rows, junction rows, sliding rows and slave
  (equality) substitutions are tiny gather/scatters over precomputed
  index plans — the same equations the host oracle assembles sparsely;
- the linear solve is Jacobi-preconditioned BiCGStab in pure JAX
  (lax.while_loop), everything jitted and resident on device.

Slave (``CONNECTED``) points are eliminated by substitution
(x_slave = x_master + offset), so the reduced system's solution equals the
oracle's full-system solution to solver tolerance.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .classify import BoundaryInfo, Kind

# reference Krylov defaults (BiCGStab.zig:19-21)
DEFAULT_RTOL = 1e-6
DEFAULT_ATOL = 1e-8
DEFAULT_MAX_ITERS = 1000


@dataclasses.dataclass
class DevicePlan:
    """Static (host-precomputed) index plan, all indices into the padded
    flat space of shape (B*N*M,)."""

    B: int
    N: int
    M: int
    scatter_idx: np.ndarray      # (P,) global flat -> padded flat
    interior_mask: np.ndarray    # (B, N, M) bool
    free_mask: np.ndarray        # (B, N, M, 2) bool — solved components

    # connection middle rows (concatenated over all connections)
    c_row: np.ndarray            # (C,) padded idx of the smoothed point g0
    c_g0m: np.ndarray            # g0 - cs0
    c_g0p: np.ndarray            # g0 + cs0
    c_in0: np.ndarray            # g0 + fis0
    c_in1: np.ndarray            # g1 + fis1
    c_d0m: np.ndarray            # g0 - cs0 + fis0
    c_d0p: np.ndarray            # g0 + cs0 + fis0
    c_d1m: np.ndarray            # g1 - cs1 + fis1
    c_d1p: np.ndarray            # g1 + cs1 + fis1
    c_pi: np.ndarray             # (C, 2) periodicity (0 for non-periodic)
    c_swap_pq: np.ndarray        # (C,) bool: True -> (P,Q) = (cf.y, cf.x)

    # junction rows, padded to width K
    l_row: np.ndarray            # (L,) padded idx of the master
    l_stencil: np.ndarray        # (L, K) padded idx (self included)
    l_weight: np.ndarray         # (L, K) f64 weights (0 padding)
    l_rhs: np.ndarray            # (L, 2)

    # sliding rows
    s_row: np.ndarray            # (S,)
    s_nb: np.ndarray             # (S,)

    # slave substitution
    sl_row: np.ndarray           # (Q,)
    sl_master: np.ndarray        # (Q,)
    sl_off: np.ndarray           # (Q, 2)


def build_plan(mesh, info: BoundaryInfo) -> DevicePlan:
    starts = mesh.block_row_starts()
    sizes = [b.size for b in mesh.blocks]
    B = len(sizes)
    N = max(s[0] for s in sizes)
    M = max(s[1] for s in sizes)

    # global flat -> padded flat
    scatter_idx = np.empty(mesh.num_points, dtype=np.int64)
    for b, ((ni, nj), s) in enumerate(zip(sizes, starts)):
        ii, jj = np.meshgrid(np.arange(ni), np.arange(nj), indexing="ij")
        scatter_idx[s : s + ni * nj] = (b * N * M + ii * M + jj).reshape(-1)

    def to_pad(global_ids: np.ndarray) -> np.ndarray:
        return scatter_idx[global_ids]

    interior_mask = np.zeros((B, N, M), dtype=bool)
    for b, (ni, nj) in enumerate(sizes):
        interior_mask[b, 1 : ni - 1, 1 : nj - 1] = True

    kind_pad = np.zeros(B * N * M, dtype=np.int8)
    kind_pad[scatter_idx] = info.kind

    free = np.zeros((B * N * M, 2), dtype=bool)
    free[scatter_idx[info.kind == Kind.INTERIOR]] = True
    free[scatter_idx[info.kind == Kind.SMOOTHED]] = True
    free[scatter_idx[info.kind == Kind.LAPLACIAN]] = True
    free[scatter_idx[info.sliding_ids], 1] = True  # y only

    # connection middle rows. Shifts are block-local flat (nj-based) in
    # global space; convert endpoints to padded indices via to_pad of the
    # *global* shifted ids (shifted points stay inside the same block).
    cr, cg0m, cg0p, cin0, cin1, cd0m, cd0p, cd1m, cd1p = ([] for _ in range(9))
    cpi, cswap = [], []
    for cm in info.conn_meta:
        g0 = cm.g0[1:-1]
        g1 = cm.g1[1:-1]
        sm = info.kind[g0] == Kind.SMOOTHED
        if not np.any(sm):
            continue
        g0, g1 = g0[sm], g1[sm]
        cr.append(to_pad(g0))
        cg0m.append(to_pad(g0 - cm.cs0))
        cg0p.append(to_pad(g0 + cm.cs0))
        cin0.append(to_pad(g0 + cm.fis0))
        cin1.append(to_pad(g1 + cm.fis1))
        cd0m.append(to_pad(g0 - cm.cs0 + cm.fis0))
        cd0p.append(to_pad(g0 + cm.cs0 + cm.fis0))
        cd1m.append(to_pad(g1 - cm.cs1 + cm.fis1))
        cd1p.append(to_pad(g1 + cm.cs1 + cm.fis1))
        pi = np.zeros(2) if cm.periodicity is None else cm.periodicity
        cpi.append(np.broadcast_to(pi, (len(g0), 2)))
        cswap.append(np.full(len(g0), cm.periodicity is None))

    def cat(parts, dtype=np.int64, width=None):
        if parts:
            return np.concatenate(parts).astype(dtype)
        return (np.empty((0,), dtype=dtype) if width is None
                else np.empty((0, width), dtype=dtype))

    # junction rows padded to fixed width
    K = max((len(lp.stencil_ids) for lp in info.laplacian_points), default=1)
    L = len(info.laplacian_points)
    l_row = np.zeros(L, dtype=np.int64)
    l_stencil = np.zeros((L, K), dtype=np.int64)
    l_weight = np.zeros((L, K), dtype=np.float64)
    l_rhs = np.zeros((L, 2), dtype=np.float64)
    for li, lp in enumerate(info.laplacian_points):
        n = len(lp.stencil_ids)
        l_row[li] = to_pad(np.array([lp.global_id]))[0]
        l_stencil[li, :n] = to_pad(lp.stencil_ids)
        l_weight[li, :n] = 1.0
        l_weight[li, : n][lp.stencil_ids == lp.global_id] = -(n - 1)
        l_rhs[li] = lp.rhs

    return DevicePlan(
        B=B, N=N, M=M,
        scatter_idx=scatter_idx,
        interior_mask=interior_mask,
        free_mask=free.reshape(B, N, M, 2),
        c_row=cat(cr), c_g0m=cat(cg0m), c_g0p=cat(cg0p),
        c_in0=cat(cin0), c_in1=cat(cin1),
        c_d0m=cat(cd0m), c_d0p=cat(cd0p), c_d1m=cat(cd1m), c_d1p=cat(cd1p),
        c_pi=cat(cpi, dtype=np.float64, width=2).reshape(-1, 2),
        c_swap_pq=cat(cswap, dtype=bool),
        l_row=l_row, l_stencil=l_stencil, l_weight=l_weight, l_rhs=l_rhs,
        s_row=to_pad(info.sliding_ids) if len(info.sliding_ids) else np.empty(0, np.int64),
        s_nb=to_pad(info.sliding_neighbor_ids) if len(info.sliding_ids) else np.empty(0, np.int64),
        sl_row=to_pad(info.slave_ids) if len(info.slave_ids) else np.empty(0, np.int64),
        sl_master=to_pad(info.master_ids) if len(info.slave_ids) else np.empty(0, np.int64),
        sl_off=info.slave_offsets.reshape(-1, 2),
    )


# ---------------------------------------------------------------------------
# jitted kernels
# ---------------------------------------------------------------------------

def _metrics(im1_j, ip1_j, i_jm1, i_jp1):
    x_xi = 0.5 * (ip1_j[..., 0] - im1_j[..., 0])
    x_eta = 0.5 * (i_jp1[..., 0] - i_jm1[..., 0])
    y_xi = 0.5 * (ip1_j[..., 1] - im1_j[..., 1])
    y_eta = 0.5 * (i_jp1[..., 1] - i_jm1[..., 1])
    g22 = x_eta * x_eta + y_eta * y_eta
    g12 = x_xi * x_eta + y_xi * y_eta
    g11 = x_xi * x_xi + y_xi * y_xi
    return g11, g12, g22


def _interior_apply(base, v, cf):
    """Apply the interior Winslow stencil (coefs frozen at `base`) to `v`.

    base, v: (B, N, M, 2); cf: (B, N, M, 2). Returns (B, N, M, 2) with the
    result in the interior slots [1:-1, 1:-1] and zeros elsewhere.
    """
    g11, g12, g22 = _metrics(
        base[:, :-2, 1:-1], base[:, 2:, 1:-1], base[:, 1:-1, :-2], base[:, 1:-1, 2:]
    )
    P = cf[:, 1:-1, 1:-1, 0]
    Q = cf[:, 1:-1, 1:-1, 1]
    g11 = g11[..., None]
    g12 = g12[..., None]
    g22 = g22[..., None]
    P = P[..., None]
    Q = Q[..., None]

    out = (
        (-2.0 * g22 - 2.0 * g11) * v[:, 1:-1, 1:-1]
        + g22 * (1 + 0.5 * P) * v[:, 2:, 1:-1]      # ip1_j
        + g22 * (1 - 0.5 * P) * v[:, :-2, 1:-1]     # im1_j
        + g11 * (1 + 0.5 * Q) * v[:, 1:-1, 2:]      # i_jp1
        + g11 * (1 - 0.5 * Q) * v[:, 1:-1, :-2]     # i_jm1
        - 0.5 * g12 * v[:, 2:, 2:]                   # ip1_jp1
        + 0.5 * g12 * v[:, 2:, :-2]                  # ip1_jm1
        + 0.5 * g12 * v[:, :-2, 2:]                  # im1_jp1
        - 0.5 * g12 * v[:, :-2, :-2]                 # im1_jm1
    )
    return jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _interior_diag(base):
    g11, g12, g22 = _metrics(
        base[:, :-2, 1:-1], base[:, 2:, 1:-1], base[:, 1:-1, :-2], base[:, 1:-1, 2:]
    )
    return jnp.pad((-2.0 * g22 - 2.0 * g11), ((0, 0), (1, 1), (1, 1)))


def _connection_coefs(baseF, plan_arrays):
    """Frozen 9-pt coefficients of the connection middle rows.

    baseF: (B*N*M, 2) frozen base with slaves already substituted.
    Returns the 9 coefficient vectors (C,).
    """
    (c_row, c_g0m, c_g0p, c_in0, c_in1, *_rest, c_pi, c_swap) = plan_arrays
    im1_j = baseF[c_g0m]
    ip1_j = baseF[c_g0p]
    i_jm1 = baseF[c_in0]
    i_jp1 = baseF[c_in1] - c_pi
    g11, g12, g22 = _metrics(im1_j, ip1_j, i_jm1, i_jp1)
    return g11, g12, g22


class DeviceSmoother:
    """Drop-in replacement for SparseSystem.solve on the TPU path."""

    def __init__(self, mesh, info: BoundaryInfo,
                 rtol: float = 1e-12, atol: float = 1e-14,
                 max_iters: int = 20000):
        self.plan = build_plan(mesh, info)
        self.rtol = rtol
        self.atol = atol
        self.max_iters = max_iters
        p = self.plan
        self._jnp_plan = jax.tree.map(
            jnp.asarray,
            dict(
                scatter_idx=p.scatter_idx,
                interior_mask=p.interior_mask,
                free_mask=p.free_mask,
                c=[p.c_row, p.c_g0m, p.c_g0p, p.c_in0, p.c_in1,
                   p.c_d0m, p.c_d0p, p.c_d1m, p.c_d1p, p.c_pi, p.c_swap_pq],
                l=[p.l_row, p.l_stencil, p.l_weight, p.l_rhs],
                s=[p.s_row, p.s_nb],
                sl=[p.sl_row, p.sl_master, p.sl_off],
            ),
        )
        self._solve_jit = jax.jit(self._solve_impl)

    # -- residual / operator --------------------------------------------------

    def _substitute(self, Xf, with_offsets):
        sl_row, sl_master, sl_off = self._jnp_plan["sl"]
        val = Xf[sl_master] + (sl_off if with_offsets else 0.0)
        return Xf.at[sl_row].set(val, unique_indices=True)

    def _apply(self, baseX, baseF, cf_pad, Vf, with_offsets):
        """Affine equation map. baseX: (B,N,M,2) frozen coords (stencil
        coefficients); baseF: its flat slave-substituted version; Vf: flat
        (B*N*M, 2) point values to apply the equations to. Returns flat
        residuals over the free components."""
        p = self._jnp_plan
        B, N, M = self.plan.B, self.plan.N, self.plan.M

        Vf = self._substitute(Vf, with_offsets)
        V = Vf.reshape(B, N, M, 2)

        # interior rows
        R = _interior_apply(baseX, V, cf_pad)
        R = jnp.where(p["interior_mask"][..., None], R, 0.0)
        Rf = R.reshape(-1, 2)

        # connection middle rows (exact reference layout, smooth.zig:994-1105)
        (c_row, c_g0m, c_g0p, c_in0, c_in1,
         c_d0m, c_d0p, c_d1m, c_d1p, c_pi, c_swap) = p["c"]
        if c_row.shape[0]:
            pi = c_pi if with_offsets else jnp.zeros_like(c_pi)
            im1_j = baseF[c_g0m]
            ip1_j = baseF[c_g0p]
            i_jm1 = baseF[c_in0]
            i_jp1 = baseF[c_in1] - c_pi  # frozen coefficients always see the shift
            g11, g12, g22 = _metrics(im1_j, ip1_j, i_jm1, i_jp1)

            cf_row = cf_pad.reshape(-1, 2)[c_row]
            P = jnp.where(c_swap, cf_row[:, 1], cf_row[:, 0])
            Q = jnp.where(c_swap, cf_row[:, 0], cf_row[:, 1])

            c_ij = (-2.0 * g22 - 2.0 * g11)[:, None]
            c_ip1 = (g22 * (1 + 0.5 * P))[:, None]
            c_im1 = (g22 * (1 - 0.5 * P))[:, None]
            c_jp1 = (g11 * (1 + 0.5 * Q))[:, None]
            c_jm1 = (g11 * (1 - 0.5 * Q))[:, None]
            c_pp = (-0.5 * g12)[:, None]
            c_pm = (0.5 * g12)[:, None]
            c_mp = (0.5 * g12)[:, None]
            c_mm = (-0.5 * g12)[:, None]

            r = (
                c_ij * Vf[c_row]
                + c_ip1 * Vf[c_g0p] + c_im1 * Vf[c_g0m]
                + c_jm1 * Vf[c_in0]
                + c_jp1 * (Vf[c_in1] - pi)
                + c_mm * Vf[c_d0m] + c_pm * Vf[c_d0p]
                + c_mp * (Vf[c_d1m] - pi) + c_pp * (Vf[c_d1p] - pi)
            )
            Rf = Rf.at[c_row].set(r, unique_indices=True)

        # junction rows
        l_row, l_stencil, l_weight, l_rhs = p["l"]
        if l_row.shape[0]:
            vals = Vf[l_stencil]  # (L, K, 2)
            r = jnp.sum(l_weight[..., None] * vals, axis=1)
            if with_offsets:
                r = r - l_rhs
            Rf = Rf.at[l_row].set(r, unique_indices=True)

        # sliding rows: y - y_neighbor (x handled by exclusion from free set)
        s_row, s_nb = p["s"]
        if s_row.shape[0]:
            ry = Vf[s_row, 1] - Vf[s_nb, 1]
            Rf = Rf.at[s_row, 1].set(ry, unique_indices=True)
            Rf = Rf.at[s_row, 0].set(0.0, unique_indices=True)

        return jnp.where(p["free_mask"].reshape(-1, 2), Rf, 0.0)

    def _diag(self, baseX, baseF):
        """Jacobi preconditioner diagonal over free components."""
        p = self._jnp_plan
        d = _interior_diag(baseX)[..., None] * jnp.ones(2)
        df = d.reshape(-1, 2)

        (c_row, c_g0m, c_g0p, c_in0, c_in1, *_r, c_pi, c_swap) = p["c"]
        if c_row.shape[0]:
            im1_j = baseF[c_g0m]
            ip1_j = baseF[c_g0p]
            i_jm1 = baseF[c_in0]
            i_jp1 = baseF[c_in1] - c_pi
            g11, _, g22 = _metrics(im1_j, ip1_j, i_jm1, i_jp1)
            df = df.at[c_row].set((-2.0 * g22 - 2.0 * g11)[:, None] * jnp.ones(2))

        l_row, l_stencil, l_weight, _ = p["l"]
        if l_row.shape[0]:
            n = jnp.sum(l_weight != 0.0, axis=1).astype(df.dtype)
            df = df.at[l_row].set((-(n - 1))[:, None] * jnp.ones(2))

        s_row, _ = p["s"]
        if s_row.shape[0]:
            df = df.at[s_row, 1].set(1.0)

        free = p["free_mask"].reshape(-1, 2)
        return jnp.where(free, df, 1.0)

    # -- BiCGStab -------------------------------------------------------------

    def _solve_impl(self, Xpad, cf_pad):
        """One linearized solve: returns updated padded coords."""
        p = self._jnp_plan
        free = p["free_mask"].reshape(-1, 2)
        Xf0 = Xpad.reshape(-1, 2)
        baseF = self._substitute(Xf0, with_offsets=True)
        baseX = baseF.reshape(Xpad.shape)

        def A(v):
            return self._apply(baseX, baseF, cf_pad, v, with_offsets=False)

        inv_diag = 1.0 / self._diag(baseX, baseF)

        b = -self._apply(baseX, baseF, cf_pad, baseF, with_offsets=True)

        # restarted GMRES with Jacobi (diagonal) preconditioning — robust on
        # the nonsymmetric mixed stencil/equality system (the reference's
        # GMRES(30)+ILU0 analog, GMRES.zig:21-24)
        delta, _ = jax.scipy.sparse.linalg.gmres(
            A, b,
            M=lambda v: inv_diag * v,
            tol=self.rtol, atol=self.atol,
            restart=40, maxiter=self.max_iters,
            solve_method="batched",
        )
        # iteration count is not exposed; report final residual instead
        rnorm = jnp.linalg.norm(A(delta) - b)

        Xf1 = baseF + jnp.where(free, delta, 0.0)
        # refresh slaves from the solved masters
        Xf1 = self._substitute(Xf1, with_offsets=True)
        return Xf1.reshape(Xpad.shape), rnorm

    # -- host API (matches SparseSystem.solve) --------------------------------

    def solve(self, coords: np.ndarray, cf: np.ndarray) -> np.ndarray:
        p = self.plan
        Xpad = np.zeros((p.B * p.N * p.M, 2))
        Xpad[p.scatter_idx] = coords
        cf_pad = np.zeros((p.B * p.N * p.M, 2))
        cf_pad[p.scatter_idx] = cf
        Xout, rnorm = self._solve_jit(
            jnp.asarray(Xpad.reshape(p.B, p.N, p.M, 2)),
            jnp.asarray(cf_pad.reshape(p.B, p.N, p.M, 2)),
        )
        self.last_linear_residual = float(rnorm)
        return np.asarray(Xout).reshape(-1, 2)[p.scatter_idx]
