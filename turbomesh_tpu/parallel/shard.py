"""Block-sharded multi-chip elliptic smoothing via shard_map + collectives.

The structured-grid analog of spatial/context parallelism (SURVEY.md §2,
§5.7-5.8): mesh blocks are sharded across TPU chips on a 1-D device mesh
axis ``'b'``; each linear-operator application exchanges only the blocks'
two outermost point layers (the "ring") with ``all_gather`` over ICI —
O(perimeter) bytes against O(area) compute. Periodic connections add the
pitch vector to received partner data, junction points read their <=6
cross-block stencil neighbors from the gathered ring, and reductions
(GMRES dot products) ride ``psum``.

This replaces the serial reference's global sparse solve
(smooth.zig:277-1166); there is no reference counterpart to the
distribution itself (the reference is single-threaded; its MPI linkage is
sequential-only, petsc_shim.c:6).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JMesh, PartitionSpec as P

from ..smoothing.classify import BoundaryInfo
from ..smoothing.device import build_plan, _metrics


def _ring_index(b, i, j, ni, nj, N, M, B):
    """Host-side: map a (block, i, j) point in the 2-layer boundary ring to
    its index in the gathered ring buffer R = [ring_i | ring_j]:
      ring_i: (B, 4, M) rows i in {0, 1, ni-2, ni-1} of each block
      ring_j: (B, N, 4) cols j in {0, 1, nj-2, nj-1} of each block
    (ni, nj) are the block's actual dimensions within the (N, M) padding.
    """
    i_layers = {0: 0, 1: 1, ni - 2: 2, ni - 1: 3}
    j_layers = {0: 0, 1: 1, nj - 2: 2, nj - 1: 3}
    if i in i_layers:
        return (b * 4 + i_layers[i]) * M + j
    if j in j_layers:
        return B * 4 * M + (b * N + i) * 4 + j_layers[j]
    raise ValueError(f"point ({b},{i},{j}) not in 2-layer ring of ({ni},{nj})")


@dataclasses.dataclass
class ShardPlanArrays:
    """Per-device plan arrays, stacked over devices (leading axis D) and
    padded to the max row count; `*_valid` masks mark real rows."""

    # connection middle rows
    c_row: np.ndarray; c_g0m: np.ndarray; c_g0p: np.ndarray; c_in0: np.ndarray
    c_d0m: np.ndarray; c_d0p: np.ndarray
    c_in1r: np.ndarray; c_d1mr: np.ndarray; c_d1pr: np.ndarray
    c_pi: np.ndarray; c_swap: np.ndarray; c_valid: np.ndarray
    # junction rows (stencil via ring)
    l_row: np.ndarray; l_stencil_r: np.ndarray; l_weight: np.ndarray
    l_rhs: np.ndarray; l_valid: np.ndarray
    # sliding rows (local)
    s_row: np.ndarray; s_nb: np.ndarray; s_valid: np.ndarray
    # slave substitution (master via ring)
    sl_row: np.ndarray; sl_master_r: np.ndarray; sl_off: np.ndarray
    sl_valid: np.ndarray


class ShardedSmoother:
    """Multi-device drop-in for DeviceSmoother.solve.

    Blocks are padded to a common (N, M) and distributed over `n_devices`
    (B must divide evenly after dummy-block padding).
    """

    def __init__(self, mesh, info: BoundaryInfo, n_devices: int | None = None,
                 devices=None, rtol: float = 1e-12, atol: float = 1e-14,
                 restart: int = 30, max_restarts: int = 400):
        if devices is None:
            devices = jax.devices()
            if n_devices is not None:
                devices = devices[:n_devices]
        self.devices = devices
        D = len(devices)
        self.rtol, self.atol = rtol, atol
        self.restart, self.max_restarts = restart, max_restarts

        plan = build_plan(mesh, info)
        self.base_plan = plan
        B0, N, M = plan.B, plan.N, plan.M
        B = ((B0 + D - 1) // D) * D  # pad with dummy blocks
        self.B, self.N, self.M, self.D = B, N, M, D
        self.Bl = B // D

        # global (B,N,M) masks, padded blocks inert
        interior = np.zeros((B, N, M), dtype=bool)
        interior[:B0] = plan.interior_mask
        free = np.zeros((B, N, M, 2), dtype=bool)
        free[:B0] = plan.free_mask
        self.interior_mask = interior
        self.free_mask = free

        # per-block ring row/col positions (actual block extents, not padding)
        sizes = [blk.size for blk in mesh.blocks]
        self.ring_rows = np.zeros((B, 4), dtype=np.int64)
        self.ring_cols = np.zeros((B, 4), dtype=np.int64)
        for b in range(B):
            ni, nj = sizes[b] if b < B0 else (N, M)
            self.ring_rows[b] = [0, 1, max(ni - 2, 0), ni - 1]
            self.ring_cols[b] = [0, 1, max(nj - 2, 0), nj - 1]
        self.scatter_idx = plan.scatter_idx  # into (B0*N*M); B padding appended after

        self._build_shard_plans(mesh, info)

        self.jmesh = JMesh(np.array(devices), ("b",))
        self._solve_jit = jax.jit(self._make_solver())

    # ------------------------------------------------------------------ plans

    def _split_pad_stack(self, rows_block, arrays, D, pad_values):
        """Split row-arrays by owning device, pad to max count, stack (D, C)."""
        per_dev = [[] for _ in range(D)]
        for k, blk in enumerate(rows_block):
            per_dev[blk // self.Bl].append(k)
        cmax = max((len(x) for x in per_dev), default=0)
        cmax = max(cmax, 1)
        out = []
        for arr, padv in zip(arrays, pad_values):
            shp = (D, cmax) + arr.shape[1:]
            buf = np.full(shp, padv, dtype=arr.dtype)
            for d in range(D):
                sel = per_dev[d]
                if sel:
                    buf[d, : len(sel)] = arr[sel]
            out.append(buf)
        valid = np.zeros((D, cmax), dtype=bool)
        for d in range(D):
            valid[d, : len(per_dev[d])] = True
        return out, valid

    def _build_shard_plans(self, mesh, info):
        plan = self.base_plan
        B, N, M, D, Bl = self.B, self.N, self.M, self.D, self.Bl

        def pad_to_bij(padded_idx):
            """padded flat (B0*N*M) -> (block, i, j)"""
            b, r = np.divmod(padded_idx, N * M)
            i, j = np.divmod(r, M)
            return b, i, j

        def to_local(padded_idx):
            """padded flat -> (device, local flat) given owning block."""
            b, i, j = pad_to_bij(padded_idx)
            d = b // Bl
            lb = b % Bl
            return d, (lb * N + i) * M + j

        sizes = [blk.size for blk in mesh.blocks]

        def to_ring(padded_idx):
            b, i, j = pad_to_bij(padded_idx)
            return np.array(
                [_ring_index(int(bb), int(ii), int(jj), *sizes[int(bb)], N, M, B)
                 for bb, ii, jj in zip(np.atleast_1d(b), np.atleast_1d(i), np.atleast_1d(j))],
                dtype=np.int64,
            )

        # connection rows: row + local operands on the owning device
        c_row_b = pad_to_bij(plan.c_row)[0]
        loc = lambda a: to_local(a)[1]
        (c_arr, c_valid) = self._split_pad_stack(
            c_row_b,
            [loc(plan.c_row), loc(plan.c_g0m), loc(plan.c_g0p), loc(plan.c_in0),
             loc(plan.c_d0m), loc(plan.c_d0p),
             to_ring(plan.c_in1), to_ring(plan.c_d1m), to_ring(plan.c_d1p),
             plan.c_pi, plan.c_swap_pq],
            D,
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0.0, False],
        )

        l_row_b = pad_to_bij(plan.l_row)[0] if len(plan.l_row) else np.empty(0, np.int64)
        K = plan.l_stencil.shape[1] if plan.l_stencil.ndim == 2 else 1
        l_st_ring = (np.stack([to_ring(plan.l_stencil[:, k]) for k in range(K)], axis=1)
                     if len(plan.l_row) else np.empty((0, K), np.int64))
        (l_arr, l_valid) = self._split_pad_stack(
            l_row_b,
            [loc(plan.l_row) if len(plan.l_row) else np.empty(0, np.int64),
             l_st_ring, plan.l_weight, plan.l_rhs],
            D,
            [0, 0, 0.0, 0.0],
        )

        s_row_b = pad_to_bij(plan.s_row)[0] if len(plan.s_row) else np.empty(0, np.int64)
        (s_arr, s_valid) = self._split_pad_stack(
            s_row_b,
            [loc(plan.s_row) if len(plan.s_row) else np.empty(0, np.int64),
             loc(plan.s_nb) if len(plan.s_nb) else np.empty(0, np.int64)],
            D,
            [0, 0],
        )

        sl_row_b = pad_to_bij(plan.sl_row)[0] if len(plan.sl_row) else np.empty(0, np.int64)
        (sl_arr, sl_valid) = self._split_pad_stack(
            sl_row_b,
            [loc(plan.sl_row) if len(plan.sl_row) else np.empty(0, np.int64),
             to_ring(plan.sl_master) if len(plan.sl_master) else np.empty(0, np.int64),
             plan.sl_off],
            D,
            [0, 0, 0.0],
        )

        # per-device connection-chain segment tables (indices into the
        # device's padded c-row arrays). Chains live on one device (the
        # range-0 block's owner); rows of one chain stay consecutive.
        C = len(plan.c_row)
        c_conn = np.zeros(C, dtype=np.int64)
        for s in range(plan.c_seg.shape[0]):
            sel = plan.c_seg[s][plan.c_seg_valid[s]]
            c_conn[sel] = s
        per_dev = [[] for _ in range(D)]
        for k, blk in enumerate(c_row_b):
            per_dev[blk // Bl].append(k)
        dev_tables = []
        for d in range(D):
            sel = per_dev[d]
            runs = []
            for pos, k in enumerate(sel):
                if runs and c_conn[k] == runs[-1][0]:
                    runs[-1][1].append(pos)
                else:
                    runs.append((c_conn[k], [pos]))
            dev_tables.append([r[1] for r in runs])
        S_max = max((len(t) for t in dev_tables), default=1) or 1
        L_max = max((len(run) for t in dev_tables for run in t), default=1) or 1
        cseg = np.zeros((D, S_max, L_max), dtype=np.int64)
        cseg_valid = np.zeros((D, S_max, L_max), dtype=bool)
        for d, t in enumerate(dev_tables):
            for s, run in enumerate(t):
                cseg[d, s, : len(run)] = run
                cseg_valid[d, s, : len(run)] = True
        self.cseg = cseg
        self.cseg_valid = cseg_valid

        self.shard_plan = ShardPlanArrays(
            c_row=c_arr[0], c_g0m=c_arr[1], c_g0p=c_arr[2], c_in0=c_arr[3],
            c_d0m=c_arr[4], c_d0p=c_arr[5],
            c_in1r=c_arr[6], c_d1mr=c_arr[7], c_d1pr=c_arr[8],
            c_pi=c_arr[9], c_swap=c_arr[10], c_valid=c_valid,
            l_row=l_arr[0], l_stencil_r=l_arr[1], l_weight=l_arr[2],
            l_rhs=l_arr[3], l_valid=l_valid,
            s_row=s_arr[0], s_nb=s_arr[1], s_valid=s_valid,
            sl_row=sl_arr[0], sl_master_r=sl_arr[1], sl_off=sl_arr[2],
            sl_valid=sl_valid,
        )

    # ---------------------------------------------------------------- kernels

    def _make_solver(self):
        N, M, B, Bl = self.N, self.M, self.B, self.Bl
        restart = self.restart
        rtol, atol = self.rtol, self.atol
        max_restarts = self.max_restarts

        ring_rows = jnp.asarray(self.ring_rows)  # (B, 4) closed over; sliced below
        ring_cols = jnp.asarray(self.ring_cols)

        def make_gather_ring(rows_l, cols_l):
            def gather_ring(Xl):
                """Xl: (Bl, N, M, 2) -> global ring buffer (B*4*M + B*N*4, 2)."""
                ri = jnp.take_along_axis(Xl, rows_l[:, :, None, None], axis=1)
                rj = jnp.take_along_axis(Xl, cols_l[:, None, :, None], axis=2)
                RI = jax.lax.all_gather(ri, "b", tiled=True)   # (B, 4, M, 2)
                RJ = jax.lax.all_gather(rj, "b", tiled=True)   # (B, N, 4, 2)
                return jnp.concatenate(
                    [RI.reshape(-1, 2), RJ.reshape(-1, 2)], axis=0
                )
            return gather_ring

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b), "b")

        def substitute(q, Xl, R, with_offsets):
            # masked scatter-ADD of (new - cur): padded dummy rows (index 0)
            # may collide with real rows, and duplicate-index scatter-set has
            # undefined write order; add with a zero contribution is safe.
            Xf = Xl.reshape(-1, 2)
            new = R[q["sl_master_r"]] + (q["sl_off"] if with_offsets else 0.0)
            cur = Xf[q["sl_row"]]
            delta = jnp.where(q["sl_valid"][:, None], new - cur, 0.0)
            return Xf.at[q["sl_row"]].add(delta).reshape(Xl.shape)

        def apply_equations(q, baseXl, baseR, cfl, Vl, VR, with_offsets,
                            interior_mask, free_mask):
            """Residual over local free components. baseXl/baseR frozen;
            Vl local values (slaves already substituted), VR its ring."""
            g11, g12, g22 = _metrics(
                baseXl[:, :-2, 1:-1], baseXl[:, 2:, 1:-1],
                baseXl[:, 1:-1, :-2], baseXl[:, 1:-1, 2:],
            )
            Pc = cfl[:, 1:-1, 1:-1, 0][..., None]
            Qc = cfl[:, 1:-1, 1:-1, 1][..., None]
            g11 = g11[..., None]; g12 = g12[..., None]; g22 = g22[..., None]
            out = (
                (-2.0 * g22 - 2.0 * g11) * Vl[:, 1:-1, 1:-1]
                + g22 * (1 + 0.5 * Pc) * Vl[:, 2:, 1:-1]
                + g22 * (1 - 0.5 * Pc) * Vl[:, :-2, 1:-1]
                + g11 * (1 + 0.5 * Qc) * Vl[:, 1:-1, 2:]
                + g11 * (1 - 0.5 * Qc) * Vl[:, 1:-1, :-2]
                - 0.5 * g12 * Vl[:, 2:, 2:]
                + 0.5 * g12 * Vl[:, 2:, :-2]
                + 0.5 * g12 * Vl[:, :-2, 2:]
                - 0.5 * g12 * Vl[:, :-2, :-2]
            )
            Rres = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))
            Rres = jnp.where(interior_mask[..., None], Rres, 0.0)
            Rf = Rres.reshape(-1, 2)
            Vf = Vl.reshape(-1, 2)
            baseF = baseXl.reshape(-1, 2)

            # connection rows (exact reference layout, smooth.zig:994-1105)
            pi_off = q["c_pi"] if with_offsets else jnp.zeros_like(q["c_pi"])
            im1_j = baseF[q["c_g0m"]]; ip1_j = baseF[q["c_g0p"]]
            i_jm1 = baseF[q["c_in0"]]; i_jp1 = baseR[q["c_in1r"]] - q["c_pi"]
            cg11, cg12, cg22 = _metrics(im1_j, ip1_j, i_jm1, i_jp1)
            cf_row = cfl.reshape(-1, 2)[q["c_row"]]
            Pq = jnp.where(q["c_swap"], cf_row[:, 1], cf_row[:, 0])
            Qq = jnp.where(q["c_swap"], cf_row[:, 0], cf_row[:, 1])
            r = (
                (-2.0 * cg22 - 2.0 * cg11)[:, None] * Vf[q["c_row"]]
                + (cg22 * (1 + 0.5 * Pq))[:, None] * Vf[q["c_g0p"]]
                + (cg22 * (1 - 0.5 * Pq))[:, None] * Vf[q["c_g0m"]]
                + (cg11 * (1 - 0.5 * Qq))[:, None] * Vf[q["c_in0"]]
                + (cg11 * (1 + 0.5 * Qq))[:, None] * (VR[q["c_in1r"]] - pi_off)
                + (-0.5 * cg12)[:, None] * Vf[q["c_d0m"]]
                + (0.5 * cg12)[:, None] * Vf[q["c_d0p"]]
                + (0.5 * cg12)[:, None] * (VR[q["c_d1mr"]] - pi_off)
                + (-0.5 * cg12)[:, None] * (VR[q["c_d1pr"]] - pi_off)
            )
            r = jnp.where(q["c_valid"][:, None], r, 0.0)
            Rf = Rf.at[q["c_row"]].add(r)

            # junction rows
            vals = VR[q["l_stencil_r"]]                     # (L, K, 2)
            rl = jnp.sum(q["l_weight"][..., None] * vals, axis=1)
            if with_offsets:
                rl = rl - q["l_rhs"]
            rl = jnp.where(q["l_valid"][:, None], rl, 0.0)
            Rf = Rf.at[q["l_row"]].add(rl)

            # sliding rows (y only)
            ry = Vf[q["s_row"], 1] - Vf[q["s_nb"], 1]
            ry = jnp.where(q["s_valid"], ry, 0.0)
            Rf = Rf.at[q["s_row"], 1].add(ry)

            return jnp.where(free_mask.reshape(-1, 2), Rf, 0.0).reshape(Vl.shape)

        def diag(q, baseXl, baseR, interior_mask, free_mask):
            g11, _, g22 = _metrics(
                baseXl[:, :-2, 1:-1], baseXl[:, 2:, 1:-1],
                baseXl[:, 1:-1, :-2], baseXl[:, 1:-1, 2:],
            )
            d = jnp.pad(-2.0 * g22 - 2.0 * g11, ((0, 0), (1, 1), (1, 1)))
            df = jnp.broadcast_to(d[..., None], d.shape + (2,)).reshape(-1, 2)
            baseF = baseXl.reshape(-1, 2)
            cg11, _, cg22 = _metrics(
                baseF[q["c_g0m"]], baseF[q["c_g0p"]], baseF[q["c_in0"]],
                baseR[q["c_in1r"]] - q["c_pi"],
            )
            # masked scatter-adds (duplicate-safe w.r.t. padded dummy rows)
            dc0 = (-2.0 * cg22 - 2.0 * cg11)[:, None]
            dc = jnp.broadcast_to(dc0, (dc0.shape[0], 2))
            df = df.at[q["c_row"]].add(
                jnp.where(q["c_valid"][:, None], dc - df[q["c_row"]], 0.0))
            nlap = jnp.sum(q["l_weight"] != 0.0, axis=1).astype(df.dtype)
            dl0 = (-(nlap - 1))[:, None]
            dl = jnp.broadcast_to(dl0, (dl0.shape[0], 2))
            df = df.at[q["l_row"]].add(
                jnp.where(q["l_valid"][:, None], dl - df[q["l_row"]], 0.0))
            df = df.at[q["s_row"], 1].add(
                jnp.where(q["s_valid"], 1.0 - df[q["s_row"], 1], 0.0))
            free = free_mask.reshape(-1, 2)
            return jnp.where(free & (df != 0.0), df, 1.0)

        def solve(q, Xl, cfl, interior_mask, free_mask, rows_l, cols_l):
            """One linearized solve on the sharded state."""
            from ..smoothing.krylov import (
                restarted_gmres, thomas, build_line_precond,
                apply_line_precond, build_line_precond_i, apply_line_precond_i)

            gather_ring = make_gather_ring(rows_l, cols_l)
            R0 = gather_ring(Xl)
            baseXl = substitute(q, Xl, R0, with_offsets=True)
            baseR = gather_ring(baseXl)

            diag_field = diag(q, baseXl, baseR, interior_mask, free_mask
                              ).reshape(baseXl.shape)
            dl_j, d_j, du_j = build_line_precond(baseXl, cfl, diag_field,
                                                 interior_mask)
            dl_i, d_i, du_i = build_line_precond_i(baseXl, cfl, diag_field,
                                                   interior_mask)

            # connection-chain tridiagonal factors (local rows)
            baseFl = baseXl.reshape(-1, 2)
            cg11, _, cg22 = _metrics(
                baseFl[q["c_g0m"]], baseFl[q["c_g0p"]], baseFl[q["c_in0"]],
                baseR[q["c_in1r"]] - q["c_pi"])
            cf_row = cfl.reshape(-1, 2)[q["c_row"]]
            Pq = jnp.where(q["c_swap"], cf_row[:, 1], cf_row[:, 0])
            ch_d = -2.0 * cg22 - 2.0 * cg11
            ch_l = cg22 * (1 - 0.5 * Pq)
            ch_u = cg22 * (1 + 0.5 * Pq)
            cseg, cseg_valid = q["cseg"], q["cseg_valid"]
            seg_dl = jnp.where(cseg_valid, ch_l[cseg], 0.0)
            seg_d = jnp.where(cseg_valid, ch_d[cseg], 1.0)
            seg_du = jnp.where(cseg_valid, ch_u[cseg], 0.0)
            chain_rows = q["c_row"][cseg]  # (S, L)

            def overwrite_chains(out_field, vflat):
                rhs = jnp.where(cseg_valid[..., None], vflat[chain_rows], 0.0)
                sol = thomas(seg_dl, seg_d, seg_du, rhs)
                outf = out_field.reshape(-1, 2)
                cur = outf[chain_rows]
                upd = jnp.where(cseg_valid[..., None], sol - cur, 0.0)
                return outf.at[chain_rows].add(upd).reshape(out_field.shape)

            def A(V):
                VR0 = gather_ring(V)
                V = substitute(q, V, VR0, with_offsets=False)
                VR = gather_ring(V)
                return apply_equations(q, baseXl, baseR, cfl, V, VR, False,
                                       interior_mask, free_mask)

            def M_inv(V):
                vflat = V.reshape(-1, 2)
                z1 = apply_line_precond_i(dl_i, d_i, du_i, diag_field,
                                          free_mask, interior_mask, V)
                z1 = overwrite_chains(z1, vflat)
                r = V - A(z1)
                z2 = apply_line_precond(dl_j, d_j, du_j, diag_field,
                                        free_mask, interior_mask, r)
                z2 = overwrite_chains(z2, r.reshape(-1, 2))
                return z1 + z2

            b = -apply_equations(q, baseXl, baseR, cfl, baseXl, baseR, True,
                                 interior_mask, free_mask)

            # row equilibration (see DeviceSmoother._solve_impl)
            inv_row = 1.0 / diag_field

            def A_s(V):
                return inv_row * A(V)

            def M_inv_s(V):
                return M_inv(diag_field * V)

            delta, rn = restarted_gmres(
                A_s, inv_row * b, M_inv_s, dot=pdot,
                rtol=rtol, atol=atol, restart=restart,
                max_restarts=max_restarts,
            )

            X1 = baseXl + jnp.where(free_mask, delta, 0.0)
            R1 = gather_ring(X1)
            X1 = substitute(q, X1, R1, with_offsets=True)
            return X1, rn

        plan_leaves = dataclasses.asdict(self.shard_plan)
        plan_leaves["cseg"] = self.cseg
        plan_leaves["cseg_valid"] = self.cseg_valid
        spec_state = P("b")

        def debug_apply_fn(q, Xl, cfl, Vl, im, fm, rows_l, cols_l):
            gather_ring = make_gather_ring(rows_l, cols_l)
            R0 = gather_ring(Xl)
            baseXl = substitute(q, Xl, R0, with_offsets=True)
            baseR = gather_ring(baseXl)
            b = -apply_equations(q, baseXl, baseR, cfl, baseXl, baseR, True,
                                 im, fm)
            VR0 = gather_ring(Vl)
            Vs = substitute(q, Vl, VR0, with_offsets=False)
            VR = gather_ring(Vs)
            Av = apply_equations(q, baseXl, baseR, cfl, Vs, VR, False, im, fm)
            return b, Av, Vs

        @partial(jax.shard_map, mesh=self.jmesh,
                 in_specs=(spec_state, spec_state, spec_state, spec_state,
                           spec_state, P("b"), P("b"), P("b")),
                 out_specs=(spec_state, spec_state, spec_state),
                 check_vma=False)
        def debug_run(X, cf, V, im, fm, rows, cols, pl):
            q = {k: v[0] for k, v in pl.items()}
            return debug_apply_fn(q, X, cf, V, im, fm, rows, cols)

        def debug_apply(X, cf, V):
            pl = {k: jnp.asarray(v) for k, v in plan_leaves.items()}
            im = jnp.asarray(self.interior_mask)
            fm = jnp.asarray(self.free_mask)
            return debug_run(X, cf, V, im, fm, ring_rows, ring_cols, pl)

        self.debug_apply = debug_apply

        @partial(jax.shard_map, mesh=self.jmesh,
                 in_specs=(spec_state, spec_state, spec_state, spec_state,
                           P("b"), P("b"), P("b")),
                 out_specs=(spec_state, P()),
                 check_vma=False)
        def run(X, cf, im, fm, rows, cols, pl):
            q = {k: v[0] for k, v in pl.items()}  # this device's plan slice
            return solve(q, X, cf, im, fm, rows, cols)

        def outer(X, cf):
            def _as_dev(v):
                v = np.asarray(v)
                if v.dtype == np.int64:
                    v = v.astype(np.int32)
                return jnp.asarray(v)

            pl = {k: _as_dev(v) for k, v in plan_leaves.items()}
            im = jnp.asarray(self.interior_mask)
            fm = jnp.asarray(self.free_mask)
            return run(X, cf, im, fm, ring_rows, ring_cols, pl)

        return outer

    # -------------------------------------------------------------- host API

    def solve(self, coords: np.ndarray, cf: np.ndarray) -> np.ndarray:
        B, N, M = self.B, self.N, self.M
        Xp = np.zeros((B * N * M, 2))
        Xp.reshape(-1, 2)[: self.base_plan.B * N * M][self.scatter_idx] = coords
        cfp = np.zeros((B * N * M, 2))
        cfp.reshape(-1, 2)[: self.base_plan.B * N * M][self.scatter_idx] = cf
        Xout, rn = self._solve_jit(
            jnp.asarray(Xp.reshape(B, N, M, 2)),
            jnp.asarray(cfp.reshape(B, N, M, 2)),
        )
        self.last_linear_residual = float(rn)
        out = np.asarray(Xout).reshape(-1, 2)
        return out[: self.base_plan.B * N * M][self.scatter_idx]
