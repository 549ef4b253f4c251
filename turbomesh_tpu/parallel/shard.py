"""Block-sharded multi-chip elliptic smoothing via shard_map + collectives.

The structured-grid analog of spatial/context parallelism (SURVEY.md §2,
§5.7-5.8): mesh blocks are sharded across TPU chips on a 1-D device mesh
axis ``'b'``. Cross-block references (connection-partner stencils, junction
stencils, slave masters) are exchanged **point-to-point** with
``jax.lax.ppermute``: for every active device offset ``o`` each device
gathers exactly the values its offset-``o`` neighbor needs and sends one
packed chunk over ICI, so per-device communication volume is proportional
to that device's shared perimeter — independent of the total block count
(the round-1 ``all_gather`` ring broadcast was O(B x perimeter) per
device). Reductions (GMRES dot products) ride ``psum``.

The linear solve is restarted f64 GMRES preconditioned by the same
multiplicative V-I composition as the single-chip DeviceSmoother: an f32
GLUED multigrid V-cycle (smoothing/glue.py maps split into same-device
gathers and per-level ppermute exchanges, so connection faces relax
coupled across devices at every level), an f32 residual update (one halo
exchange), and the interface solve (local connection-chain tridiagonals
+ Jacobi junction/sliding rows).

This replaces the serial reference's global sparse solve
(smooth.zig:277-1166); there is no reference counterpart to the
distribution itself (the reference is single-threaded; its MPI linkage is
sequential-only, petsc_shim.c:6).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JMesh, PartitionSpec as P

from ..smoothing.classify import BoundaryInfo
from ..smoothing.device import build_plan, _metrics



@dataclasses.dataclass
class Exchange:
    """Static point-to-point exchange schedule.

    For each active ring offset ``o`` (0 = same-device gather), device
    ``s`` sends the values of its local flat indices ``send_idx[o][s]``
    to device ``(s+o) % D``; the receiver concatenates the chunks in
    offset order into a value table VAL, and every remote reference reads
    VAL at a precomputed position.
    """

    offsets: list          # active offsets, ascending, 0 first if present
    send_idx: dict         # o -> (D, L_o) int array of sender-local flats
    lengths: dict          # o -> L_o
    base: dict             # o -> start of o's chunk within VAL
    total: int             # VAL length


class _ExchangeBuilder:
    """Accumulates remote references (vectorized — no per-point Python);
    slot assignment is deferred to finalize(), which dedupes per
    (receiving device, ring offset) with one np.unique per group. All
    positions() calls must precede the single finalize()."""

    def __init__(self, D, Bl, N, M):
        self.D, self.Bl, self.N, self.M = D, Bl, N, M
        self._dev, self._off, self._lf = [], [], []
        self._n = 0
        self._val_pos = None

    def positions(self, own_dev, refs):
        """own_dev: (R,) receiving device per row; refs: (R,) global padded
        flat indices. Returns (R,) provisional handles for resolve()."""
        refs = np.asarray(refs, dtype=np.int64).ravel()
        own_dev = np.broadcast_to(
            np.asarray(own_dev, dtype=np.int64), refs.shape)
        NM = self.N * self.M
        blk = refs // NM
        self._dev.append(own_dev.copy())
        self._off.append((own_dev - blk // self.Bl) % self.D)
        self._lf.append((blk % self.Bl) * NM + refs % NM)
        start, self._n = self._n, self._n + len(refs)
        return np.arange(start, self._n, dtype=np.int64)

    def finalize(self):
        D = self.D
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.empty(0, np.int64))
        dev, off, lf = cat(self._dev), cat(self._off), cat(self._lf)
        offsets = sorted(set(off.tolist())) or [0]
        self._val_pos = np.zeros(len(lf), dtype=np.int64)
        lengths, base, send_idx, acc = {}, {}, {}, 0
        for o in offsets:
            sel_o = off == o
            uniq = [np.unique(lf[sel_o & (dev == d)]) for d in range(D)]
            L = max((len(u) for u in uniq), default=0) or 1
            lengths[o], base[o] = L, acc
            buf = np.zeros((D, L), dtype=np.int64)
            for s in range(D):
                u = uniq[(s + o) % D]
                buf[s, : len(u)] = u
            send_idx[o] = buf
            for d in range(D):
                rows = np.nonzero(sel_o & (dev == d))[0]
                if len(rows):
                    self._val_pos[rows] = acc + np.searchsorted(
                        uniq[d], lf[rows])
            acc += L
        return Exchange(offsets=offsets, send_idx=send_idx,
                        lengths=lengths, base=base, total=acc)

    def resolve(self, ex: Exchange, provisional):
        """(R,) provisional handles -> (R,) VAL positions."""
        return self._val_pos[np.asarray(provisional, dtype=np.int64)]


@dataclasses.dataclass
class ShardPlanArrays:
    """Per-device plan arrays, stacked over devices (leading axis D) and
    padded to the max row count; `*_valid` masks mark real rows. ``*_v``
    fields index the exchanged value table VAL."""

    # connection middle rows
    c_row: np.ndarray; c_g0m: np.ndarray; c_g0p: np.ndarray; c_in0: np.ndarray
    c_d0m: np.ndarray; c_d0p: np.ndarray
    c_in1v: np.ndarray; c_d1mv: np.ndarray; c_d1pv: np.ndarray
    c_pi: np.ndarray; c_swap: np.ndarray; c_valid: np.ndarray
    # junction rows (stencil via VAL)
    l_row: np.ndarray; l_stencil_v: np.ndarray; l_weight: np.ndarray
    l_rhs: np.ndarray; l_valid: np.ndarray
    # sliding rows (local)
    s_row: np.ndarray; s_nb: np.ndarray; s_valid: np.ndarray
    # slave substitution (master via stage-S VAL)
    sl_row: np.ndarray; sl_master_v: np.ndarray; sl_off: np.ndarray
    sl_valid: np.ndarray


class ShardedSmoother:
    """Multi-device drop-in for DeviceSmoother.solve.

    Blocks are padded to a common (N, M) and distributed over `n_devices`
    (B must divide evenly after dummy-block padding).
    """

    def __init__(self, mesh, info: BoundaryInfo, n_devices: int | None = None,
                 devices=None, rtol: float = 1e-12, atol: float = 1e-14,
                 restart: int = 30, max_restarts: int = 400,
                 mg_opts: dict | None = None):
        if devices is None:
            devices = jax.devices()
            if n_devices is not None:
                devices = devices[:n_devices]
        from ..smoothing.device import DeviceSmoother, ensure_compilation_cache

        ensure_compilation_cache()
        self.devices = devices
        D = len(devices)
        self.rtol, self.atol = rtol, atol
        self.restart, self.max_restarts = restart, max_restarts
        self.mg_opts = dict(DeviceSmoother.MG_DEFAULTS, **(mg_opts or {}))
        _schur = self.mg_opts.get("schur")
        if _schur is None:
            _schur = os.environ.get("TURBOMESH_SCHUR", "1") == "1"
        self._schur = bool(_schur)

        # sharded path keeps logical storage (transpose=False): its shard
        # plans, halo schedules and glue splits are built in the logical
        # frame; the single-chip DeviceSmoother carries the transposed
        # layout (see device.build_plan)
        plan = build_plan(mesh, info, transpose=False)
        self.base_plan = plan
        self._mesh = mesh
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

        sizes = [blk.size for blk in mesh.blocks]
        self.block_sizes = sizes
        self.scatter_idx = plan.scatter_idx  # into (B0*N*M); B padding appended after

        # per-block bilinear deflation basis (DeviceSmoother._defl_*):
        # kills the global smooth near-null modes (sliding-BC y-float)
        # that cap the V-I stationary contraction at ~0.99. Columns are
        # block-partitioned, so W^T r is a local contraction + one
        # all_gather and W alpha a local expansion of this device's
        # slice; dummy padding blocks get keep=0 (identity Galerkin rows).
        import os as _os

        defl = _os.environ.get("TURBOMESH_DEFLATION", "") or "0"
        self._defl_comps = {"y": (1,), "xy": (0, 1)}.get(defl, ())
        Cc = max(len(self._defl_comps), 1)
        dfu = np.zeros((B, N, 2))
        dfv = np.zeros((B, M, 2))
        dkeep = np.zeros((B, 2, 2, Cc))
        for b, (ni, nj) in enumerate(sizes):
            u = np.linspace(0.0, 1.0, ni)
            v = np.linspace(0.0, 1.0, nj)
            dfu[b, :ni, 0] = 1.0 - u
            dfu[b, :ni, 1] = u
            dfv[b, :nj, 0] = 1.0 - v
            dfv[b, :nj, 1] = v
            for pp in range(2):
                for qq in range(2):
                    hat = dfu[b, :, pp][:, None] * dfv[b, :, qq][None, :]
                    for ci, c in enumerate(self._defl_comps):
                        if np.any(hat * free[b, :, :, c]):
                            dkeep[b, pp, qq, ci] = 1.0
        self._defl_arrays = (dfu.reshape(D, self.Bl, N, 2),
                             dfv.reshape(D, self.Bl, M, 2),
                             dkeep.reshape(D, self.Bl, 2, 2, Cc))
        self._defl_K = B * 2 * 2 * Cc if self._defl_comps else 0

        # glued multigrid ladder: smooth masks (interior + SMOOTHED faces)
        # padded to B blocks; glue maps split into local / cross-device.
        # keep_boundaries: boundary-aligned coarse lattices — with plain
        # [::2] lattices any block axis of even lattice length loses its
        # far boundary at the next level and the coarse Dirichlet moves
        # up to 2^level cells inside the block (the near-total V-I
        # preconditioner stall measured single-chip at 5.4M nodes; see
        # glue.build_glue). The per-BLOCK transfer maps ride shard_map
        # as per-device operand slices (mg_maps below).
        from ..smoothing.glue import build_glue

        self.glue_levels = build_glue(mesh, info, N, M,
                                      keep_boundaries=True)
        self.mg_masks = []
        self.mg_maps = []   # per level: None | dict of per-block arrays
        for gl in self.glue_levels:
            m = np.zeros((B, gl.N, gl.M), dtype=bool)
            m[:B0] = gl.smooth_mask
            self.mg_masks.append(m)
            if gl.li_map is None:
                self.mg_maps.append(None)
            else:
                def padB(a):
                    out = np.zeros((B,) + a.shape[1:], dtype=a.dtype)
                    out[:B0] = a
                    return out

                self.mg_maps.append(dict(
                    li_map=padB(gl.li_map), lj_map=padB(gl.lj_map),
                    pi_lo=padB(gl.pi_lo), pi_w=padB(gl.pi_w),
                    pj_lo=padB(gl.pj_lo), pj_w=padB(gl.pj_w)))

        self._build_shard_plans(mesh, info)
        self._build_glue_plans()

        self.jmesh = JMesh(np.array(devices), ("b",))
        from ..smoothing.device import device_jit
        self._solve_jit = device_jit(self._make_solver())

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
            """padded flat -> owning-device local flat."""
            b, i, j = pad_to_bij(padded_idx)
            lb = b % Bl
            return (lb * N + i) * M + j

        # owning device per row
        c_dev = pad_to_bij(plan.c_row)[0] // Bl
        l_dev = (pad_to_bij(plan.l_row)[0] // Bl if len(plan.l_row)
                 else np.empty(0, np.int64))
        s_dev = (pad_to_bij(plan.s_row)[0] // Bl if len(plan.s_row)
                 else np.empty(0, np.int64))
        sl_dev = (pad_to_bij(plan.sl_row)[0] // Bl if len(plan.sl_row)
                  else np.empty(0, np.int64))

        # stage-S exchange: slave masters (raw field values)
        bS = _ExchangeBuilder(D, Bl, N, M)
        sl_prov = bS.positions(sl_dev, plan.sl_master)
        self.ex_S = bS.finalize()
        sl_master_v = bS.resolve(self.ex_S, sl_prov)

        # stage-F exchange: stencil references (substituted field values)
        bF = _ExchangeBuilder(D, Bl, N, M)
        c_in1_p = bF.positions(c_dev, plan.c_in1)
        c_d1m_p = bF.positions(c_dev, plan.c_d1m)
        c_d1p_p = bF.positions(c_dev, plan.c_d1p)
        K = plan.l_stencil.shape[1] if plan.l_stencil.ndim == 2 else 1
        l_st_p = [bF.positions(l_dev, plan.l_stencil[:, k]) for k in range(K)] \
            if len(plan.l_row) else []
        self.ex_F = bF.finalize()
        c_in1v = bF.resolve(self.ex_F, c_in1_p)
        c_d1mv = bF.resolve(self.ex_F, c_d1m_p)
        c_d1pv = bF.resolve(self.ex_F, c_d1p_p)
        l_st_v = (np.stack([bF.resolve(self.ex_F, pk) for pk in l_st_p], axis=1)
                  if len(plan.l_row) else np.empty((0, K), np.int64))

        c_row_b = pad_to_bij(plan.c_row)[0]
        (c_arr, c_valid) = self._split_pad_stack(
            c_row_b,
            [to_local(plan.c_row), to_local(plan.c_g0m), to_local(plan.c_g0p),
             to_local(plan.c_in0), to_local(plan.c_d0m), to_local(plan.c_d0p),
             c_in1v, c_d1mv, c_d1pv,
             plan.c_pi, plan.c_swap_pq],
            D,
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0.0, False],
        )

        l_row_b = pad_to_bij(plan.l_row)[0] if len(plan.l_row) else np.empty(0, np.int64)
        (l_arr, l_valid) = self._split_pad_stack(
            l_row_b,
            [to_local(plan.l_row) if len(plan.l_row) else np.empty(0, np.int64),
             l_st_v, plan.l_weight, plan.l_rhs],
            D,
            [0, 0, 0.0, 0.0],
        )

        s_row_b = pad_to_bij(plan.s_row)[0] if len(plan.s_row) else np.empty(0, np.int64)
        (s_arr, s_valid) = self._split_pad_stack(
            s_row_b,
            [to_local(plan.s_row) if len(plan.s_row) else np.empty(0, np.int64),
             to_local(plan.s_nb) if len(plan.s_nb) else np.empty(0, np.int64)],
            D,
            [0, 0],
        )

        sl_row_b = pad_to_bij(plan.sl_row)[0] if len(plan.sl_row) else np.empty(0, np.int64)
        (sl_arr, sl_valid) = self._split_pad_stack(
            sl_row_b,
            [to_local(plan.sl_row) if len(plan.sl_row) else np.empty(0, np.int64),
             sl_master_v,
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
            c_in1v=c_arr[6], c_d1mv=c_arr[7], c_d1pv=c_arr[8],
            c_pi=c_arr[9], c_swap=c_arr[10], c_valid=c_valid,
            l_row=l_arr[0], l_stencil_v=l_arr[1], l_weight=l_arr[2],
            l_rhs=l_arr[3], l_valid=l_valid,
            s_row=s_arr[0], s_nb=s_arr[1], s_valid=s_valid,
            sl_row=sl_arr[0], sl_master_v=sl_arr[1], sl_off=sl_arr[2],
            sl_valid=sl_valid,
        )

    def _build_glue_plans(self):
        """Split each multigrid level's glue map (smoothing/glue.py) into
        same-device entries (local gather in ghost space) and cross-device
        entries (ppermute exchange of the referenced region values)."""
        D, Bl = self.D, self.Bl
        self.glue_local = []   # per level: (arrays, valid)
        self.glue_cross = []   # per level: (arrays, valid)
        self.glue_ex = []      # per level: Exchange

        for gl in self.glue_levels:
            Ng, Mg = gl.N + 2, gl.M + 2
            NgMg = Ng * Mg
            src_b = gl.src // NgMg
            dst_b = gl.dst // NgMg
            same = (src_b // Bl) == (dst_b // Bl)

            def ghost_local(g):
                return (g // NgMg % Bl) * NgMg + g % NgMg

            (larr, lvalid) = self._split_pad_stack(
                dst_b[same],
                [ghost_local(gl.src[same]), ghost_local(gl.dst[same]),
                 gl.off[same]],
                D, [0, 0, 0.0])

            # cross-device: sources are in-region points of remote blocks;
            # ship them as region-flat values via a per-level exchange
            cross = ~same
            bx = _ExchangeBuilder(D, Bl, gl.N, gl.M)
            if np.any(cross):
                gsrc = gl.src[cross]
                b = gsrc // NgMg
                rem = gsrc % NgMg
                i = rem // Mg - 1
                j = rem % Mg - 1
                region_global = (b * gl.N + i) * gl.M + j
                prov = bx.positions(dst_b[cross] // Bl, region_global)
                ex = bx.finalize()
                pos = bx.resolve(ex, prov)
            else:
                ex = bx.finalize()
                pos = np.empty(0, np.int64)
            (xarr, xvalid) = self._split_pad_stack(
                dst_b[cross],
                [ghost_local(gl.dst[cross]), pos, gl.off[cross]],
                D, [0, 0, 0.0])

            self.glue_local.append((larr, lvalid))
            self.glue_cross.append((xarr, xvalid))
            self.glue_ex.append(ex)

    # ---------------------------------------------------------------- kernels

    def _make_solver(self):
        N, M, B, Bl, D = self.N, self.M, self.B, self.Bl, self.D
        restart = self.restart
        rtol, atol = self.rtol, self.atol
        max_restarts = self.max_restarts
        ex_S, ex_F = self.ex_S, self.ex_F
        n_mg_levels = len(self.mg_masks)

        def make_exchange(ex: Exchange, send_slices):
            """send_slices: {o: (L_o,) per-device local flat indices}."""
            def exchange(Xf):
                """Xf: (Bl*N*M, C) local flat field -> VAL (total, C)."""
                chunks = []
                for o in ex.offsets:
                    ch = Xf[send_slices[o]]
                    if o != 0:
                        perm = [(d, (d + o) % D) for d in range(D)]
                        ch = jax.lax.ppermute(ch, "b", perm)
                    chunks.append(ch)
                return jnp.concatenate(chunks, axis=0)
            return exchange

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b), "b")

        def substitute(q, Xl, VS, with_offsets):
            # masked scatter-ADD of (new - cur): padded dummy rows (index 0)
            # may collide with real rows, and duplicate-index scatter-set has
            # undefined write order; add with a zero contribution is safe.
            Xf = Xl.reshape(-1, 2)
            off = q["sl_off"].astype(Xf.dtype)
            new = VS[q["sl_master_v"]] + (off if with_offsets else 0.0)
            cur = Xf[q["sl_row"]]
            delta = jnp.where(q["sl_valid"][:, None], new - cur, 0.0)
            return Xf.at[q["sl_row"]].add(delta).reshape(Xl.shape)

        def apply_equations(q, baseXl, baseV, cfl, Vl, VV, with_offsets,
                            interior_mask, free_mask):
            """Residual over local free components. baseXl/baseV frozen;
            Vl local values (slaves already substituted), VV its stage-F
            exchange table."""
            dt = Vl.dtype
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
            c_pi = q["c_pi"].astype(dt)

            # connection rows (exact reference layout, smooth.zig:994-1105)
            pi_off = c_pi if with_offsets else jnp.zeros_like(c_pi)
            im1_j = baseF[q["c_g0m"]]; ip1_j = baseF[q["c_g0p"]]
            i_jm1 = baseF[q["c_in0"]]; i_jp1 = baseV[q["c_in1v"]] - c_pi
            cg11, cg12, cg22 = _metrics(im1_j, ip1_j, i_jm1, i_jp1)
            cf_row = cfl.reshape(-1, 2)[q["c_row"]]
            Pq = jnp.where(q["c_swap"], cf_row[:, 1], cf_row[:, 0])
            Qq = jnp.where(q["c_swap"], cf_row[:, 0], cf_row[:, 1])
            r = (
                (-2.0 * cg22 - 2.0 * cg11)[:, None] * Vf[q["c_row"]]
                + (cg22 * (1 + 0.5 * Pq))[:, None] * Vf[q["c_g0p"]]
                + (cg22 * (1 - 0.5 * Pq))[:, None] * Vf[q["c_g0m"]]
                + (cg11 * (1 - 0.5 * Qq))[:, None] * Vf[q["c_in0"]]
                + (cg11 * (1 + 0.5 * Qq))[:, None] * (VV[q["c_in1v"]] - pi_off)
                + (-0.5 * cg12)[:, None] * Vf[q["c_d0m"]]
                + (0.5 * cg12)[:, None] * Vf[q["c_d0p"]]
                + (0.5 * cg12)[:, None] * (VV[q["c_d1mv"]] - pi_off)
                + (-0.5 * cg12)[:, None] * (VV[q["c_d1pv"]] - pi_off)
            )
            r = jnp.where(q["c_valid"][:, None], r, 0.0)
            Rf = Rf.at[q["c_row"]].add(r)

            # junction rows
            vals = VV[q["l_stencil_v"]]                    # (L, K, 2)
            rl = jnp.sum(q["l_weight"].astype(dt)[..., None] * vals, axis=1)
            if with_offsets:
                rl = rl - q["l_rhs"].astype(dt)
            rl = jnp.where(q["l_valid"][:, None], rl, 0.0)
            Rf = Rf.at[q["l_row"]].add(rl)

            # sliding rows (y only)
            ry = Vf[q["s_row"], 1] - Vf[q["s_nb"], 1]
            ry = jnp.where(q["s_valid"], ry, 0.0)
            Rf = Rf.at[q["s_row"], 1].add(ry)

            return jnp.where(free_mask.reshape(-1, 2), Rf, 0.0).reshape(Vl.shape)

        def diag(q, baseXl, baseV, interior_mask, free_mask):
            g11, _, g22 = _metrics(
                baseXl[:, :-2, 1:-1], baseXl[:, 2:, 1:-1],
                baseXl[:, 1:-1, :-2], baseXl[:, 1:-1, 2:],
            )
            d = jnp.pad(-2.0 * g22 - 2.0 * g11, ((0, 0), (1, 1), (1, 1)))
            df = jnp.broadcast_to(d[..., None], d.shape + (2,)).reshape(-1, 2)
            baseF = baseXl.reshape(-1, 2)
            cg11, _, cg22 = _metrics(
                baseF[q["c_g0m"]], baseF[q["c_g0p"]], baseF[q["c_in0"]],
                baseV[q["c_in1v"]] - q["c_pi"],
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

        glue_ex = self.glue_ex

        def make_glue_fn(lvl, q):
            """Per-level glue closure: local ghost/slave gathers + one
            ppermute exchange for cross-device entries."""
            ex = glue_ex[lvl]
            exch = make_exchange(ex, {o: q[f"sendGL{lvl}_{o}"]
                                      for o in ex.offsets})
            lsrc, ldst, loff = (q[f"glL{lvl}_src"], q[f"glL{lvl}_dst"],
                                q[f"glL{lvl}_off"])
            lval = q[f"glL{lvl}_valid"]
            xdst, xpos, xoff = (q[f"glX{lvl}_dst"], q[f"glX{lvl}_pos"],
                                q[f"glX{lvl}_off"])
            xval = q[f"glX{lvl}_valid"]

            def glue(v, coord_field=False):
                dt = v.dtype
                vg = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
                shape = vg.shape
                vf = vg.reshape(-1, v.shape[-1])
                val = vf[lsrc]
                if coord_field:
                    val = val + loff.astype(dt)
                vf = vf.at[ldst].add(
                    jnp.where(lval[:, None], val - vf[ldst], 0.0))
                VAL = exch(v.reshape(-1, v.shape[-1]))
                val2 = VAL[xpos]
                if coord_field:
                    val2 = val2 + xoff.astype(dt)
                vf = vf.at[xdst].add(
                    jnp.where(xval[:, None], val2 - vf[xdst], 0.0))
                return vf.reshape(shape)

            return glue

        def solve(q, Xl, cfl, interior_mask, free_mask, mg_masks, mg_maps):
            """One linearized solve on the sharded state."""
            from ..smoothing.krylov import (restarted_fgmres, thomas,
                                            gauss_solve_f64)
            from ..smoothing.multigrid import build_glued_levels, v_cycle_glued

            exchange_S = make_exchange(ex_S, {o: q[f"sendS{o}"]
                                              for o in ex_S.offsets})
            exchange_F = make_exchange(ex_F, {o: q[f"sendF{o}"]
                                              for o in ex_F.offsets})

            VS0 = exchange_S(Xl.reshape(-1, 2))
            baseXl = substitute(q, Xl, VS0, with_offsets=True)
            baseV = exchange_F(baseXl.reshape(-1, 2))

            diag_field = diag(q, baseXl, baseV, interior_mask, free_mask
                              ).reshape(baseXl.shape)

            # f32 preconditioner context: GLUED MG levels (local blocks
            # gather locally, cross-device interfaces exchange via
            # ppermute at every level) + connection-chain factors
            baseX32 = baseXl.astype(jnp.float32)
            baseV32 = baseV.astype(jnp.float32)
            cf32 = cfl.astype(jnp.float32)
            diag32 = diag_field.astype(jnp.float32)
            glue_fns = [make_glue_fn(lvl, q)
                        for lvl in range(len(glue_ex))]
            levels = build_glued_levels(baseX32, cf32, self.glue_levels,
                                        glue_fns=glue_fns,
                                        masks=list(mg_masks),
                                        maps=list(mg_maps))

            baseF32 = baseX32.reshape(-1, 2)
            cg11, _, cg22 = _metrics(
                baseF32[q["c_g0m"]], baseF32[q["c_g0p"]], baseF32[q["c_in0"]],
                baseV32[q["c_in1v"]] - q["c_pi"].astype(jnp.float32))
            cf_row = cf32.reshape(-1, 2)[q["c_row"]]
            Pq = jnp.where(q["c_swap"], cf_row[:, 1], cf_row[:, 0])
            ch_d = -2.0 * cg22 - 2.0 * cg11
            ch_l = cg22 * (1 - 0.5 * Pq)
            ch_u = cg22 * (1 + 0.5 * Pq)
            cseg, cseg_valid = q["cseg"], q["cseg_valid"]
            seg_dl = jnp.where(cseg_valid, ch_l[cseg], 0.0)
            seg_d = jnp.where(cseg_valid, ch_d[cseg], 1.0)
            seg_du = jnp.where(cseg_valid, ch_u[cseg], 0.0)
            chain_rows = q["c_row"][cseg]  # (S, L)

            def A_any(V):
                """Linear operator at V's dtype (f64 outer / f32 inner)."""
                VS = exchange_S(V.reshape(-1, 2))
                V = substitute(q, V, VS, with_offsets=False)
                VV = exchange_F(V.reshape(-1, 2))
                return apply_equations(
                    q, baseXl.astype(V.dtype),
                    baseV.astype(V.dtype), cfl.astype(V.dtype), V, VV, False,
                    interior_mask, free_mask)

            def interface32(V):
                """Chains tridiag + Jacobi on non-interior free rows (f32)."""
                vflat = V.reshape(-1, 2)
                inv_diag = 1.0 / diag32
                z = jnp.where(interior_mask[..., None], 0.0, V * inv_diag)
                z = jnp.where(free_mask, z, 0.0)
                rhs = jnp.where(cseg_valid[..., None], vflat[chain_rows], 0.0)
                sol = thomas(seg_dl, seg_d, seg_du, rhs)
                zf = z.reshape(-1, 2)
                cur = zf[chain_rows]
                upd = jnp.where(cseg_valid[..., None], sol - cur, 0.0)
                zf = zf.at[chain_rows].add(upd)
                # sliding rows last, reading the UPDATED neighbor: exact
                # row solve z_s = r + z_nb (see DeviceSmoother.
                # _stage_interface — the Jacobi form stalled the V-I
                # contraction at 0.94+ on BC-corner rows). Sliding rows
                # and their neighbors are device-local; masked add keeps
                # padded dummy rows inert.
                for _ in range(2):
                    zy = vflat[q["s_row"], 1] + zf[q["s_nb"], 1]
                    dlt = jnp.where(q["s_valid"],
                                    zy - zf[q["s_row"], 1], 0.0)
                    zf = zf.at[q["s_row"], 1].add(dlt)
                z = zf.reshape(z.shape)
                return jnp.where(free_mask, z, 0.0)

            def interface_passes(rr):
                """Defect-correction iteration of the interface solve
                (DeviceSmoother._interface_passes): extra passes on the
                updated residual Gauss-Seidel the junction <-> chain <->
                sliding coupling that a single pass never resolves —
                measured as 75.6% of the scale-15 V-I stationary tail at
                LAPLACIAN junction rows. One A apply (with its halo
                exchange) per extra pass."""
                z = interface32(rr)
                dz = z
                for _ in range(int(self.mg_opts.get(
                        "interface_passes", 2)) - 1):
                    # subtract A of the LAST increment, not the running
                    # total (matches DeviceSmoother._interface_passes —
                    # the running-total form double-counts for >= 3)
                    rr = rr - A_any(dz)
                    dz = interface32(rr)
                    z = z + dz
                return z

            # coarse-space deflation (DeviceSmoother._defl_*): columns
            # are block-partitioned, so each device contracts/expands its
            # own block slice; one all_gather assembles the K-vector and
            # the K x K Galerkin solve runs replicated.
            K = self._defl_K
            if K:
                dfu32 = q["dfu"].astype(jnp.float32)
                dfv32 = q["dfv"].astype(jnp.float32)
                free32 = free_mask

                def defl_Wt(v):
                    vm = jnp.where(free32, v, 0.0)
                    outs = []
                    for c in self._defl_comps:
                        t = jnp.einsum("bnp,bnm->bpm", dfu32, vm[..., c])
                        outs.append(jnp.einsum("bpm,bmq->bpq", t, dfv32))
                    loc = jnp.stack(outs, axis=-1)  # (Bl, 2, 2, C)
                    return jax.lax.all_gather(loc, "b").reshape(-1)

                def defl_W(alpha):
                    Cc = len(self._defl_comps)
                    a = alpha.reshape(D, self.Bl, 2, 2, Cc)
                    a = jax.lax.dynamic_index_in_dim(
                        a, jax.lax.axis_index("b"), keepdims=False)
                    z = jnp.zeros(free_mask.shape, jnp.float32)
                    for ci, c in enumerate(self._defl_comps):
                        t = jnp.einsum("bpq,bnp->bnq", a[..., ci], dfu32)
                        f = jnp.einsum("bnq,bmq->bnm", t, dfv32)
                        z = z.at[..., c].set(f)
                    return jnp.where(free32, z, 0.0)

                keep = jax.lax.all_gather(
                    q["dkeep"].astype(jnp.float32), "b").reshape(-1)
                eye = jnp.eye(K, dtype=jnp.float32)

                def gcol(e):
                    return defl_Wt(A_any(defl_W(e)))

                # K x K algebra in f64, no ridge, and a weighted
                # line-search safeguard on the correction — same
                # rationale as DeviceSmoother._defl_apply (raw Galerkin
                # on this nonsymmetric A can inject corrections whose
                # image dwarfs the residual outside the coarse space).
                dG = jax.lax.map(gcol, eye).T.astype(jnp.float64)
                keep64 = keep.astype(jnp.float64)
                dG = dG * keep64[:, None] * keep64[None, :] \
                    + jnp.diag(1.0 - keep64)
                dD = jax.lax.rsqrt(jnp.abs(jnp.diagonal(dG))
                                   + jnp.float64(1e-300))
                dG = dG * dD[:, None] * dD[None, :]

            def M_inv(V):
                """f32 multiplicative composition (DeviceSmoother
                _stage_Minv): coarse-space deflation solve, glued V-cycle
                over interior + SMOOTHED face rows, residual update (one
                halo exchange), interface chain/Jacobi solve."""
                v32 = V.astype(jnp.float32)
                if K:
                    rhs = defl_Wt(v32).astype(jnp.float64) * dD
                    # NOT jnp.linalg.solve: f64 LuDecomposition doesn't
                    # lower on TPU (smoothing.krylov.gauss_solve_f64)
                    alpha = dD * gauss_solve_f64(dG, rhs)
                    z0 = defl_W(alpha.astype(jnp.float32))
                    Az0 = A_any(z0)
                    wv = (inv_row * v32).astype(jnp.float64)
                    wz = (inv_row * Az0).astype(jnp.float64)
                    t = (pdot(wv, wz)
                         / (pdot(wz, wz) + jnp.float64(1e-300))
                         ).astype(jnp.float32)
                    z0 = t * z0
                    v32 = v32 - t * Az0
                else:
                    z0 = 0.0
                smooth0 = levels[0].interior[..., None]
                if self._schur:
                    # interface elimination (DeviceSmoother._stage_Minv
                    # schur branch): e = A_JJ^-1 v_J; feed the V-cycle
                    # the Schur right-hand side v - A e so the interior
                    # solve sees the interface movement in the same
                    # application instead of alternating with it
                    e = interface32(v32)
                    v_eff = v32 - A_any(e)
                    z = v_cycle_glued(levels,
                                      jnp.where(smooth0, v_eff, 0.0),
                                      glue_fns=glue_fns)
                    z = jnp.where(smooth0 & free_mask, z, 0.0) + e
                else:
                    z = v_cycle_glued(levels, jnp.where(smooth0, v32, 0.0),
                                      glue_fns=glue_fns)
                    z = jnp.where(smooth0 & free_mask, z, 0.0)
                rr = v32 - A_any(z)
                z = z0 + z + interface_passes(rr)
                return z.astype(V.dtype)

            b = -apply_equations(q, baseXl, baseV, cfl, baseXl, baseV, True,
                                 interior_mask, free_mask)

            # row equilibration + dual stop test, matching
            # DeviceSmoother._solve_impl; FGMRES because the f32
            # preconditioner varies between applications
            inv_row = 1.0 / diag_field

            def A_s(V):
                return inv_row * A_any(V)

            def M_inv_s(V):
                return M_inv(diag_field * V)

            tol2 = jnp.maximum(rtol * jnp.sqrt(pdot(b, b)), atol)
            delta, rn, nrestarts = restarted_fgmres(
                A_s, inv_row * b, M_inv_s, dot=pdot,
                rtol=rtol, atol=atol, restart=restart,
                max_restarts=max_restarts,
                w2=diag_field, tol2=tol2, return_restarts=True,
            )

            X1 = baseXl + jnp.where(free_mask, delta, 0.0)
            VS1 = exchange_S(X1.reshape(-1, 2))
            X1 = substitute(q, X1, VS1, with_offsets=True)
            return X1, rn, nrestarts

        plan_leaves = dataclasses.asdict(self.shard_plan)
        plan_leaves["cseg"] = self.cseg
        plan_leaves["cseg_valid"] = self.cseg_valid
        plan_leaves["dfu"], plan_leaves["dfv"], plan_leaves["dkeep"] = \
            self._defl_arrays
        for o in self.ex_S.offsets:
            plan_leaves[f"sendS{o}"] = self.ex_S.send_idx[o]
        for o in self.ex_F.offsets:
            plan_leaves[f"sendF{o}"] = self.ex_F.send_idx[o]
        for lvl, (ex, (larr, lvalid), (xarr, xvalid)) in enumerate(
                zip(self.glue_ex, self.glue_local, self.glue_cross)):
            for o in ex.offsets:
                plan_leaves[f"sendGL{lvl}_{o}"] = ex.send_idx[o]
            plan_leaves[f"glL{lvl}_src"] = larr[0]
            plan_leaves[f"glL{lvl}_dst"] = larr[1]
            plan_leaves[f"glL{lvl}_off"] = larr[2]
            plan_leaves[f"glL{lvl}_valid"] = lvalid
            plan_leaves[f"glX{lvl}_dst"] = xarr[0]
            plan_leaves[f"glX{lvl}_pos"] = xarr[1]
            plan_leaves[f"glX{lvl}_off"] = xarr[2]
            plan_leaves[f"glX{lvl}_valid"] = xvalid
        spec_state = P("b")
        mg_specs = tuple(P("b") for _ in self.mg_masks)
        # transfer-map pytree: None levels vanish as pytree leaves, so a
        # single P("b") prefix spec shards every per-block map array on
        # the device axis
        map_specs = tuple(P("b") for _ in self.mg_maps)

        @partial(jax.shard_map, mesh=self.jmesh,
                 in_specs=(spec_state, spec_state, spec_state,
                           spec_state, P("b"), mg_specs, map_specs),
                 out_specs=(spec_state, P(), P()),
                 check_vma=False)
        def run(X, cf, im, fm, pl, mg_masks, mg_maps):
            q = {k: v[0] for k, v in pl.items()}  # this device's plan slice
            return solve(q, X, cf, im, fm, list(mg_masks), list(mg_maps))

        def outer(X, cf):
            def _as_dev(v):
                v = np.asarray(v)
                if v.dtype == np.int64:
                    v = v.astype(np.int32)
                return jnp.asarray(v)

            pl = {k: _as_dev(v) for k, v in plan_leaves.items()}
            im = jnp.asarray(self.interior_mask)
            fm = jnp.asarray(self.free_mask)
            mg = tuple(jnp.asarray(m) for m in self.mg_masks)
            mp = tuple(
                None if m is None else {k: _as_dev(v) for k, v in m.items()}
                for m in self.mg_maps)
            return run(X, cf, im, fm, pl, mg, mp)

        return outer

    # -------------------------------------------------------------- host API

    def _pad_global(self, field: np.ndarray):
        """(P, 2) global-space field -> (B, N, M, 2) padded device stack."""
        B, N, M = self.B, self.N, self.M
        buf = np.zeros((B * N * M, 2))
        buf[: self.base_plan.B * N * M][self.scatter_idx] = field
        return jnp.asarray(buf.reshape(B, N, M, 2))

    def _unpad(self, stack) -> np.ndarray:
        out = np.asarray(stack).reshape(-1, 2)
        return out[: self.base_plan.B * self.N * self.M][self.scatter_idx]

    def solve(self, coords: np.ndarray, cf: np.ndarray) -> np.ndarray:
        Xout, rn, nrestarts = self._solve_jit(self._pad_global(coords),
                                              self._pad_global(cf))
        self.last_linear_residual = float(rn)
        #: FGMRES restart cycles of the last solve (iterations =
        #: restarts * restart) — the multi-chip scaling artifact records
        #: this staying flat as n_devices grows
        self.last_restarts = int(nrestarts)
        return self._unpad(Xout)

    def run(self, coords: np.ndarray, cf: np.ndarray, iterations: int,
            algorithm=None, start_iteration: int = 0,
            target_residual: float | None = None,
            residual_history: list | None = None,
            restart_history: list | None = None,
            checkpoint_cb=None, checkpoint_every: int = 10):
        """Device-resident sharded Picard loop: the coordinate stack
        stays SHARDED across iterations (out_specs P('b') keeps the
        solve's output distributed; passing it straight back in avoids
        any gather), the White control-function update runs as a jitted
        program over the sharded global array (XLA partitions it — the
        update touches only wall-block rows once per iteration), and one
        scalar pair crosses to the host per iteration. The multi-chip
        counterpart of DeviceSmoother.run (reference outer loop:
        smooth.zig:104-153); full fields leave the devices only at
        checkpoints and once at the end.

        Returns (coords, cf, last_displacement_residual, iterations_run).
        """
        import logging

        from ..smoothing.control_function import make_device_update
        from ..smoothing.device import device_jit
        from ..smoothing.krylov import _warn_nonconverged

        log = logging.getLogger("turbomesh.smoothing")
        upd = (make_device_update(algorithm, self._mesh, self.base_plan)
               if algorithm is not None else None)
        disp_fn = device_jit(lambda a, b2: jnp.sum((a - b2) ** 2))

        X = self._pad_global(coords)
        C = self._pad_global(cf)
        disp = np.inf
        n_done = start_iteration
        for n in range(start_iteration, iterations):
            log.info("iteration: %d", n)
            if n > 0 and upd is not None:
                C = upd(X, C)
            Xn, rn, nrestarts = self._solve_jit(X, C)
            # padded lanes are zero in both fields, so the padded sum
            # equals the global-space displacement norm (smooth.zig:136)
            d2 = float(disp_fn(Xn, X))
            disp = d2 * d2
            X = Xn
            self.last_linear_residual = rn = float(rn)
            self.last_restarts = int(nrestarts)
            if self.last_restarts >= self.max_restarts:
                _warn_nonconverged("sharded fgmres",
                                   self.restart * self.max_restarts, rn,
                                   self.atol)
            log.info("\tresidual: %.6e", disp)
            if residual_history is not None:
                residual_history.append(disp)
            if restart_history is not None:
                restart_history.append(self.last_restarts)
            n_done = n + 1
            if target_residual is not None and disp < target_residual:
                log.info("converged: residual %.3e < target %.3e at "
                         "iteration %d", disp, target_residual, n)
                break
            if checkpoint_cb is not None and n_done % checkpoint_every == 0:
                checkpoint_cb(self._unpad(X), self._unpad(C), n_done)

        return self._unpad(X), self._unpad(C), disp, n_done
