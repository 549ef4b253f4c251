"""Geometric multigrid V-cycle preconditioner for the Winslow system.

Line-implicit (ADI) smoothing alone leaves the smooth error modes of each
block untouched, so Krylov iteration counts grow ~O(N) with block size
(SURVEY.md §7.3 item 6). The fix is the classic structured-grid ladder:
each block is coarsened 2x per level (the padded block stack coarsens as
one batched array), the Winslow operator is rediscretized from the
sampled base coordinates, line smoothers run on every level, and the
correction is prolonged back bilinearly.

Scope: the V-cycle solves the *interior* correction equations of each
block with zero-Dirichlet block boundaries; inter-block coupling
(connection/junction/sliding rows) is handled on the finest level by the
surrounding preconditioner stages and the outer Krylov iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .krylov import build_line_precond, build_line_precond_i, tridiag_solve


def _coarse_size(n: int) -> int:
    return (n - 1) // 2 + 1


class MGLevel(dict):
    """Plain-dict level record (pytree-compatible for jit closure/args)."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key) from None


jax.tree_util.register_pytree_node(
    MGLevel,
    lambda d: (tuple(d[k] for k in sorted(d)), tuple(sorted(d))),
    lambda keys, vals: MGLevel(zip(keys, vals)),
)


def level_ladder(N, M, block_sizes, n_levels=None, min_size=5):
    """Static coarsening ladder: [(N_l, M_l, sizes_l), ...] per level."""
    sizes = list(block_sizes)
    ladder = [(N, M, sizes)]
    while True:
        if (n_levels is not None and len(ladder) >= n_levels) or \
           min(N, M) <= min_size or \
           all(min(ni, nj) <= min_size for ni, nj in sizes):
            break
        N, M = _coarse_size(N), _coarse_size(M)
        sizes = [(_coarse_size(ni), _coarse_size(nj)) for ni, nj in sizes]
        ladder.append((N, M, sizes))
    return ladder


def interior_mask_np(B, N, M, sizes):
    """Host-side interior mask for one level; blocks beyond len(sizes)
    (dummy padding) stay all-False."""
    interior = np.zeros((B, N, M), dtype=bool)
    for b, (ni, nj) in enumerate(sizes):
        if ni >= 3 and nj >= 3:
            interior[b, 1 : ni - 1, 1 : nj - 1] = True
    return interior


def build_levels(base, cf, block_sizes=None, n_levels=None, min_size=5,
                 masks=None):
    """Build the multigrid hierarchy from the padded (B, N, M, 2) base.

    block_sizes: list of (ni, nj) actual block extents at the finest level.
    masks: optional per-level interior masks (each (B, N_l, M_l) bool) —
    pass these instead of block_sizes when the masks must be traced
    operands (e.g. per-device slices inside shard_map).
    """
    B, N, M = base.shape[:3]
    if masks is None:
        ladder = level_ladder(N, M, block_sizes, n_levels, min_size)
        masks = [jnp.asarray(interior_mask_np(B, Nl, Ml, sz))
                 for Nl, Ml, sz in ladder]
    levels = []
    for lvl, interior_j in enumerate(masks):
        if lvl > 0:
            base = base[:, ::2, ::2, :]
            cf = cf[:, ::2, ::2, :]

        x_xi = 0.5 * (base[:, 2:, 1:-1] - base[:, :-2, 1:-1])
        x_eta = 0.5 * (base[:, 1:-1, 2:] - base[:, 1:-1, :-2])
        g11 = jnp.sum(x_xi * x_xi, axis=-1)
        g22 = jnp.sum(x_eta * x_eta, axis=-1)
        d = jnp.pad(-2.0 * (g11 + g22), ((0, 0), (1, 1), (1, 1)))
        diag = jnp.where(interior_j, d, 1.0)
        diag = jnp.where(diag == 0.0, 1.0, diag)

        diag_field = jnp.broadcast_to(diag[..., None], diag.shape + (2,))
        lj = build_line_precond(base, cf, diag_field, interior_j)
        li = build_line_precond_i(base, cf, diag_field, interior_j)

        levels.append(MGLevel(base=base, cf=cf, interior=interior_j,
                              diag=diag, lj=lj, li=li))  # dict subclass

    return levels


def _apply_interior(level: MGLevel, v):
    """Winslow interior stencil at this level (zero outside interior)."""
    base = level.base
    x_xi = 0.5 * (base[:, 2:, 1:-1] - base[:, :-2, 1:-1])
    x_eta = 0.5 * (base[:, 1:-1, 2:] - base[:, 1:-1, :-2])
    g11 = jnp.sum(x_xi * x_xi, axis=-1)[..., None]
    g22 = jnp.sum(x_eta * x_eta, axis=-1)[..., None]
    g12 = jnp.sum(x_xi * x_eta, axis=-1)[..., None]
    P = level.cf[:, 1:-1, 1:-1, 0][..., None]
    Q = level.cf[:, 1:-1, 1:-1, 1][..., None]

    out = (
        (-2.0 * g22 - 2.0 * g11) * v[:, 1:-1, 1:-1]
        + g22 * (1 + 0.5 * P) * v[:, 2:, 1:-1]
        + g22 * (1 - 0.5 * P) * v[:, :-2, 1:-1]
        + g11 * (1 + 0.5 * Q) * v[:, 1:-1, 2:]
        + g11 * (1 - 0.5 * Q) * v[:, 1:-1, :-2]
        - 0.5 * g12 * v[:, 2:, 2:]
        + 0.5 * g12 * v[:, 2:, :-2]
        + 0.5 * g12 * v[:, :-2, 2:]
        - 0.5 * g12 * v[:, :-2, :-2]
    )
    out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.where(level.interior[..., None], out, 0.0)


def _line_solves(level: MGLevel):
    mask = level.interior[..., None]

    def line_j(rr):
        dl, d, du = level.lj
        return jnp.where(mask, tridiag_solve(dl, d, du, rr), 0.0)

    def line_i(rr):
        dl, d, du = level.li
        sol = tridiag_solve(jnp.swapaxes(dl, 1, 2), jnp.swapaxes(d, 1, 2),
                            jnp.swapaxes(du, 1, 2), jnp.swapaxes(rr, 1, 2))
        return jnp.where(mask, jnp.swapaxes(sol, 1, 2), 0.0)

    return line_i, line_j


def _smooth(level: MGLevel, r, z):
    """One alternating **zebra** line-relaxation pass (line Gauss-Seidel in
    red-black line ordering, i-lines then j-lines).

    Undamped alternating line *Jacobi* (the round-1 ADI smoother) is not a
    smoother across lines — its across-line part is undamped point Jacobi,
    whose highest-frequency error modes are merely flipped in sign, never
    reduced. That capped the two-grid rate at ~0.44 on boundary-layer
    blocks even with an exact coarse solve. Zebra relaxation updates one
    line color at a time with fresh residuals, so same-color tridiagonal
    solves are *exact* simultaneously (opposite-color neighbors are frozen)
    and the across-line coupling is Gauss-Seidel — the textbook smoother
    for anisotropic structured operators.

    lj factors couple along the j (last grid) axis and solve in place;
    li factors couple along i and need the axes swapped around the solve.
    """
    mask = level.interior[..., None]
    line_i, line_j = _line_solves(level)
    B, N, M = level.interior.shape
    dt = r.dtype
    odd_i = (jax.lax.broadcasted_iota(jnp.int32, (1, N, 1, 1), 1) % 2).astype(dt)
    odd_j = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, M, 1), 2) % 2).astype(dt)

    # i-direction lines (tridiag along i), colored by j parity
    for par in (0.0, 1.0):
        sel = jnp.where(odd_j == par, 1.0, 0.0)
        res = jnp.where(mask, r - _apply_interior(level, z), 0.0)
        z = z + sel * line_i(res)
    # j-direction lines (tridiag along j), colored by i parity
    for par in (0.0, 1.0):
        sel = jnp.where(odd_i == par, 1.0, 0.0)
        res = jnp.where(mask, r - _apply_interior(level, z), 0.0)
        z = z + sel * line_j(res)
    return z


def _smooth_adi(level: MGLevel, r, z, omega=1.0):
    """One (optionally damped) ADI line-Jacobi pass:
    z += w*Mi^-1 (r - A z) then z += w*Mj^-1 (r - A z). Cheaper than zebra
    (2 residual applies vs 4) but a weaker smoother; kept for experiments."""
    mask = level.interior[..., None]
    line_i, line_j = _line_solves(level)
    z = z + omega * line_i(jnp.where(mask, r - _apply_interior(level, z), 0.0))
    z = z + omega * line_j(jnp.where(mask, r - _apply_interior(level, z), 0.0))
    return z


def _restrict(r, coarse_shape):
    """Full-weighting restriction onto the stride-2 coarse grid."""
    B, Nc, Mc = coarse_shape
    # pad fine so that 2i+1 indexing is valid at the far edge
    rp = jnp.pad(r, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # fine index f = 2c; in padded coords f+1 = 2c+1
    def at(di, dj):
        return rp[:, 1 + di : 1 + di + 2 * Nc - 1 : 2,
                  1 + dj : 1 + dj + 2 * Mc - 1 : 2, :]

    out = (4.0 * at(0, 0)
           + 2.0 * (at(1, 0) + at(-1, 0) + at(0, 1) + at(0, -1))
           + (at(1, 1) + at(1, -1) + at(-1, 1) + at(-1, -1))) / 16.0
    return out


def _prolong(zc, fine_shape):
    """Bilinear prolongation from the stride-2 coarse grid."""
    B, Nf, Mf = fine_shape
    Nc, Mc = zc.shape[1:3]
    z = jnp.zeros((B, Nf, Mf, 2), zc.dtype)
    z = z.at[:, : 2 * Nc - 1 : 2, : 2 * Mc - 1 : 2, :].set(zc)
    # odd i rows: average vertical coarse neighbors
    zi = 0.5 * (z[:, : Nf - 2 : 2, :, :] + z[:, 2::2, :, :])
    z = z.at[:, 1 : Nf - 1 : 2, :, :].set(zi[:, : (Nf - 1) // 2, :, :])
    # odd j cols: average horizontal neighbors (covers diagonals too since
    # odd-i rows are already filled)
    zj = 0.5 * (z[:, :, : Mf - 2 : 2, :] + z[:, :, 2::2, :])
    z = z.at[:, :, 1 : Mf - 1 : 2, :].set(zj[:, :, : (Mf - 1) // 2, :])
    return z


def v_cycle(levels, r, level_idx=0, pre=1, post=1, coarse_iters=4):
    """Multigrid V-cycle solving A z ~= r on the interior (zero-Dirichlet).

    Static recursion — unrolls into a single jittable program.
    """
    level = levels[level_idx]
    mask = level.interior[..., None]
    r = jnp.where(mask, r, 0.0)
    z = jnp.zeros_like(r)

    if level_idx == len(levels) - 1:
        for _ in range(coarse_iters):
            z = _smooth(level, r, z)
        return z

    for _ in range(pre):
        z = _smooth(level, r, z)

    res = jnp.where(mask, r - _apply_interior(level, z), 0.0)
    coarse = levels[level_idx + 1]
    # undivided stencils scale as h^4 (metric terms g ~ h^2 times an
    # undivided second difference ~ h^2), so A_c ~ 16 A_f on smooth modes
    # and the restricted residual needs the factor 16
    rc = 16.0 * _restrict(res, coarse.interior.shape)
    zc = v_cycle(levels, rc, level_idx + 1, pre, post, coarse_iters)
    z = z + jnp.where(mask, _prolong(zc, level.interior.shape), 0.0)

    for _ in range(post):
        z = _smooth(level, r, z)
    return z


class HostVCycle:
    """V-cycle with host-side recursion over per-level jitted kernels.

    The fully-fused V-cycle program is too large for some TPU runtimes'
    compilers; here each level's smoother/residual/transfer compiles as its
    own small program (cached per level shape) and the recursion runs in
    Python. ~6 device calls per level per cycle.
    """

    def __init__(self, levels, pre=1, post=1, coarse_iters=4):
        self.levels = levels
        self.pre = pre
        self.post = post
        self.coarse_iters = coarse_iters
        self._smooth = jax.jit(_smooth)
        self._apply = jax.jit(_apply_interior)
        self._restrict = jax.jit(_restrict, static_argnums=(1,))
        self._prolong = jax.jit(_prolong, static_argnums=(1,))

    def __call__(self, r, lidx: int = 0):
        level = self.levels[lidx]
        mask = level.interior[..., None]
        r = jnp.where(mask, r, 0.0)
        z = jnp.zeros_like(r)

        if lidx == len(self.levels) - 1:
            for _ in range(self.coarse_iters):
                z = self._smooth(level, r, z)
            return z

        for _ in range(self.pre):
            z = self._smooth(level, r, z)
        res = jnp.where(mask, r - self._apply(level, z), 0.0)
        coarse = self.levels[lidx + 1]
        rc = 16.0 * self._restrict(res, tuple(coarse.interior.shape))
        zc = self(rc, lidx + 1)
        z = z + jnp.where(mask, self._prolong(zc, tuple(level.interior.shape)), 0.0)
        for _ in range(self.post):
            z = self._smooth(level, r, z)
        return z


def make_fused_vcycle(levels, pre=1, post=1, coarse_iters=4):
    """One jitted program for the whole V-cycle (slicing/pad ops only —
    compiles reliably where gather/scatter-heavy programs do not)."""

    @jax.jit
    def run(r):
        return v_cycle(levels, r, 0, pre, post, coarse_iters)

    return run


# ---------------------------------------------------------------------------
# Glued multigrid: connection faces participate at every level via ghost
# halos + slave sync (smoothing/glue.py). This is the preconditioner that
# actually damps error modes smooth ACROSS block interfaces — the
# interior-only V-cycle above leaves them to the Krylov iteration.
# ---------------------------------------------------------------------------


def prep_glue_arrays(glue_levels):
    """One-time host-side conversion of glue.GlueLevel records into the
    combined per-level device arrays build_glued_levels consumes.

    The point of materializing these OUTSIDE the jitted programs is that
    callers can then pass them as jit ARGUMENTS (a pytree of device
    buffers) instead of closure constants: a closed-over array is baked
    into the HLO as a literal, and at multi-million-node scale those
    literals dominate compile latency and crash the remote TPU compiler
    outright (measured round 3: prepare32 at 4.5M padded points kills
    the TPU worker; with plans-as-arguments the HLO is mesh-size-
    independent). The dedup below keeps the correction glue a single
    scatter with no write-order ambiguity (sliding entries win over
    plain copies on the same destination)."""
    out = []
    for gl in glue_levels:
        taken = set(gl.cdst.tolist()) | set(gl.jdst.tolist())
        keep = np.array([d not in taken for d in gl.dst], dtype=bool) \
            if len(gl.dst) else np.zeros(0, dtype=bool)
        ga_src = np.concatenate([gl.src[keep], gl.csrc])
        ga_dst = np.concatenate([gl.dst[keep], gl.cdst])
        ga_w = np.concatenate([np.ones((int(keep.sum()), 2)), gl.cw])
        rec = MGLevel(
            smooth_mask=jnp.asarray(gl.smooth_mask),
            gsrc=jnp.asarray(gl.src.astype(np.int32)),
            gdst=jnp.asarray(gl.dst.astype(np.int32)),
            goff=jnp.asarray(gl.off),
            gcsrc=jnp.asarray(ga_src.astype(np.int32)),
            gcdst=jnp.asarray(ga_dst.astype(np.int32)),
            gcw=jnp.asarray(ga_w),
            gjdst=jnp.asarray(gl.jdst.astype(np.int32)),
            gjsrc=jnp.asarray(gl.jsrc.astype(np.int32)),
            gjw=jnp.asarray(gl.jw),
        )
        if gl.li_map is not None:
            # boundary-aligned coarsening maps (glue.GlueLevel docstring);
            # present only on levels where [::2] would misalign, so
            # aligned ladders keep an identical arg pytree (and compile
            # cache entries)
            rec["li_map"] = jnp.asarray(gl.li_map.astype(np.int32))
            rec["lj_map"] = jnp.asarray(gl.lj_map.astype(np.int32))
            rec["pi_lo"] = jnp.asarray(gl.pi_lo.astype(np.int32))
            rec["pi_w"] = jnp.asarray(gl.pi_w)
            rec["pj_lo"] = jnp.asarray(gl.pj_lo.astype(np.int32))
            rec["pj_w"] = jnp.asarray(gl.pj_w)
        out.append(rec)
    return out


#: transfer-map field names for boundary-aligned (non-stride-2) levels
MAP_KEYS = ("li_map", "lj_map", "pi_lo", "pi_w", "pj_lo", "pj_w")


def build_glued_levels(base, cf, glue_levels, glue_fns=None, masks=None,
                       maps=None):
    """Build the glued hierarchy. base/cf: (B, N, M, 2) padded stacks
    (finest); glue_levels: list of prep_glue_arrays dicts (possibly
    traced jit arguments) or of glue.GlueLevel records (host-static,
    converted on the fly — these bake into the program as constants, so
    jitted callers should pre-convert). Level fields are ghost-augmented
    where needed; stencil coefficients use the GLUED base so face-row
    equations couple across blocks.

    glue_fns: optional per-level callables ``fn(v, coord_field) ->
    ghost-augmented array`` replacing the local gather glue — used by the
    sharded path where some glue entries cross devices (ppermute).
    masks: optional per-level smooth masks overriding gl.smooth_mask
    (per-device slices inside shard_map).
    maps: optional per-level boundary-aligned transfer maps (None or a
    dict with MAP_KEYS) overriding the ones carried by glue_levels —
    used by the sharded path, where the per-BLOCK map arrays must be
    per-device slices (traced shard_map operands), not host constants."""
    if glue_fns is None and glue_levels \
            and not isinstance(glue_levels[0], dict):
        glue_levels = prep_glue_arrays(glue_levels)
    levels = []
    for lvl, gl in enumerate(glue_levels):
        if maps is not None:
            mp = maps[lvl]
        elif isinstance(gl, dict) and "li_map" in gl:
            mp = {k: gl[k] for k in MAP_KEYS}
        else:
            mp = None
        im = None if mp is None else mp["li_map"]
        if lvl > 0:
            if im is not None:
                base = _subsample_mapped(base, im, mp["lj_map"])
                cf = _subsample_mapped(cf, im, mp["lj_map"])
            else:
                base = base[:, ::2, ::2, :]
                cf = cf[:, ::2, ::2, :]
        mask = gl["smooth_mask"] if masks is None else masks[lvl]
        if glue_fns is None:
            src, dst = gl["gsrc"], gl["gdst"]
            off = gl["goff"].astype(base.dtype)
            csrc, cdst = gl["gcsrc"], gl["gcdst"]
            cw = gl["gcw"].astype(base.dtype)
            jdst, jsrc = gl["gjdst"], gl["gjsrc"]
            jw = gl["gjw"].astype(base.dtype)
        else:
            src = dst = jnp.zeros((0,), jnp.int32)
            off = jnp.zeros((0, 2), base.dtype)
            csrc = cdst = jdst = jnp.zeros((0,), jnp.int32)
            cw = jnp.zeros((0, 2), base.dtype)
            jsrc = jnp.zeros((0, 1), jnp.int32)
            jw = jnp.zeros((0, 1), base.dtype)

        glue_fn = None if glue_fns is None else glue_fns[lvl]
        baseg = _glue_apply(base, src, dst, off, True, glue_fn)
        # glued metrics over the whole block region (faces included)
        x_xi = 0.5 * (baseg[:, 2:, 1:-1] - baseg[:, :-2, 1:-1])
        x_eta = 0.5 * (baseg[:, 1:-1, 2:] - baseg[:, 1:-1, :-2])
        g11 = jnp.sum(x_xi * x_xi, axis=-1)
        g22 = jnp.sum(x_eta * x_eta, axis=-1)
        diag = jnp.where(mask, -2.0 * (g11 + g22), 1.0)
        diag = jnp.where(diag == 0.0, 1.0, diag)

        P = cf[..., 0]
        Q = cf[..., 1]
        c_jp1 = g11 * (1 + 0.5 * Q)
        c_jm1 = g11 * (1 - 0.5 * Q)
        c_ip1 = g22 * (1 + 0.5 * P)
        c_im1 = g22 * (1 - 0.5 * P)
        lj = (jnp.where(mask, c_jm1, 0.0), diag, jnp.where(mask, c_jp1, 0.0))
        li = (jnp.where(mask, c_im1, 0.0), diag, jnp.where(mask, c_ip1, 0.0))

        rec = MGLevel(baseg=baseg, cf=cf, interior=mask,
                      diag=diag, lj=lj, li=li,
                      gsrc=src, gdst=dst,
                      gcsrc=csrc, gcdst=cdst, gcw=cw,
                      gjdst=jdst, gjsrc=jsrc, gjw=jw)
        if im is not None:
            # transfer maps for the boundary-aligned (non-stride-2)
            # levels: li/lj_map drive _restrict_glued's gathers, p*_lo/_w
            # drive _prolong_mapped (both relative to the PARENT level)
            for key in MAP_KEYS:
                rec[key] = mp[key]
        levels.append(rec)
    return levels


def _glue_apply(v, src, dst, off, coord_field, glue_fn):
    if glue_fn is not None:
        return glue_fn(v, coord_field)
    return _glue_pad(v, src, dst, off, coord_field)


def _glue_pad(v, src, dst, off, coord_field=False):
    """Pad (B, N, M, C) with one ghost ring and apply the glue map."""
    vg = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shape = vg.shape
    vf = vg.reshape(-1, v.shape[-1])
    vals = vf[src]
    if coord_field:
        vals = vals + off
    return vf.at[dst].set(vals).reshape(shape)


def _glue_correction(level: MGLevel, v, glue_fn=None):
    """Glue a CORRECTION field: ghost halos + slave copies, plus the
    correction-only embeddings (glue.py GlueLevel.c*/j*): junction
    masters take the mean of their members' interior-neighbor
    corrections (the junction row's exact solve for r=0), and sliding
    points copy the y-correction of their level-local first interior
    neighbor (x forced to 0). This makes the V-cycle's interior
    relaxation see consistent boundary corrections instead of
    Dirichlet-0 walls — the interior<->sliding/junction block
    Gauss-Seidel those walls induce was the measured bottleneck of the
    whole Krylov iteration. All copies + junction means are ONE
    gather + ONE scatter over a statically deduplicated map (values
    read the pre-scatter field: copy sources are interior/first-
    interior points the scatter never writes). Never apply to
    coordinate or residual fields."""
    if glue_fn is not None:
        return glue_fn(v, False)
    vg = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shape = vg.shape
    vf = vg.reshape(-1, v.shape[-1])
    vals = level.gcw * vf[level.gcsrc]
    dst = level.gcdst
    if level.gjdst.shape[0]:
        jvals = jnp.sum(level.gjw[..., None] * vf[level.gjsrc], axis=1)
        vals = jnp.concatenate([vals, jvals], axis=0)
        dst = jnp.concatenate([dst, level.gjdst], axis=0)
    return vf.at[dst].set(vals, unique_indices=True).reshape(shape)


def _apply_glued(level: MGLevel, v, glue_fn=None):
    """Winslow stencil over the glued field; rows = smooth mask
    (interior + SMOOTHED connection faces). v is a correction field."""
    baseg = level.baseg
    vg = _glue_correction(level, v, glue_fn)
    x_xi = 0.5 * (baseg[:, 2:, 1:-1] - baseg[:, :-2, 1:-1])
    x_eta = 0.5 * (baseg[:, 1:-1, 2:] - baseg[:, 1:-1, :-2])
    g11 = jnp.sum(x_xi * x_xi, axis=-1)[..., None]
    g22 = jnp.sum(x_eta * x_eta, axis=-1)[..., None]
    g12 = jnp.sum(x_xi * x_eta, axis=-1)[..., None]
    P = level.cf[..., 0][..., None]
    Q = level.cf[..., 1][..., None]

    out = (
        (-2.0 * g22 - 2.0 * g11) * vg[:, 1:-1, 1:-1]
        + g22 * (1 + 0.5 * P) * vg[:, 2:, 1:-1]
        + g22 * (1 - 0.5 * P) * vg[:, :-2, 1:-1]
        + g11 * (1 + 0.5 * Q) * vg[:, 1:-1, 2:]
        + g11 * (1 - 0.5 * Q) * vg[:, 1:-1, :-2]
        - 0.5 * g12 * vg[:, 2:, 2:]
        + 0.5 * g12 * vg[:, 2:, :-2]
        + 0.5 * g12 * vg[:, :-2, 2:]
        - 0.5 * g12 * vg[:, :-2, :-2]
    )
    return jnp.where(level.interior[..., None], out, 0.0)


def _use_zebra_pallas(level: MGLevel) -> bool:
    """Run the fused Pallas zebra kernel for this level? Static decision
    at trace time: TPU backend, f32 data, and the level's planes fit the
    kernel's VMEM budget. TURBOMESH_PALLAS=0 opts out."""
    import os

    from ..ops.zebra import (pallas_forced_off, pallas_service_ok,
                             zebra_kernel_ok, zebra_supported, zebra_variant)

    if pallas_forced_off():  # instance-scoped degradation (device.py)
        return False

    # TURBOMESH_PALLAS: "0" forces off, "1" forces on (past the probes),
    # unset = AUTO — enable when the backend is TPU and the production
    # kernel variant passes a one-time tiny-shape compile probe.  The
    # default Thomas variant avoids the PCR dataflow that crashes this
    # tunneled runtime's Mosaic ("failed to legalize 'func.return'",
    # minimal reproducers in ops/zebra.py's history); on runtimes where
    # even that fails, the probe cleanly falls back to the XLA zebra
    # expression.  Kernel semantics are interpreter-pinned either way
    # (tests/test_zebra.py).
    gate = os.environ.get("TURBOMESH_PALLAS", "auto")
    if gate == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if "baseg" not in level or level.baseg.dtype != jnp.float32:
        return False
    B, N, M = level.interior.shape
    if not zebra_supported(B, N + 2, M + 2):
        return False
    if gate == "1":
        return True
    return pallas_service_ok() and zebra_kernel_ok(zebra_variant())


def _smooth_glued_pallas(level: MGLevel, r, z, directions="ij", glue_fn=None):
    """Pallas-fused zebra pass: one kernel launch per (direction, color)
    half-sweep instead of ~50 XLA ops (ops/zebra.py)."""
    from ..ops.zebra import zebra_pass, zebra_variant

    B, N, M = level.interior.shape
    dt = r.dtype

    def pad1(a, v):
        return jnp.pad(a, ((0, 0), (1, 1), (1, 1)), constant_values=v)

    bx, by = level.baseg[..., 0], level.baseg[..., 1]
    cfp, cfq = pad1(level.cf[..., 0], 0.0), pad1(level.cf[..., 1], 0.0)
    rx, ry = pad1(r[..., 0], 0.0), pad1(r[..., 1], 0.0)
    mask = pad1(level.interior.astype(dt), 0.0)
    odd_i = (jax.lax.broadcasted_iota(jnp.int32, (1, N + 2, 1), 1) + 1) % 2
    odd_j = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, M + 2), 2) + 1) % 2
    odd_i = jnp.broadcast_to(odd_i, mask.shape).astype(dt)
    odd_j = jnp.broadcast_to(odd_j, mask.shape).astype(dt)

    lj = tuple(pad1(a, v) for a, v in zip(level.lj, (0.0, 1.0, 0.0)))
    li = tuple(pad1(a, v) for a, v in zip(level.li, (0.0, 1.0, 0.0)))

    passes = []
    if "i" in directions:  # lines along i, colored by j parity
        passes += [(li, 0, odd_j, 0.0), (li, 0, odd_j, 1.0)]
    if "j" in directions:  # lines along j, colored by i parity
        passes += [(lj, 1, odd_i, 0.0), (lj, 1, odd_i, 1.0)]

    for (dl, d, du), axis, odd, par in passes:
        zg = _glue_correction(level, z, glue_fn)
        sel = mask * jnp.where(odd == par, 1.0, 0.0)
        zx, zy = zebra_pass(bx, by, cfp, cfq, dl, d, du, mask, sel,
                            rx, ry, zg[..., 0], zg[..., 1], axis=axis,
                            use_pallas=jax.default_backend() == "tpu",
                            variant=zebra_variant())
        z = jnp.stack([zx[:, 1:-1, 1:-1], zy[:, 1:-1, 1:-1]], axis=-1)
        # the glue wrote master values into slave rows of zg; corrections
        # live on smoothed rows only (the glue re-syncs them each apply)
        z = jnp.where(level.interior[..., None], z, 0.0)
    return z


def _smooth_glued(level: MGLevel, r, z, directions="ij", glue_fn=None):
    """Zebra line relaxation over the glued mesh (same scheme as _smooth,
    with glued residuals so face rows relax coupled). ``directions``
    selects which line sweeps run: "ij" = alternating (4 residual applies
    + 4 line solves), "i" or "j" = single direction (half the cost —
    pair a "j" pre-smoother with an "i" post-smoother for an alternating
    cycle at half the per-smooth price)."""
    if _use_zebra_pallas(level):
        return _smooth_glued_pallas(level, r, z, directions, glue_fn)
    mask = level.interior[..., None]

    def line_j(rr):
        dl, d, du = level.lj
        return jnp.where(mask, tridiag_solve(dl, d, du, rr), 0.0)

    def line_i(rr):
        dl, d, du = level.li
        sol = tridiag_solve(jnp.swapaxes(dl, 1, 2), jnp.swapaxes(d, 1, 2),
                            jnp.swapaxes(du, 1, 2), jnp.swapaxes(rr, 1, 2))
        return jnp.where(mask, jnp.swapaxes(sol, 1, 2), 0.0)

    B, N, M = level.interior.shape
    dt = r.dtype
    odd_i = (jax.lax.broadcasted_iota(jnp.int32, (1, N, 1, 1), 1) % 2).astype(dt)
    odd_j = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, M, 1), 2) % 2).astype(dt)

    if "i" in directions:
        for par in (0.0, 1.0):
            sel = jnp.where(odd_j == par, 1.0, 0.0)
            res = jnp.where(mask, r - _apply_glued(level, z, glue_fn), 0.0)
            z = z + sel * line_i(res)
    if "j" in directions:
        for par in (0.0, 1.0):
            sel = jnp.where(odd_i == par, 1.0, 0.0)
            res = jnp.where(mask, r - _apply_glued(level, z, glue_fn), 0.0)
            z = z + sel * line_j(res)
    return z


def _subsample_mapped(a, im, jm):
    """Per-block gather subsample of a (B, N, M, C) stack with the
    boundary-aligned lattice maps im (B, Nc) / jm (B, Mc)."""
    a = jnp.take_along_axis(a, im[:, :, None, None], axis=1, mode="clip")
    return jnp.take_along_axis(a, jm[:, None, :, None], axis=2, mode="clip")


def _prolong_mapped(zc, fine_shape, plo_i, pw_i, plo_j, pw_j):
    """Linear prolongation along per-block bracketing maps (the
    boundary-aligned generalization of _prolong; identical values on
    stride-2 aligned lattices)."""
    B, Nf, Mf = fine_shape
    nc_i = zc.shape[1]
    wi = pw_i.astype(zc.dtype)[:, :, None, None]
    z1 = (jnp.take_along_axis(zc, plo_i[:, :, None, None], 1, mode="clip")
          * (1.0 - wi)
          + jnp.take_along_axis(zc, jnp.minimum(plo_i + 1, nc_i - 1)
                                [:, :, None, None], 1, mode="clip") * wi)
    nc_j = zc.shape[2]
    wj = pw_j.astype(zc.dtype)[:, None, :, None]
    z2 = (jnp.take_along_axis(z1, plo_j[:, None, :, None], 2, mode="clip")
          * (1.0 - wj)
          + jnp.take_along_axis(z1, jnp.minimum(plo_j + 1, nc_j - 1)
                                [:, None, :, None], 2, mode="clip") * wj)
    return z2


def _restrict_glued(level: MGLevel, r, coarse, glue_fn=None):
    """Full-weighting restriction using glued residual ghosts, so the
    stencil at a face point weights the partner block's residuals.
    ``coarse`` is the coarse MGLevel: when it carries boundary-aligned
    lattice maps the 3x3 stencil gathers at the mapped parent ordinals
    instead of stride-2 slicing (same weights)."""
    B, Nc, Mc = coarse.interior.shape
    rp = _glue_apply(r, level.gsrc, level.gdst, None, False, glue_fn)
    im = coarse.get("li_map")

    if im is None:
        def at(di, dj):
            return rp[:, 1 + di : 1 + di + 2 * Nc - 1 : 2,
                      1 + dj : 1 + dj + 2 * Mc - 1 : 2, :]
    else:
        jm = coarse["lj_map"]
        rows = {di: jnp.take_along_axis(
                    rp, (im + 1 + di)[:, :, None, None], axis=1,
                    mode="clip")
                for di in (-1, 0, 1)}

        def at(di, dj):
            return jnp.take_along_axis(
                rows[di], (jm + 1 + dj)[:, None, :, None], axis=2,
                mode="clip")

    out = (4.0 * at(0, 0)
           + 2.0 * (at(1, 0) + at(-1, 0) + at(0, 1) + at(0, -1))
           + (at(1, 1) + at(1, -1) + at(-1, 1) + at(-1, -1))) / 16.0
    return out


def v_cycle_glued(levels, r, level_idx=0, pre=1, post=1, coarse_iters=4,
                  pre_dirs="ij", post_dirs="ij", glue_fns=None):
    """Glued multigrid V-cycle (static recursion, one jittable program)."""
    level = levels[level_idx]
    gfn = None if glue_fns is None else glue_fns[level_idx]
    mask = level.interior[..., None]
    r = jnp.where(mask, r, 0.0)
    z = jnp.zeros_like(r)

    if level_idx == len(levels) - 1:
        for _ in range(coarse_iters):
            z = _smooth_glued(level, r, z, glue_fn=gfn)
        return z

    for _ in range(pre):
        z = _smooth_glued(level, r, z, pre_dirs, glue_fn=gfn)

    res = jnp.where(mask, r - _apply_glued(level, z, gfn), 0.0)
    coarse = levels[level_idx + 1]
    rc = 16.0 * _restrict_glued(level, res, coarse, gfn)
    zc = v_cycle_glued(levels, rc, level_idx + 1, pre, post, coarse_iters,
                       pre_dirs, post_dirs, glue_fns)
    if coarse.get("pi_lo") is not None:
        zf = _prolong_mapped(zc, level.interior.shape,
                             coarse["pi_lo"], coarse["pi_w"],
                             coarse["pj_lo"], coarse["pj_w"])
    else:
        zf = _prolong(zc, level.interior.shape)
    z = z + jnp.where(mask, zf, 0.0)

    for _ in range(post):
        z = _smooth_glued(level, r, z, post_dirs, glue_fn=gfn)
    return z
