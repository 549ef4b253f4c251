"""Extract and characterize the V-I stationary iteration's slow error
mode: run k stationary iterations (power iteration on I - M A), then
solve e = A^-1 r with the sparse oracle to recover the actual ERROR
field, and report its structure (per-block energy, x/y split, spatial
profile along the dominant block). The mode's shape decides the fix:
a per-region near-constant y => deflation/coarse space; an oscillatory
face mode => smoother work; a wall-layer mode => semi-coarsening.

Usage: python tools/mg_slow_mode.py [scale] [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# honor an explicit JAX_PLATFORMS request (the axon sitecustomize
# re-pins the platform at plugin registration, so env alone is not
# enough — same pattern as tests/conftest.py)
import os as _os  # noqa: E402
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def main(scale=2, iters=60):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import Kind, classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem

    mesh = build_mesh(scale)
    info = classify(mesh)
    dev = DeviceSmoother(mesh, info)
    p = dev.plan
    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()
    X = jnp.asarray(p.pad_coords(coords).reshape(p.B, p.N, p.M, 2))
    C = jnp.asarray(p.pad_cf(cf).reshape(p.B, p.N, p.M, 2))
    plans = dev._plans_arg
    baseF, b = dev._jit_base(plans, X, C)
    ctx = dev._jit_prepare32(plans, baseF, C)

    x = dev._jit_zeros(b)
    r = b
    for k in range(iters):
        r_s = dev._jit_equil(plans, ctx, r)[0]
        z = dev._jit_Ms(plans, ctx, r_s)
        x, r, rn = dev._jit_refine(plans, baseF, C, x, z, b)
    print(f"after {iters} stationary iters: |r| = {float(rn):.3e}",
        flush=True)

    # oracle solve on the same frozen base for the true error shape
    base_g = coords.copy()
    base_g[info.slave_ids] = base_g[info.master_ids] + info.slave_offsets
    sysm = SparseSystem(mesh, info)
    rows_a, cols_a, vals_a, _ = sysm.assemble(base_g, cf)
    kind = info.kind
    P = len(kind)
    sl, nb = info.sliding_ids, info.sliding_neighbor_ids
    col_map = np.arange(P)
    col_map[info.slave_ids] = info.master_ids

    rf = np.asarray(r).reshape(-1, 2)
    rg = np.zeros((P, 2))
    rg = rf[p.scatter_idx]

    e = np.zeros((P, 2))
    for comp, extra in ((0, (sl, sl, np.ones(len(sl)))),
                        (1, (np.concatenate([sl, sl]),
                             np.concatenate([sl, nb]),
                             np.concatenate([np.ones(len(sl)),
                                             -np.ones(len(sl))])))):
        # folding slave columns onto masters zeroes the slave static rows
        # (z_s - z_m -> z_m - z_m); re-pin them to identity (rhs is 0
        # there: the device residual lives on free rows only)
        rr = np.concatenate([rows_a, extra[0], info.slave_ids])
        cc = col_map[np.concatenate([cols_a, extra[1]])]
        cc = np.concatenate([cc, info.slave_ids])
        vv = np.concatenate([vals_a, extra[2], np.ones(len(info.slave_ids))])
        A = sp.csr_matrix((vv, (rr, cc)), shape=(P, P))
        A.sum_duplicates()
        # fixed rows already carry identity from assemble's static part
        e[:, comp] = spla.splu(A.tocsc()).solve(rg[:, comp])

    e[info.slave_ids] = e[info.master_ids]
    en = np.abs(e).max()
    print(f"|e|_inf = {en:.3e}, x/y energy split: "
          f"{(e[:, 0] ** 2).sum():.2e} / {(e[:, 1] ** 2).sum():.2e}")

    # per-block structure
    starts = np.cumsum([0] + [bl.points.shape[0] * bl.points.shape[1]
                              for bl in mesh.blocks])
    for bi, bl in enumerate(mesh.blocks):
        ni, nj = bl.points.shape[:2]
        eb = e[starts[bi]:starts[bi + 1]].reshape(ni, nj, 2)
        ey = eb[..., 1]
        frac = (eb ** 2).sum() / (e ** 2).sum()
        if frac < 0.02:
            continue
        print(f"block {bi} ({ni}x{nj}): energy {frac:.3f}, "
              f"|ey|max {np.abs(ey).max():.2e}")
        # y-profile along i at mid j and along j at mid i (normalized)
        prof_i = ey[:, nj // 2] / en
        prof_j = ey[ni // 2, :] / en
        qs = np.linspace(0, 1, 9)
        pi = prof_i[(qs * (ni - 1)).astype(int)]
        pj = prof_j[(qs * (nj - 1)).astype(int)]
        print("  ey(i, j=mid)/|e|: " + " ".join(f"{v:+.2f}" for v in pi))
        print("  ey(i=mid, j)/|e|: " + " ".join(f"{v:+.2f}" for v in pj))
        # sign changes along each direction (oscillatory vs smooth)
        sc_i = int(np.sum(np.abs(np.diff(np.sign(prof_i[np.abs(prof_i) > 1e-3])))) // 2)
        sc_j = int(np.sum(np.abs(np.diff(np.sign(prof_j[np.abs(prof_j) > 1e-3])))) // 2)
        print(f"  sign changes: {sc_i} along i, {sc_j} along j")


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:3]])
