"""Validate the corner-coupling hypothesis for the V-I contraction tail.

The 80-iteration stationary measurement (tools/mg_contraction.py, scale
2) shows asymptotic rho ~0.988 with the tail 99.97% y-component at block
CORNERS — where interface chains meet junction rows. Hypothesis: the
I-stage's chain-Jacobi (chains solved independently, junction rows by
pointwise Jacobi, no corner coupling) is the bottleneck, not the V-cycle.

Test: run the same stationary iteration with the I-stage replaced by an
EXACT sparse direct solve of the full interface block A[II] (all free
non-INTERIOR rows of the oracle matrix, interior corrections frozen).
If rho drops far below 0.988, a device-side Schur-complement interface
solve (chains + junctions coupled) is the right lever; if not, the
coarse-grid treatment of face rows is at fault.

Usage: python tools/mg_exact_interface_exp.py [scale] [iters]
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


def main(scale=2, iters=40, wall_ds=None):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import Kind, classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem

    if wall_ds is not None:
        # mimic a larger scale's wall anisotropy at this scale's size
        # (same mechanism as tools/mg_contraction.py wall_delta_s)
        import bench as _bench
        import turbomesh_tpu.input as _input_mod

        def build_mesh(s, _ds=wall_ds, _base=os.path.dirname(
                os.path.abspath(_bench.__file__))):
            cfg = {
                "template": {"O4H": {
                    "inlet_distance": 0.05, "outlet_distance": 0.02,
                    "wall_delta_s": _ds,
                    "blade_clustering": {"roberts": {"alpha": 0.5,
                                                     "beta": 1.03}},
                    "num_cells": {
                        "o_grid": 40 * s, "middle_i": 100 * s,
                        "in_up_j": 30 * s, "in_down_j": 10 * s,
                        "in_i": 10 * s, "out_up_j": 40 * s,
                        "out_down_j": 10 * s, "out_i": 10 * s,
                        "down_j": 40 * s, "bulge": 40 * s,
                        "upstream_i": 20 * s, "downstream_i": 10 * s,
                    },
                }},
                "smoothing": {},
                "geometry": {
                    "pitch": 0.08836,
                    "profile": {"csv": {
                        "down_csv_path": "examples/T106/T106_ps.dat",
                        "up_csv_path": "examples/T106/T106_ss.dat",
                    }},
                },
            }
            inp = _input_mod.load(cfg, base_dir=_base)
            return inp.template.run(inp.geometry)

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

    # oracle matrices in GLOBAL space on the same frozen base (slave-
    # substituted coords, matching the device linearization point)
    base_g = coords.copy()
    base_g[info.slave_ids] = (base_g[info.master_ids] + info.slave_offsets)
    sysm = SparseSystem(mesh, info)
    rows_a, cols_a, vals_a, _rhs = sysm.assemble(base_g, cf)
    kind = info.kind
    P = len(kind)
    sl, nb = info.sliding_ids, info.sliding_neighbor_ids

    # fold slave columns onto their masters (device corrections treat
    # slave z == master z)
    col_map = np.arange(P)
    col_map[info.slave_ids] = info.master_ids

    def build_scalar(extra_rows, extra_cols, extra_vals, itf_pts):
        r = np.concatenate([rows_a, extra_rows])
        c = col_map[np.concatenate([cols_a, extra_cols])]
        v = np.concatenate([vals_a, extra_vals])
        A = sp.csr_matrix((v, (r, c)), shape=(P, P))
        A.sum_duplicates()
        A_II = A[itf_pts][:, itf_pts].tocsc()
        return spla.splu(A_II)

    itf_mask_x = (kind == Kind.SMOOTHED) | (kind == Kind.LAPLACIAN)
    itf_mask_y = itf_mask_x | (kind == Kind.SLIDING)
    if os.environ.get("TM_EXACT_JNB", "0") == "1":
        # ENLARGED interface block: also couple each junction's interior
        # stencil neighbors (the junction row's ONLY couplings) exactly.
        # Hypothesis: the junction-dominated stationary tail is the
        # junction <-> first-interior coupling across the V/I splitting,
        # not interface-internal coupling (which measured as a no-op).
        jnb = np.unique(np.concatenate(
            [lp.stencil_ids for lp in info.laplacian_points]
            or [np.empty(0, np.int64)]))
        jnb = jnb[kind[jnb] == Kind.INTERIOR]
        print(f"enlarged block: +{len(jnb)} junction interior neighbors",
              flush=True)
        m2 = np.zeros_like(itf_mask_x)
        m2[jnb] = True
        itf_mask_x = itf_mask_x | m2
        itf_mask_y = itf_mask_y | m2
    itf_x = np.nonzero(itf_mask_x)[0]
    itf_y = np.nonzero(itf_mask_y)[0]
    lu_x = build_scalar(sl, sl, np.ones(len(sl)), itf_x)
    lu_y = build_scalar(np.concatenate([sl, sl]), np.concatenate([sl, nb]),
                        np.concatenate([np.ones(len(sl)),
                                        -np.ones(len(sl))]), itf_y)
    print(f"interface blocks: x {len(itf_x)}, y {len(itf_y)} of {P}",
          flush=True)

    scatter = p.scatter_idx  # global point -> padded flat point
    pad_x, pad_y = scatter[itf_x], scatter[itf_y]

    def exact_interface(r_pad):
        """r_pad (-1, 2) f64 padded residual -> exact interface z."""
        rf = np.asarray(r_pad).reshape(-1, 2)
        z_pad = np.zeros((p.B * p.N * p.M, 2))
        z_pad[pad_x, 0] = lu_x.solve(rf[pad_x, 0])
        z_pad[pad_y, 1] = lu_y.solve(rf[pad_y, 1])
        return z_pad

    free_pad = np.asarray(dev._jnp_plan["free_mask"]).reshape(-1, 2)

    exact_int = os.environ.get("TM_EXACT_INTERIOR", "0") == "1"
    if exact_int:
        # exact INTERIOR+SMOOTHED solve in place of the V-cycle: the
        # pure two-block multiplicative GS rate of the V/I splitting.
        # TM_VSET extends the "interior" block to identify which row
        # class owns the slow V<->I alternation mode (measured 0.994 at
        # scale 2 / wall_ds 6.67e-4 with the plain split):
        #   j  -> + LAPLACIAN junction rows
        #   s  -> + SLIDING rows
        #   js -> both
        vmask = (kind == Kind.INTERIOR) | (kind == Kind.SMOOTHED)
        vset = os.environ.get("TM_VSET", "")
        if "j" in vset:
            vmask |= kind == Kind.LAPLACIAN
        if "s" in vset:
            vmask |= kind == Kind.SLIDING
        vb_pts = np.nonzero(vmask)[0]
        lu_vx = build_scalar(sl, sl, np.ones(len(sl)), vb_pts)
        lu_vy = build_scalar(np.concatenate([sl, sl]),
                             np.concatenate([sl, nb]),
                             np.concatenate([np.ones(len(sl)),
                                             -np.ones(len(sl))]), vb_pts)
        pad_v = scatter[vb_pts]
        print(f"exact interior block: {len(vb_pts)} rows", flush=True)

        def vblock(r_pad):
            rf = np.asarray(r_pad).reshape(-1, 2)
            z_pad = np.zeros((p.B * p.N * p.M, 2))
            z_pad[pad_v, 0] = lu_vx.solve(rf[pad_v, 0])
            z_pad[pad_v, 1] = lu_vy.solve(rf[pad_v, 1])
            return z_pad

    # TM_INTERFACE=prod: the production _interface_passes defect
    # correction in the SAME stationary frame, for a like-for-like
    # comparison against the exact interface solve
    prod_interface = os.environ.get("TM_INTERFACE", "exact") == "prod"

    def step(r):
        # V on interior+faces
        if exact_int:
            z1 = jnp.asarray(vblock(np.asarray(r)) * free_pad)
        else:
            z1 = jnp.asarray(dev._jit_vcycle(plans, ctx,
                                             jnp.asarray(r, jnp.float32)),
                             jnp.float64)
        r1 = r - dev._jit_apply64(plans, baseF, C, z1)
        if prod_interface:
            z2 = jnp.asarray(
                dev._interface_passes(ctx, jnp.asarray(r1, jnp.float32)),
                jnp.float64)
            return z1 + z2
        # exact interface solve on the updated residual
        z2 = exact_interface(np.asarray(r1)) * free_pad
        return z1 + jnp.asarray(z2)

    x = dev._jit_zeros(b)
    r = b
    rn0 = float(dev._jit_norm(r))
    prev = rn0
    rates = []
    for k in range(iters):
        z = step(r)
        x, r, rn_dev = dev._jit_refine(plans, baseF, C, x, z, b)
        rn = float(rn_dev)
        rates.append(rn / prev)
        print(f"iter {k:2d}: |r| = {rn:.3e}  rate {rn / prev:.3f}",
              flush=True)
        prev = rn
        if rn < 1e-13 * rn0:
            break
    print(f"asymptotic contraction ~ {np.mean(rates[-5:]):.3f}")


if __name__ == "__main__":
    _a = sys.argv[1:]
    main(int(_a[0]) if len(_a) > 0 else 2,
         int(_a[1]) if len(_a) > 1 else 40,
         float(_a[2]) if len(_a) > 2 else None)
