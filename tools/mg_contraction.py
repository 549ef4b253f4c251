"""Measure the V-I preconditioned stationary contraction and localize
the residual tail (ROADMAP item 1 / VERDICT r3 'what's weak' #2).

Runs the stationary iteration x += M^-1 (b - A x) with the production
f32 preconditioner (glued multigrid V-cycle + interface solve,
DeviceSmoother._stage_Minv) on the equilibrated system and reports:

- per-iteration residual contraction (the asymptotic rate is what caps
  the Krylov iteration count: rho ~ 0.86 costs ~15 iters/digit, 0.5
  costs ~3.3),
- where the tail residual concentrates after k iterations: wall layers
  (first W wall-normal cells of the O-grid block), connection/junction/
  sliding rows, or bulk interior — this decides WHICH lever to pull
  (semi-coarsening targets wall-anisotropic interiors; interface work
  targets connection rows).

Usage: python tools/mg_contraction.py [scale] [iters] [wall_delta_s]
  JAX_PLATFORMS=cpu works (f32 pieces compile fast on CPU); on TPU run
  it alone (one process per chip).
"""

import os
import sys
import time

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


def main(scale=2, iters=25, wall_delta_s=None):
    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother

    t0 = time.perf_counter()
    mesh = build_mesh(scale)
    if wall_delta_s is not None:
        # rebuild with overridden wall clustering to mimic a larger
        # scale's anisotropy at this scale's size
        import bench

        orig = bench.build_mesh.__defaults__
        cfg_fn = bench.build_mesh

        def build2(s):
            import turbomesh_tpu.input as input_mod

            # reproduce bench.build_mesh's config with wall_delta_s forced
            base = os.path.dirname(os.path.abspath(bench.__file__))
            cfg = {
                "template": {"O4H": {
                    "inlet_distance": 0.05, "outlet_distance": 0.02,
                    "wall_delta_s": wall_delta_s,
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
            inp = input_mod.load(cfg, base_dir=base)
            return inp.template.run(inp.geometry)

        mesh = build2(scale)
        del orig, cfg_fn
    info = classify(mesh)
    dev = DeviceSmoother(mesh, info)
    p = dev.plan
    print(f"mesh: {mesh.num_points} nodes, padded {p.B}x{p.N}x{p.M}, "
          f"built in {time.perf_counter() - t0:.1f} s", flush=True)

    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()
    X = jnp.asarray(p.pad_coords(coords).reshape(p.B, p.N, p.M, 2))
    C = jnp.asarray(p.pad_cf(cf).reshape(p.B, p.N, p.M, 2))

    plans = dev._plans_arg
    baseF, b = dev._jit_base(plans, X, C)
    ctx = dev._jit_prepare32(plans, baseF, C)

    # equilibrated stationary iteration with the f32 V-I preconditioner:
    # x += Ms(D^-1 r) where Ms acts on EQUILIBRATED residuals (it
    # multiplies by row_diag before the f32 V-I, matching host_fgmres's
    # preconditioned frame)
    x = dev._jit_zeros(b)
    r = b
    rn0 = float(dev._jit_norm(r))
    rates = []
    prev = rn0
    for k in range(iters):
        r_s = dev._jit_equil(plans, ctx, r)[0]  # D^-1 r
        z = dev._jit_Ms(plans, ctx, r_s)        # f32 V-I
        # x += z ; r = b - A x  — reuse the refine stage for the update
        x, r, rn_dev = dev._jit_refine(plans, baseF, C, x, z, b)
        rn = float(rn_dev)
        rates.append(rn / prev)
        prev = rn
        print(f"iter {k:2d}: |r| = {rn:.3e}  rate {rates[-1]:.3f}",
              flush=True)
        if rn < 1e-13 * rn0:
            break

    asym = float(np.median(rates[-5:]))
    print(f"asymptotic contraction ~ {asym:.3f} "
          f"({-1.0 / np.log10(max(asym, 1e-12)):.1f} iters/digit)")

    # ---- localize the tail ----
    rf = np.asarray(r).reshape(p.B, p.N, p.M, 2)
    kind_pad = np.full(p.B * p.N * p.M, -1, dtype=np.int8)
    kind_pad[p.scatter_idx] = info.kind
    kind_pad = kind_pad.reshape(p.B, p.N, p.M)
    r2 = (rf ** 2).sum(-1)

    from turbomesh_tpu.smoothing.classify import Kind

    total = r2.sum()
    print("tail residual distribution (|r|^2 fractions):")
    for kd in Kind:
        frac = r2[kind_pad == kd].sum() / total
        print(f"  {kd.name:9s}: {frac:.4f}")
    # wall layers: rows within W cells of a boundary j=0 wall of block 0
    # (the O-grid block in the O4H template; storage frame)
    W = 8
    print(f"  o-grid wall {W:2d}: {r2[0, :, :W].sum() / total:.4f} "
          "(subset of INTERIOR)")
    # x vs y component split of the tail
    rx2 = (rf[..., 0] ** 2).sum()
    print(f"  x-component  : {rx2 / total:.4f}")
    # top tail rows
    flat = r2.reshape(-1)
    top = np.argsort(flat)[-8:][::-1]
    for t in top:
        b, rem = divmod(t, p.N * p.M)
        i, j = divmod(rem, p.M)
        print(f"  top row: block {b} ({i},{j}) kind "
              f"{Kind(kind_pad[b, i, j]).name if kind_pad[b, i, j] >= 0 else 'PAD'}"
              f" |r|^2 {flat[t] / total:.4f}")

    # per-block tail
    per_block = r2.reshape(p.B, -1).sum(1) / total
    print("per-block |r|^2 fraction:",
          " ".join(f"{v:.3f}" for v in per_block))


if __name__ == "__main__":
    sc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    wd = float(sys.argv[3]) if len(sys.argv) > 3 else None
    main(sc, it, wd)
