"""Benchmark: elliptic smoothing throughput (Mnodes/s/chip) on TPU.

Runs the TPU device smoother (matrix-free padded-stack GMRES+multigrid,
smoothing/device.py) on a scaled-up T106 O4H cascade mesh for a fixed
number of Picard iterations at the reference's linear tolerance
(rtol 1e-6, atol 1e-8 — BiCGStab.zig:19-21), and prints ONE JSON line.

value        : device-backend throughput — the framework's TPU number.
vs_baseline  : device / host-sparse-direct oracle (scipy splu on the exact
               reference discretization, standing in for the reference's
               serial UMFPACK path since the reference publishes no
               numbers; BASELINE.md). Honest ratio — below 1.0 means the
               TPU path loses to the host oracle at this scale.

Usage: python bench.py [scale_cells] [picard_iters]
  scale_cells multiplies every O4H cell count (nodes ~ 25k * scale^2).
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


def main(scale_cells: int = 2, iters: int = 3):
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.multigrid import (build_glued_levels,
                                                   v_cycle_glued)
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    mesh = build_mesh(scale_cells)
    n_nodes = mesh.num_points
    info = classify(mesh)
    cf = Laplace().init(mesh)

    # --- backend 1: TPU device solver at reference linear tolerances
    # the glued-MG V-I preconditioner converges the f32 inner solve in a
    # few iterations; a small restart keeps the fixed-length Arnoldi
    # fori_loop (and the compiled program) small
    dev = DeviceSmoother(mesh, info, rtol=1e-6, atol=1e-8,
                         restart=6, max_restarts=8)
    c = mesh.flat_coords()
    t0 = time.perf_counter()
    c = dev.solve(c, cf)  # warm-up: compiles
    compile_s = time.perf_counter() - t0
    c = mesh.flat_coords()
    t0 = time.perf_counter()
    for _ in range(iters):
        c = dev.solve(c, cf)
    dt = time.perf_counter() - t0
    device_mnodes = n_nodes * iters / dt / 1e6
    device_resid = dev.last_linear_residual

    # --- backend 2: host sparse-direct (exact reference discretization;
    # stands in for the reference's serial UMFPACK path). Factorizes each
    # solve, like the reference's UMFPACK backend (umfpack.zig:29-55).
    oracle = SparseSystem(mesh, info)
    co = mesh.flat_coords()
    co = oracle.solve(co, cf)  # warm-up
    co = mesh.flat_coords()
    t0 = time.perf_counter()
    for _ in range(iters):
        co = oracle.solve(co, cf)
    dt_o = time.perf_counter() - t0
    oracle_mnodes = n_nodes * iters / dt_o / 1e6

    # --- BASELINE.md metric: wall-clock from TFI to displacement-norm
    # residual < 1e-10 (smooth.zig:136 formula) with the device backend
    target = 1e-10
    c = mesh.flat_coords()
    t0 = time.perf_counter()
    target_iters = 0
    target_resid = np.inf
    for target_iters in range(1, 51):
        c_new = dev.solve(c, cf)
        d = (c_new - c).reshape(-1, 2)
        target_resid = float(d[:, 0] @ d[:, 0] + d[:, 1] @ d[:, 1]) ** 2
        c = c_new
        if target_resid < target or time.perf_counter() - t0 > 1200:
            break
    seconds_to_target = time.perf_counter() - t0

    # --- pure on-chip kernel rate: fused multigrid V-cycle, data resident
    p = dev.plan
    base32 = np.zeros((p.B * p.N * p.M, 2), dtype=np.float32)
    base32[p.scatter_idx] = mesh.flat_coords()
    cf32 = np.zeros_like(base32)
    levels = build_glued_levels(jnp.asarray(base32.reshape(p.B, p.N, p.M, 2)),
                                jnp.asarray(cf32.reshape(p.B, p.N, p.M, 2)),
                                dev._glue)
    vc = jax.jit(lambda rr: v_cycle_glued(levels, rr))
    r = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((p.B, p.N, p.M, 2)).astype(np.float32))
    r = vc(r)  # compile + stay on device
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = vc(r)
    r.block_until_ready()
    vcycle_mnodes = n_nodes * reps / (time.perf_counter() - t0) / 1e6

    # --- Pallas red-black SOR kernel rate (VMEM-resident single block)
    from turbomesh_tpu.ops.sor import red_black_sor

    nb, mb = 256, 256
    ub = np.linspace(0, 1, nb, dtype=np.float32)
    eb = np.stack(np.meshgrid(ub, ub, indexing="ij"), -1)
    imask = np.zeros((nb, mb), bool)
    imask[1:-1, 1:-1] = True
    cfb = np.zeros((nb, mb, 2), np.float32)
    args = [jnp.asarray(eb), jnp.asarray(cfb), jnp.asarray(eb), jnp.asarray(imask)]
    use_pallas = platform == "tpu"
    try:
        x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
        x.block_until_ready()
    except Exception:  # flaky remote Pallas compile service — XLA fallback
        use_pallas = False
        x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
        x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
    x.block_until_ready()
    sor_rate = nb * mb * 50 * 10 / (time.perf_counter() - t0) / 1e6

    print(json.dumps({
        "metric": "elliptic_smoothing_throughput",
        "value": round(device_mnodes, 4),
        "unit": "Mnodes/s/chip",
        "vs_baseline": round(device_mnodes / oracle_mnodes, 3),
        "detail": {
            "nodes": n_nodes,
            "scale_cells": scale_cells,
            "picard_iters": iters,
            "best_backend": ("tpu_device" if device_mnodes >= oracle_mnodes
                             else "host_direct_native"),
            "tpu_backend_mnodes_per_s": round(device_mnodes, 4),
            "host_direct_mnodes_per_s": round(oracle_mnodes, 4),
            "device_linear_residual": float(device_resid),
            "seconds_to_residual_1e-10": round(seconds_to_target, 2),
            "picard_iters_to_1e-10": target_iters,
            "final_displacement_residual": float(target_resid),
            "compile_s": round(compile_s, 1),
            "onchip_vcycle_mnodes_per_s": round(vcycle_mnodes, 1),
            "pallas_sor_mnode_sweeps_per_s": round(sor_rate, 0),
            "platform": platform,
        },
    }))


if __name__ == "__main__":
    import sys

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(scale_cells=scale, iters=iters)
