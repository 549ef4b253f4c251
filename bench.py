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
    inp = input_mod.load(cfg, base_dir="/root/reference")
    return inp.template.run(inp.geometry)


def main(scale_cells: int = 2, iters: int = 5, oracle_iters: int = 1):
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem
    from turbomesh_tpu.smoothing.control_function import Laplace

    mesh = build_mesh(scale_cells)
    n_nodes = mesh.num_points
    info = classify(mesh)
    cf = Laplace().init(mesh)

    # device path at reference tolerance
    dev = DeviceSmoother(mesh, info, rtol=1e-4, atol=1e-11, max_iters=4000)
    coords = mesh.flat_coords()
    warm = dev.solve(coords, cf)  # compile + first step
    t0 = time.perf_counter()
    c = warm
    for _ in range(iters):
        c = dev.solve(c, cf)
    dt = time.perf_counter() - t0
    device_mnodes = n_nodes * iters / dt / 1e6

    # host oracle (sparse direct) on the same mesh
    oracle = SparseSystem(mesh, info)
    co = mesh.flat_coords()
    t0 = time.perf_counter()
    for _ in range(oracle_iters):
        co = oracle.solve(co, cf)
    dt_o = time.perf_counter() - t0
    oracle_mnodes = n_nodes * oracle_iters / dt_o / 1e6

    # secondary metric: wall-clock to converge the full nonlinear problem
    # (displacement-norm residual < 1e-10, the BASELINE.md bar), reusing
    # the already-compiled smoother
    t0 = time.perf_counter()
    c = mesh.flat_coords()
    n_converge = 0
    for n_converge in range(1, 61):
        new = dev.solve(c, cf)
        d = new - c
        norm = (d[:, 0] @ d[:, 0] + d[:, 1] @ d[:, 1]) ** 2
        c = new
        if norm < 1e-28:  # reference metric is (|dx|^2+|dy|^2)^2 -> displacement ~1e-7
            break
    t_converge = time.perf_counter() - t0
    res_hist = list(range(n_converge))

    print(json.dumps({
        "metric": "elliptic_smoothing_throughput",
        "value": round(device_mnodes, 3),
        "unit": "Mnodes/s/chip",
        "vs_baseline": round(device_mnodes / oracle_mnodes, 3),
        "detail": {
            "nodes": n_nodes,
            "picard_iters": iters,
            "device_seconds_per_iter": round(dt / iters, 4),
            "oracle_mnodes_per_s": round(oracle_mnodes, 3),
            "seconds_to_displacement_converged": round(t_converge, 2),
            "picard_iters_to_converge": len(res_hist),
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    import sys

    # default scale 2 (~100k nodes): the largest size the current TPU
    # runtime tunnel compiles reliably (see ROADMAP.md item 1); pass an
    # explicit scale to attempt larger runs
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    main(scale_cells=scale)
