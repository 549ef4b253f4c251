"""Benchmark: elliptic smoothing throughput (Mnodes/s/chip) on TPU.

Scaling sweep over mesh sizes: for each scale the TPU device smoother
runs its device-resident Picard loop (DeviceSmoother.run — field stays
in HBM, one stats vector crosses per iteration) to the BASELINE.md
target residual 1e-10, recording throughput, seconds-to-target, which
program granularity actually ran (fused / staged / host-orchestrated),
setup and compile time, and whether every linearized solve converged.
The host sparse-direct oracle (scipy splu on the exact reference
discretization — stands in for the reference's serial UMFPACK backend,
umfpack.zig:29-55) runs at scales <= oracle_max for the honest
vs_baseline ratio.

Prints ONE JSON line:
  value        : device throughput at the largest completed scale.
  vs_baseline  : device / host-direct at the largest scale where both
                 ran (below 1.0 = the TPU path loses there).
  detail.sweep : one record per scale.

Usage: python bench.py [scales_csv] [picard_cap]
  e.g. python bench.py 1,2,4,8 30
  scale s multiplies every O4H cell count (nodes ~ 25k * s^2).
"""

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

TARGET = 1e-10           # BASELINE.md: displacement-norm residual target
ORACLE_MAX = 4           # largest scale the host splu oracle runs at
WALL_CAP_S = 1500.0      # per-scale cap on the run-to-target loop


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
    inp = input_mod.load(cfg, base_dir=os.path.dirname(os.path.abspath(__file__)))
    return inp.template.run(inp.geometry)


def bench_scale(scale: int, picard_cap: int, oracle: bool):
    """One sweep entry: device-resident run to TARGET (capped), plus the
    host-direct oracle throughput when `oracle`."""
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem

    rec = {"scale_cells": scale}
    # the "max-compilable" sweep entry (scale > 8, ~5.4M nodes at 15)
    # runs a bounded number of Picard iterations: one staged linearized
    # solve there takes ~4.5 min, so running to the 1e-10 Picard target
    # would dominate the whole sweep. The per-solve convergence and
    # throughput are what the entry documents; reached_target records
    # that the Picard target was NOT chased.
    if scale > 8:
        picard_cap = min(picard_cap, 3)
    # granularity is auto-selected per mesh size (DeviceSmoother.
    # _prefer_staged: fused below ~3M padded points, staged above — the
    # fused program dies at dispatch beyond that on this runtime); clear
    # any degradation override a previous scale left behind
    os.environ.pop("TURBOMESH_FUSED_SOLVE", None)
    t0 = time.perf_counter()
    mesh = build_mesh(scale)
    rec["nodes"] = n = mesh.num_points
    rec["blocking_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    info = classify(mesh)
    dev = DeviceSmoother(mesh, info, rtol=1e-6, atol=1e-8,
                         restart=10, max_restarts=10)
    rec["setup_s"] = round(time.perf_counter() - t0, 2)

    cf = Laplace().init(mesh)
    coords0 = mesh.flat_coords()

    # warm-up iteration = compile (run() keeps X in HBM; one iteration)
    t0 = time.perf_counter()
    dev.run(coords0, cf, 1, algorithm=None)
    rec["compile_s"] = round(time.perf_counter() - t0, 1)

    # timed device-resident run to the BASELINE target
    hist = []
    nonconv = _count_nonconverged()
    t0 = time.perf_counter()
    coords, _cf, disp, iters = dev.run(
        coords0, cf, picard_cap, algorithm=None,
        target_residual=TARGET, residual_history=hist)
    dt = time.perf_counter() - t0
    rec["picard_iters"] = iters
    rec["seconds_to_1e-10"] = round(dt, 2)
    rec["reached_target"] = bool(disp < TARGET)
    rec["picard_capped"] = scale > 8  # target not chased, see above
    rec["final_displacement_residual"] = float(disp)
    rec["device_mnodes_per_s"] = round(n * iters / dt / 1e6, 4)
    rec["granularity"] = dev.granularity
    rec["last_linear_residual"] = float(dev.last_linear_residual)
    rec["linear_solves_converged"] = _count_nonconverged() == nonconv

    if oracle:
        oracle_sys = SparseSystem(mesh, info)
        co = mesh.flat_coords()
        co = oracle_sys.solve(co, cf)  # warm-up (symbolic analysis etc.)
        co = mesh.flat_coords()
        reps = max(1, min(3, iters))
        t0 = time.perf_counter()
        for _ in range(reps):
            co = oracle_sys.solve(co, cf)
        rec["host_direct_mnodes_per_s"] = round(
            n * reps / (time.perf_counter() - t0) / 1e6, 4)
    return rec


_NONCONV = {"count": 0}


def _count_nonconverged():
    return _NONCONV["count"]


def _install_warning_counter():
    import logging

    class _H(logging.Handler):
        def emit(self, record):
            if "did not converge" in record.getMessage():
                _NONCONV["count"] += 1

    h = _H()
    logging.getLogger("turbomesh.krylov").addHandler(h)
    return h


def _run_scale_subprocess(scale: int, picard_cap: int):
    """Run one sweep entry in a SUBPROCESS. The tunneled TPU runtime's
    worker process can crash outright on specific program sequences
    (observed reproducibly on the scale-8 staged chain); once it dies,
    every device call in the SAME process fails, but a fresh process
    gets a restarted worker. Isolating each scale keeps one crash from
    voiding the rest of the sweep."""
    import json as _json
    import subprocess
    import sys as _sys

    cmd = [_sys.executable, os.path.abspath(__file__),
           "--one", str(scale), str(picard_cap)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3 * WALL_CAP_S)
    except subprocess.TimeoutExpired:
        return {"scale_cells": scale, "error": "subprocess timeout"}
    _sys.stderr.write(out.stderr[-4000:])
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = _json.loads(line)
            if isinstance(rec, dict) and rec.get("scale_cells") == scale:
                return rec
        except ValueError:
            continue
    err = (out.stderr.strip().splitlines() or ["no output"])[-1]
    return {"scale_cells": scale, "error": err[:200]}


def _sor_probe():
    """Pure on-chip SOR kernel rate + platform (runs inside a worker
    subprocess — see _run_scale_subprocess's rationale)."""
    from turbomesh_tpu.ops.sor import red_black_sor
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    nb = mb = 256
    ub = np.linspace(0, 1, nb, dtype=np.float32)
    eb = np.stack(np.meshgrid(ub, ub, indexing="ij"), -1)
    imask = np.zeros((nb, mb), bool)
    imask[1:-1, 1:-1] = True
    cfb = np.zeros((nb, mb, 2), np.float32)
    args = [jnp.asarray(eb), jnp.asarray(cfb), jnp.asarray(eb),
            jnp.asarray(imask)]
    use_pallas = platform == "tpu"
    try:
        x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
        x.block_until_ready()
    except Exception:  # flaky remote Pallas compiles — XLA fallback
        use_pallas = False
        x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
        x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = red_black_sor(*args, omega=1.5, sweeps=50, use_pallas=use_pallas)
    x.block_until_ready()
    rate = nb * mb * 50 * 10 / (time.perf_counter() - t0) / 1e6
    return {"pallas_sor_mnode_sweeps_per_s": round(rate, 0),
            "platform": platform}


def _run_json_subprocess(args_tail, timeout_s):
    import json as _json
    import subprocess
    import sys as _sys

    cmd = [_sys.executable, os.path.abspath(__file__)] + args_tail
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    _sys.stderr.write(out.stderr[-4000:])
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = _json.loads(line)
            if isinstance(rec, dict):
                return rec
        except ValueError:
            continue
    return None


def main(scales, picard_cap: int = 30):
    # The parent stays OFF the device: every device-touching step (one
    # per scale + the SOR probe) runs in its own subprocess, serialized.
    # Rationale: the tunneled runtime's worker crashes outright on some
    # program sequences and two attached processes wedge the chip.
    sweep = []
    t_all = time.perf_counter()
    for s in scales:
        rec = _run_scale_subprocess(s, picard_cap)
        # the tunneled worker dies intermittently across workloads
        # (observed on scale-1 fused AND scale-8 staged chains); it
        # restarts for a fresh process, so crash-class failures get
        # bounded retries after a cooldown
        for _ in range(2):
            if "error" not in rec or "UNAVAILABLE" not in rec["error"]:
                break
            time.sleep(60)
            rec = _run_scale_subprocess(s, picard_cap)
        sweep.append(rec)
        if time.perf_counter() - t_all > 4 * WALL_CAP_S:
            break

    done = [r for r in sweep if "device_mnodes_per_s" in r]
    both = [r for r in done if "host_direct_mnodes_per_s" in r]
    head = done[-1] if done else {}
    ratio_rec = both[-1] if both else {}
    vs = (ratio_rec.get("device_mnodes_per_s", 0.0)
          / ratio_rec["host_direct_mnodes_per_s"]) if both else 0.0

    sor = _run_json_subprocess(["--sor"], 900) or {}

    print(json.dumps({
        "metric": "elliptic_smoothing_throughput",
        "value": head.get("device_mnodes_per_s", 0.0),
        "unit": "Mnodes/s/chip",
        "vs_baseline": round(vs, 3),
        "detail": {
            "headline_scale": head.get("scale_cells"),
            "headline_nodes": head.get("nodes"),
            "vs_baseline_scale": ratio_rec.get("scale_cells"),
            "target_residual": TARGET,
            "sweep": sweep,
            "pallas_sor_mnode_sweeps_per_s": sor.get(
                "pallas_sor_mnode_sweeps_per_s", 0.0),
            "platform": sor.get("platform"),
        },
    }))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "--sor":
        try:
            print(json.dumps(_sor_probe()))
        except Exception:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(json.dumps({"pallas_sor_mnode_sweeps_per_s": 0.0,
                              "platform": None}))
        sys.exit(0)

    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        # subprocess worker: one scale, record as a JSON line on stdout
        _install_warning_counter()
        s1 = int(sys.argv[2])
        cap1 = int(sys.argv[3]) if len(sys.argv) > 3 else 30
        try:
            rec = bench_scale(s1, cap1, oracle=s1 <= ORACLE_MAX)
        except Exception as e:  # noqa: BLE001 — report, don't crash silent
            import traceback

            traceback.print_exc()
            rec = {"scale_cells": s1, "error": str(e).splitlines()[0][:200]}
        print(json.dumps(rec))
        sys.exit(0)

    scales = ([int(x) for x in sys.argv[1].replace(",", " ").split()]
              if len(sys.argv) > 1 else [1, 2, 4, 8, 15])
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    main(scales, cap)
