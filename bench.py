"""Benchmark: elliptic smoothing throughput (Mnodes/s/chip) on TPU.

Scaling sweep over mesh sizes: for each scale the TPU device smoother
runs its device-resident Picard loop (DeviceSmoother.run — field stays
in HBM, one stats vector crosses per iteration) to the BASELINE.md
target residual 1e-10, recording throughput, seconds-to-target, which
program granularity actually ran (fused / staged / host-orchestrated),
setup and compile time, a cold/warm compile-cache flag, and whether
every linearized solve converged. The sweep also runs the reference's
own example configs UNCHANGED (BASELINE configs 1-3: LS89 + T106,
examples/LS89/LS89.json:28-41) as dedicated entries. The host
sparse-direct oracle (scipy splu on the exact reference
discretization — stands in for the reference's serial UMFPACK backend,
umfpack.zig:29-55) runs at scales <= oracle_max for the honest
vs_baseline ratio.

Two throughput rates are reported per entry (they answer different
questions):
  device_mnodes_per_s        : nodes x picard_iters / seconds — the
                               per-iteration device rate (capacity).
  run_to_target_mnodes_per_s : nodes / seconds-to-1e-10 — the
                               decision-relevant wall-clock rate the
                               BASELINE.md target is phrased in.

Prints ONE JSON line:
  value        : device throughput at the largest completed scale.
  vs_baseline  : device / host-direct at the largest scale where both
                 ran (below 1.0 = the TPU path loses there).
  detail.sweep : one record per scale / example.
  detail.north_star_projection : derived <60s/100M-node distance, with
                 stated assumptions.

Usage: python bench.py [scales_csv] [picard_cap]
  e.g. python bench.py 1,2,4,15,8 30
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
NORTH_STAR_NODES = 100e6
NORTH_STAR_CHIPS = 8
NORTH_STAR_ITERS = 15    # observed Picard count to 1e-10 at scale 4


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


def _timed_device_run(rec, mesh, picard_cap, algorithm, oracle):
    """Shared sweep-entry body: device-resident run to TARGET (capped),
    plus the host-direct oracle throughput when `oracle`."""
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem

    n = rec["nodes"]
    t0 = time.perf_counter()
    info = classify(mesh)
    dev = DeviceSmoother(mesh, info, rtol=1e-6, atol=1e-8,
                         restart=10, max_restarts=10)
    rec["setup_s"] = round(time.perf_counter() - t0, 2)

    cf0 = (algorithm or Laplace()).init(mesh)
    coords0 = mesh.flat_coords()

    # warm-up iteration = compile (run() keeps X in HBM; one iteration).
    # cache_state: <5 s means the persistent compilation cache served
    # every program (warm); a cold compile is O(30-300 s) at any scale.
    t0 = time.perf_counter()
    dev.run(coords0, cf0, 1, algorithm=None)
    rec["compile_s"] = round(time.perf_counter() - t0, 1)
    rec["cache_state"] = "warm" if rec["compile_s"] < 5.0 else "cold"

    # timed device-resident run to the BASELINE target
    hist = []
    nonconv = _count_nonconverged()
    t0 = time.perf_counter()
    coords, _cf, disp, iters = dev.run(
        coords0, cf0, picard_cap, algorithm=algorithm,
        target_residual=TARGET, residual_history=hist)
    dt = time.perf_counter() - t0
    rec["picard_iters"] = iters
    rec["seconds_to_1e-10"] = round(dt, 2)
    rec["reached_target"] = bool(disp < TARGET)
    rec["final_displacement_residual"] = float(disp)
    rec["device_mnodes_per_s"] = round(n * iters / dt / 1e6, 4)
    rec["run_to_target_mnodes_per_s"] = round(n / dt / 1e6, 4)
    rec["granularity"] = dev.granularity
    rec["last_linear_residual"] = float(dev.last_linear_residual)
    rec["linear_solves_converged"] = _count_nonconverged() == nonconv
    # inexact-Picard forcing terms actually used (adaptive when a
    # target residual drives the run; the final iterations tighten to
    # the instance rtol — see DeviceSmoother.run)
    etas = sorted(set(getattr(dev, "last_run_rtols", []) or []))
    rec["linear_rtols_used"] = etas

    if oracle:
        oracle_sys = SparseSystem(mesh, info)
        co = mesh.flat_coords()
        co = oracle_sys.solve(co, cf0)  # warm-up (symbolic analysis etc.)
        co = mesh.flat_coords()
        reps = max(1, min(3, iters))
        t0 = time.perf_counter()
        for _ in range(reps):
            co = oracle_sys.solve(co, cf0)
        rec["host_direct_mnodes_per_s"] = round(
            n * reps / (time.perf_counter() - t0) / 1e6, 4)
    return rec


def bench_scale(scale: int, picard_cap: int, oracle: bool):
    rec = {"scale_cells": scale}
    # the "max-compilable" sweep entry (scale > 8, ~5.4M nodes at 15)
    # runs a bounded number of Picard iterations: one staged linearized
    # solve there takes minutes, so running to the 1e-10 Picard target
    # would dominate the whole sweep. The per-solve convergence and
    # throughput are what the entry documents; picard_capped records
    # that the Picard target was NOT chased.
    if scale > 8:
        picard_cap = min(picard_cap, 3)
    rec["picard_capped"] = scale > 8
    t0 = time.perf_counter()
    mesh = build_mesh(scale)
    rec["nodes"] = mesh.num_points
    rec["blocking_s"] = round(time.perf_counter() - t0, 2)
    return _timed_device_run(rec, mesh, picard_cap, None, oracle)


def bench_example(name: str, picard_cap: int):
    """BASELINE configs 1-3: the reference's own example configs run
    UNCHANGED (examples/LS89/LS89.json, examples/T106/T106.json) —
    blocking + device smoothing to the 1e-10 target with the config's
    wall control function (LS89: White ds_target=1e-6)."""
    from turbomesh_tpu import input as input_mod
    from turbomesh_tpu.smoothing.control_function import from_config

    here = os.path.dirname(os.path.abspath(__file__))
    rec = {"example": name}
    t0 = time.perf_counter()
    inp = input_mod.load(os.path.join(here, "examples", name,
                                      f"{name}.json"), base_dir=here)
    mesh = inp.template.run(inp.geometry)
    rec["nodes"] = mesh.num_points
    rec["blocking_s"] = round(time.perf_counter() - t0, 2)
    algorithm = from_config(inp.smoothing.wall_control_function)
    # run exactly the config's iteration count (the reference's own run
    # shape, smooth.zig:104-153). With the White feedback active the
    # displacement residual floors near the control function's moving
    # fixed point (~1e-5 on LS89) — the 1e-10 target is a property of a
    # FROZEN control function, so reached_target=false here is expected
    # and picard_capped records that the target was not chased.
    iters_cfg = inp.smoothing.iterations or picard_cap
    rec["config_iterations"] = iters_cfg
    rec["picard_capped"] = True
    return _timed_device_run(rec, mesh, iters_cfg, algorithm,
                             oracle=mesh.num_points < 200_000)


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


def _crash_class(err: str) -> bool:
    """Crash-class failures of the tunneled TPU runtime that a fresh
    process (restarted worker) routinely survives. Round 3 lost its two
    headline scales to a filter that matched only 'UNAVAILABLE' while
    the driver's failures read 'ABORTED: TPU backend error (Aborted).'"""
    return any(t in err for t in (
        "UNAVAILABLE", "ABORTED", "Aborted", "INTERNAL",
        "TPU backend error", "worker process crashed", "DEADLINE"))


def _run_entry_subprocess(args_tail, key, val, extra_env=None):
    """Run one sweep entry in a SUBPROCESS. The tunneled TPU runtime's
    worker process can crash outright on specific program sequences;
    once it dies, every device call in the SAME process fails, but a
    fresh process gets a restarted worker. Isolating each entry keeps
    one crash from voiding the rest of the sweep."""
    import json as _json
    import subprocess
    import sys as _sys

    cmd = [_sys.executable, os.path.abspath(__file__)] + args_tail
    env = dict(os.environ)
    env.update(extra_env or {})
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3 * WALL_CAP_S, env=env)
    except subprocess.TimeoutExpired:
        return {key: val, "error": "subprocess timeout"}
    _sys.stderr.write(out.stderr[-4000:])
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = _json.loads(line)
            if isinstance(rec, dict) and rec.get(key) == val:
                return rec
        except ValueError:
            continue
    err = (out.stderr.strip().splitlines() or ["no output"])[-1]
    return {key: val, "error": err[:200]}


def _run_with_retries(args_tail, key, val):
    """Crash-class failures get bounded cooldown retries (the worker
    restarts for a fresh process); the LAST retry additionally forces
    the staged granularity (TURBOMESH_FUSED_SOLVE=0) in case the fused
    program's dispatch is what kills the worker."""
    rec = _run_entry_subprocess(args_tail, key, val)
    for attempt in range(3):
        if "error" not in rec or not _crash_class(rec["error"]):
            return rec
        time.sleep(60)
        extra = {"TURBOMESH_FUSED_SOLVE": "0"} if attempt == 2 else None
        rec = _run_entry_subprocess(args_tail, key, val, extra_env=extra)
    return rec


def _sor_probe():
    """Pure on-chip SOR kernel rate + platform (runs inside a worker
    subprocess — see _run_entry_subprocess's rationale). The timing
    loop is CHAINED (each call's x0 is the previous call's output), so
    the 10 dispatches cannot overlap and the measured rate is a real
    serial-execution rate."""
    from turbomesh_tpu.ops.sor import red_black_sor
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    nb = mb = 256
    ub = np.linspace(0, 1, nb, dtype=np.float32)
    eb = np.stack(np.meshgrid(ub, ub, indexing="ij"), -1)
    imask = np.zeros((nb, mb), bool)
    imask[1:-1, 1:-1] = True
    cfb = np.zeros((nb, mb, 2), np.float32)
    base, cfd, x0, msk = (jnp.asarray(eb), jnp.asarray(cfb),
                          jnp.asarray(eb), jnp.asarray(imask))
    use_pallas = platform == "tpu"
    try:
        x = red_black_sor(base, cfd, x0, msk, omega=1.5, sweeps=50,
                          use_pallas=use_pallas)
        x.block_until_ready()
    except Exception:  # flaky remote Pallas compiles — XLA fallback
        use_pallas = False
        x = red_black_sor(base, cfd, x0, msk, omega=1.5, sweeps=50,
                          use_pallas=use_pallas)
        x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = red_black_sor(base, cfd, x, msk, omega=1.5, sweeps=50,
                          use_pallas=use_pallas)
    x.block_until_ready()
    rate = nb * mb * 50 * 10 / (time.perf_counter() - t0) / 1e6
    return {"pallas_sor_mnode_sweeps_per_s": round(rate, 0),
            "platform": platform, "timing": "chained"}


def main(scales, picard_cap: int = 30):
    # The parent stays OFF the device: every device-touching step (one
    # per scale/example + the SOR probe) runs in its own subprocess,
    # serialized. Rationale: the tunneled runtime's worker crashes
    # outright on some program sequences and two attached processes
    # wedge the chip.
    sweep = []
    t_all = time.perf_counter()
    for s in scales:
        sweep.append(_run_with_retries(
            ["--one", str(s), str(picard_cap)], "scale_cells", s))
        if time.perf_counter() - t_all > 5 * WALL_CAP_S:
            break

    # BASELINE configs 1-3: the reference example configs, unchanged
    for name in ("LS89", "T106"):
        if time.perf_counter() - t_all > 5.5 * WALL_CAP_S:
            break
        sweep.append(_run_with_retries(
            ["--example", name, str(picard_cap)], "example", name))

    done = [r for r in sweep if "device_mnodes_per_s" in r]
    both = [r for r in done if "host_direct_mnodes_per_s" in r]
    head = max(done, key=lambda r: r["nodes"]) if done else {}
    ratio_rec = max(both, key=lambda r: r["nodes"]) if both else {}
    vs = (ratio_rec.get("device_mnodes_per_s", 0.0)
          / ratio_rec["host_direct_mnodes_per_s"]) if both else 0.0

    sor = _run_entry_subprocess(["--sor"], "timing", "chained") or {}

    # derived distance to the BASELINE north star (<60 s for a 100M-node
    # smoothing on 8 chips), projected from the measured per-chip
    # per-iteration rate. Stated assumptions: linear scaling in nodes,
    # iteration count flat in device count (MULTICHIP_SCALING.json
    # measured exactly-flat FGMRES restarts over D in {1,2,4,8}), and
    # NORTH_STAR_ITERS Picard iterations to target.
    rate = head.get("device_mnodes_per_s", 0.0)
    projection = {
        "target_s": 60.0,
        "assumes": f"{NORTH_STAR_NODES:.0e} nodes, "
                   f"{NORTH_STAR_ITERS} Picard iters, "
                   f"{NORTH_STAR_CHIPS} chips, iteration count flat in "
                   "device count, rate from headline entry",
        "projected_s": (round(NORTH_STAR_NODES * NORTH_STAR_ITERS
                              / (rate * 1e6) / NORTH_STAR_CHIPS, 1)
                        if rate else None),
    }

    print(json.dumps({
        "metric": "elliptic_smoothing_throughput",
        "value": head.get("device_mnodes_per_s", 0.0),
        "unit": "Mnodes/s/chip",
        "vs_baseline": round(vs, 3),
        "detail": {
            "headline_scale": head.get("scale_cells"),
            "headline_nodes": head.get("nodes"),
            "headline_run_to_target_mnodes_per_s": head.get(
                "run_to_target_mnodes_per_s"),
            "vs_baseline_scale": ratio_rec.get("scale_cells"),
            "target_residual": TARGET,
            "sweep": sweep,
            "north_star_projection": projection,
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
                              "platform": None, "timing": "chained"}))
        sys.exit(0)

    if len(sys.argv) > 2 and sys.argv[1] in ("--one", "--example"):
        # subprocess worker: one sweep entry as a JSON line on stdout
        _install_warning_counter()
        cap1 = int(sys.argv[3]) if len(sys.argv) > 3 else 30
        try:
            if sys.argv[1] == "--one":
                s1 = int(sys.argv[2])
                rec = bench_scale(s1, cap1, oracle=s1 <= ORACLE_MAX)
            else:
                rec = bench_example(sys.argv[2], cap1)
        except Exception as e:  # noqa: BLE001 — report, don't crash silent
            import traceback

            traceback.print_exc()
            key, val = (("scale_cells", int(sys.argv[2]))
                        if sys.argv[1] == "--one"
                        else ("example", sys.argv[2]))
            rec = {key: val, "error": str(e).splitlines()[0][:200]}
        print(json.dumps(rec))
        sys.exit(0)

    # scale 15 (the known-good staged path / headline size) runs BEFORE
    # scale 8, which historically triggers the intermittent worker crash
    scales = ([int(x) for x in sys.argv[1].replace(",", " ").split()]
              if len(sys.argv) > 1 else [1, 2, 4, 15, 8])
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    main(scales, cap)
