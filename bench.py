"""Benchmark: elliptic smoothing wall-clock + throughput on TPU.

Scaling sweep over mesh sizes: for each scale the TPU device smoother
runs its device-resident Picard loop (DeviceSmoother.run — field stays
in HBM, one stats vector crosses per iteration) to the BASELINE.md
target residual 1e-10, recording run-to-target throughput,
seconds-to-target, the per-iteration device rate, which program
granularity ran (fused / staged / host-orchestrated), setup and compile
time, a cold/warm compile-cache flag, and whether every linearized
solve converged. The sweep also runs the reference's own example
configs UNCHANGED (BASELINE configs 1-3: LS89 + T106,
examples/LS89/LS89.json:28-41) as dedicated entries. The host
sparse-direct oracle (scipy splu on the exact reference
discretization — stands in for the reference's serial UMFPACK backend,
umfpack.zig:29-55) runs at scales <= ORACLE_MAX for the honest
vs_baseline ratio.

Two throughput rates are reported per entry (different questions):
  run_to_target_mnodes_per_s : nodes / seconds-to-1e-10 — the HEADLINE
                               (`value`): the decision-relevant rate the
                               BASELINE.md target is phrased in.
  device_mnodes_per_s        : nodes x picard_iters / seconds — the
                               per-iteration device rate (capacity).

DEADLINE-AWARE AND UN-LOSABLE (the round-3 and round-4 driver artifacts
were both lost to the driver's bench timeout — rc 124, parsed null):
  * The full final-format artifact JSON is printed to stdout (and
    written to BENCH_PARTIAL.json) after EVERY completed entry, so a
    kill at any moment leaves the most recent cumulative line parseable.
  * A total wall budget (TURBOMESH_BENCH_BUDGET_S, default 1500 s)
    bounds the sweep: entries are ordered most-valuable-first (scale 4,
    then the 5.4M-node scale 15, then the reference examples, then the
    rest) and an entry is skipped when its cost estimate exceeds the
    remaining budget.
  * SIGTERM/SIGINT kill the running worker subprocess and emit the
    final artifact from whatever completed.
  * Entries run inside ONE serialized batch subprocess (the tunneled
    TPU runtime's worker can crash outright; a fresh process gets a
    restarted worker, and two attached processes wedge the chip) that
    streams one JSON line per entry; on a crash-class failure the
    remaining entries are retried in a fresh process, cooldown and
    retries bounded by the remaining budget.

Prints the artifact JSON line (cumulatively, after every entry):
  value        : run-to-target Mnodes/s/chip at the headline entry (the
                 largest completed entry that reached 1e-10).
  vs_baseline  : device per-iteration rate / host sparse-direct
                 per-iteration rate at the largest scale where both ran
                 (below 1.0 = the TPU path loses there).
  detail.sweep : one record per scale / example.
  detail.north_star_projection : derived <60s/100M-node distance, with
                 stated assumptions.

Usage: python bench.py [scales_csv] [picard_cap]
  e.g. python bench.py 4,15,8 30
  scale s multiplies every O4H cell count (nodes ~ 25k * s^2).
"""

import json
import os
import signal
import sys
import time

import numpy as np

import jax

# honor an explicit JAX_PLATFORMS request (the axon sitecustomize
# re-pins the platform at plugin registration, so the env var alone is
# not enough — same pattern as tests/conftest.py). No-op when unset.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

TARGET = 1e-10           # BASELINE.md: displacement-norm residual target
ORACLE_MAX = 4           # largest scale the host splu oracle runs at
WALL_CAP_S = 1500.0      # per-entry cap on the run-to-target loop
BUDGET_S = float(os.environ.get("TURBOMESH_BENCH_BUDGET_S", "1500"))
NORTH_STAR_NODES = 100e6
NORTH_STAR_CHIPS = 8

# Per-entry wall estimates on the tunneled TPU (round-4/5 measurements,
# COLD process: ~60 s device init + minutes of partial cache service +
# the run itself). Used only for budget-fit decisions; entries that
# share a worker process amortize the init. With a fully warm
# persistent cache the executables deserialize instead of compiling,
# but each entry still pays ~40 s Python tracing + ~40 s
# deserialization (measured round 5: scale-4 warm-up 76.5 s served vs
# 241-258 s cold), so the estimates stay cold-realistic — a warm run
# simply finishes early and fits more entries.
_EST_S = {"scale1": 200.0, "scale2": 220.0, "scale4": 280.0,
          "scale8": 600.0, "scale15": 700.0,
          "LS89": 340.0, "T106": 360.0, "sor": 90.0}
_EST_DEFAULT = 400.0
_AMORTIZED_DISCOUNT = 120.0   # init+attach already paid in a live worker
_HEAVY_SCALE = 10             # worker restarts after a scale >= this runs

# base crash-retry cooldown (a crashed TPU worker can take minutes to
# restart; tests shrink this to keep the fault-injection suite fast)
_COOLDOWN_BASE_S = float(os.environ.get("TURBOMESH_BENCH_COOLDOWN_S", "60"))

_PARTIAL_PATH = os.environ.get(
    "TURBOMESH_BENCH_PARTIAL_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_PARTIAL.json"))

# fault injection for the supervisor tests (tests/test_bench_supervisor):
# {"<spec key>": "ok" | "crash"} — "ok" returns a synthetic record
# without touching a device; "crash" emits a crash-class error record
# and kills the worker process mid-launch, the way the tunneled TPU
# worker dies (round-4/5 scale-8 chains).
_FAULT = json.loads(os.environ.get("TURBOMESH_BENCH_FAULT", "{}"))


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


def _timed_device_run(rec, mesh, picard_cap, algorithm, oracle,
                      continue_frozen=False):
    """Shared sweep-entry body: device-resident run to TARGET (capped),
    plus the host-direct oracle throughput when `oracle`.

    continue_frozen: if the capped run leaves the displacement residual
    above TARGET (expected with a live White feedback law, whose moving
    fixed point floors the residual near ~1e-5), continue from the final
    state with the control function FROZEN until the 1e-10 target — the
    BASELINE.md primary metric is wall-clock to ||r|| < 1e-10 on the
    LS89/T106 configs, and that fixed point is a property of a frozen
    control function. Uses the already-compiled algorithm=None program
    (same as the warm-up), so the continuation adds no compiles."""
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.system import SparseSystem

    n = rec["nodes"]
    rec["platform"] = jax.devices()[0].platform
    t0 = time.perf_counter()
    info = classify(mesh)
    dev = DeviceSmoother(mesh, info, rtol=1e-6, atol=1e-8,
                         restart=10, max_restarts=10)
    rec["setup_s"] = round(time.perf_counter() - t0, 2)

    cf0 = (algorithm or Laplace()).init(mesh)
    coords0 = mesh.flat_coords()

    # warm-up iteration = compile (run() keeps X in HBM; one iteration).
    # cache_state "served": the persistent compilation cache supplied
    # the executables — the remaining wall is Python tracing/lowering
    # plus executable deserialization (~40 s + ~40 s at scale 4,
    # measured round 5); a cold XLA compile is 240-300 s at any scale
    # on the tunneled remote compiler.
    t0 = time.perf_counter()
    dev.run(coords0, cf0, 1, algorithm=None)
    rec["compile_s"] = round(time.perf_counter() - t0, 1)
    rec["cache_state"] = "served" if rec["compile_s"] < 120.0 else "cold"

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

    if continue_frozen and not rec["reached_target"]:
        nonconv2 = _count_nonconverged()
        t0 = time.perf_counter()
        coords, _cf, disp2, it2 = dev.run(
            coords, _cf, 60, algorithm=None, start_iteration=iters,
            target_residual=TARGET)
        dt2 = time.perf_counter() - t0
        rec["frozen_continuation"] = {
            "what": "control function frozen at the config run's final "
                    "state, Picard continued to the 1e-10 target "
                    "(BASELINE.md wall-to-target metric)",
            "picard_iters": it2,
            "seconds": round(dt2, 2),
            "final_displacement_residual": float(disp2),
            "reached_target": bool(disp2 < TARGET),
            "linear_solves_converged": _count_nonconverged() == nonconv2,
        }
        if disp2 < TARGET:
            rec["seconds_to_1e-10_total"] = round(dt + dt2, 2)
            rec["run_to_target_mnodes_per_s"] = round(
                n / (dt + dt2) / 1e6, 4)

    if oracle:
        # One timed solve, no warm-up: each splu call re-factorizes from
        # scratch, so repetitions only average out noise — and at scale 4
        # one host solve is ~105 s, so the old warm-up + 3 reps cost
        # ~420 s of the bench budget for a second decimal place.
        oracle_sys = SparseSystem(mesh, info)
        co = mesh.flat_coords()
        t0 = time.perf_counter()
        co = oracle_sys.solve(co, cf0)
        rec["host_direct_mnodes_per_s"] = round(
            n / (time.perf_counter() - t0) / 1e6, 4)
    return rec


def bench_scale(scale: int, picard_cap: int, oracle: bool):
    rec = {"scale_cells": scale}
    # the "max-compilable" sweep entry (scale > 8, ~5.4M nodes at 15)
    # runs a bounded number of Picard iterations: one staged linearized
    # solve there takes minutes. Measured round 4: the Laplace run
    # reaches the 1e-10 target in 2 Picard iterations (adaptive
    # forcing), so the cap of 3 does not prevent reached_target=true;
    # picard_capped records that the cap was in force.
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
    # FROZEN control function, so reached_target=false on this phase is
    # expected; the frozen_continuation phase (continue_frozen=True)
    # then carries the run to 1e-10, which is the BASELINE.md metric.
    iters_cfg = inp.smoothing.iterations or picard_cap
    rec["config_iterations"] = iters_cfg
    rec["picard_capped"] = True
    return _timed_device_run(rec, mesh, iters_cfg, algorithm,
                             oracle=mesh.num_points < 200_000,
                             continue_frozen=True)


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
        "TPU backend error", "worker process crashed", "DEADLINE",
        "worker exited", "worker killed"))


def _sor_probe():
    """Pure on-chip SOR kernel rate + platform. The timing loop is
    CHAINED (each call's x0 is the previous call's output), so the 10
    dispatches cannot overlap and the measured rate is a real
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
    return {"entry": "sor", "timing": "chained", "platform": platform,
            "pallas_sor_mnode_sweeps_per_s": round(rate, 0)}


# ---------------------------------------------------------------------------
# entry specs + worker protocol
# ---------------------------------------------------------------------------

def _spec_key(spec):
    if spec["kind"] == "scale":
        return "scale%d" % spec["scale"]
    if spec["kind"] == "example":
        return spec["name"]
    return spec["kind"]


def _spec_ident(spec):
    """(key, value) pair identifying this spec's record in the sweep."""
    if spec["kind"] == "scale":
        return "scale_cells", spec["scale"]
    if spec["kind"] == "example":
        return "example", spec["name"]
    return "entry", "sor"


def _run_spec(spec, picard_cap):
    mode = _FAULT.get(_spec_key(spec))
    if mode == "crash" and spec.get("no_fused"):
        mode = "ok"  # fault model: the staged rerun succeeds
    if mode == "crash":
        k, v = _spec_ident(spec)
        print(json.dumps({k: v, "error": "UNAVAILABLE: TPU worker "
                          "process crashed (injected fault)"}),
              flush=True)
        os._exit(1)
    if mode == "ok":
        k, v = _spec_ident(spec)
        if spec["kind"] == "sor":
            return {"entry": "sor", "timing": "chained",
                    "platform": "cpu",
                    "pallas_sor_mnode_sweeps_per_s": 1.0}
        return {k: v, "nodes": 1000, "picard_iters": 1,
                "seconds_to_1e-10": 0.01, "reached_target": True,
                "final_displacement_residual": 0.0,
                "device_mnodes_per_s": 1.0,
                "run_to_target_mnodes_per_s": 1.0,
                "granularity": "fused", "compile_s": 0.0,
                "cache_state": "served", "linear_rtols_used": [],
                "linear_solves_converged": True}
    import contextlib

    @contextlib.contextmanager
    def _fused_gate():
        # per-spec fused-off escalation: a spec whose fused program has
        # already crashed the TPU worker reruns with the staged stepper
        # (measured round 5: the LS89 fused dispatch killed the worker
        # in fresh processes across three separate on-chip runs while
        # T106/scales 1-4 ran clean — the crash follows the PROGRAM,
        # not the process)
        if not spec.get("no_fused"):
            yield
            return
        saved = os.environ.get("TURBOMESH_FUSED_SOLVE")
        os.environ["TURBOMESH_FUSED_SOLVE"] = "0"
        try:
            yield
        finally:
            if saved is None:
                os.environ.pop("TURBOMESH_FUSED_SOLVE", None)
            else:
                os.environ["TURBOMESH_FUSED_SOLVE"] = saved

    with _fused_gate():
        if spec["kind"] == "scale":
            s = spec["scale"]
            return bench_scale(s, picard_cap, oracle=s <= ORACLE_MAX)
        if spec["kind"] == "example":
            return bench_example(spec["name"], picard_cap)
        return _sor_probe()


def _worker_main(specs_json: str, deadline_rel: float, picard_cap: int):
    """Batch worker: runs entries in order inside ONE TPU-attached
    process (amortizing the ~60 s device attach + partial cache
    service), printing one flushed JSON line per entry. Skips an entry
    when its cost estimate exceeds the remaining budget (the first
    entry is always attempted)."""
    _install_warning_counter()
    t0 = time.perf_counter()
    specs = json.loads(specs_json)
    for i, spec in enumerate(specs):
        remaining = deadline_rel - (time.perf_counter() - t0)
        est = _EST_S.get(_spec_key(spec), _EST_DEFAULT)
        if i > 0:
            est = max(60.0, est - _AMORTIZED_DISCOUNT)
        if i > 0 and est > remaining:
            k, v = _spec_ident(spec)
            print(json.dumps({k: v, "skipped": "budget",
                              "estimate_s": est,
                              "remaining_s": round(remaining, 0)}),
                  flush=True)
            continue
        try:
            rec = _run_spec(spec, picard_cap)
        except Exception as e:  # noqa: BLE001 — report, don't crash silent
            import traceback

            traceback.print_exc()
            k, v = _spec_ident(spec)
            rec = {k: v, "error": str(e).splitlines()[0][:200]}
        print(json.dumps(rec), flush=True)
        # the multi-M-node staged run leaves the tunneled TPU worker
        # unhealthy: in BOTH round-5 on-chip runs the entry dispatched
        # right after scale 15 (LS89) died UNAVAILABLE in the same
        # process while succeeding in a fresh one. Exit cleanly after a
        # heavy entry so the supervisor relaunches the rest in a clean
        # process (costs one ~60 s attach, saves crash+cooldown cycles).
        if (spec["kind"] == "scale" and spec["scale"] >= _HEAVY_SCALE
                and "error" not in rec and "skipped" not in rec
                and i < len(specs) - 1):
            return


# ---------------------------------------------------------------------------
# parent: budgeted, incremental, SIGTERM-safe supervisor
# ---------------------------------------------------------------------------

class _Supervisor:
    def __init__(self, specs, picard_cap):
        self.specs = specs
        self.picard_cap = picard_cap
        self.t0 = time.perf_counter()
        self.cache_bytes0 = _cache_bytes()
        self.sweep = {}          # spec_key -> record
        self.order = [_spec_key(s) for s in specs]
        self.attempts = {k: 0 for k in self.order}
        self.crashed = {k: 0 for k in self.order}   # crash-class errors seen
        self.proc = None
        self.stopping = False

    # -- budget -----------------------------------------------------------
    def remaining(self):
        return BUDGET_S - (time.perf_counter() - self.t0)

    # -- artifact ---------------------------------------------------------
    def emit(self, final=False):
        if final:
            # no silent caps: an entry still pending when the budget (or
            # a SIGTERM) ends the sweep must appear in the artifact with
            # its attempt count, not vanish (round-5 rehearsal: LS89
            # crashed the worker repeatedly and was absent from the
            # final sweep with no trace)
            for s in self.specs:
                kk = _spec_key(s)
                if kk not in self.sweep:
                    k, v = _spec_ident(s)
                    self.sweep[kk] = {
                        k: v,
                        "skipped": ("crash-retries exhausted or budget"
                                    if self.attempts.get(kk, 0) else
                                    "budget"),
                        "attempts": self.attempts.get(kk, 0),
                    }
        sweep = [self.sweep[k] for k in self.order if k in self.sweep]
        entries = [r for r in sweep if r.get("entry") != "sor"]
        sor = next((r for r in sweep if r.get("entry") == "sor"), {})
        done = [r for r in entries if "run_to_target_mnodes_per_s" in r]
        both = [r for r in done if "host_direct_mnodes_per_s" in r]
        reached = [r for r in done if r.get("reached_target")]
        head = (max(reached, key=lambda r: r["nodes"]) if reached
                else max(done, key=lambda r: r["nodes"]) if done else {})
        ratio_rec = max(both, key=lambda r: r["nodes"]) if both else {}
        vs = (ratio_rec.get("device_mnodes_per_s", 0.0)
              / ratio_rec["host_direct_mnodes_per_s"]) if both else 0.0

        # derived distance to the BASELINE north star (<60 s for a
        # 100M-node smoothing on 8 chips), projected from the measured
        # per-chip RUN-TO-TARGET rate. Stated assumptions: run-to-target
        # rate flat in mesh size (Picard count measured ~flat: 2 at
        # scale 15 Laplace) and in device count (MULTICHIP_SCALING:
        # FGMRES iterations exactly flat over D in {1,2,4,8}).
        rate = head.get("run_to_target_mnodes_per_s", 0.0)
        projection = {
            "target_s": 60.0,
            "assumes": f"{NORTH_STAR_NODES:.0e} nodes, "
                       f"{NORTH_STAR_CHIPS} chips, run-to-target rate "
                       "flat in mesh size and device count "
                       "(iteration flatness measured in "
                       "MULTICHIP_SCALING_r04.json)",
            "projected_s": (round(NORTH_STAR_NODES
                                  / (rate * 1e6) / NORTH_STAR_CHIPS, 1)
                            if rate else None),
        }

        line = json.dumps({
            "metric": "elliptic_smoothing_run_to_target",
            "value": rate,
            "unit": "Mnodes/s/chip",
            "vs_baseline": round(vs, 3),
            "detail": {
                "value_is": "nodes / seconds-to-1e-10 at the headline "
                            "entry (largest that reached the target)",
                "headline_scale": head.get("scale_cells",
                                           head.get("example")),
                "headline_nodes": head.get("nodes"),
                "headline_seconds_to_target": head.get("seconds_to_1e-10"),
                "headline_device_mnodes_per_s": head.get(
                    "device_mnodes_per_s"),
                "vs_baseline_scale": ratio_rec.get("scale_cells"),
                "vs_baseline_is": "device vs host-splu PER-ITERATION "
                                  "rate at the largest scale both ran",
                "target_residual": TARGET,
                "budget_s": BUDGET_S,
                "elapsed_s": round(time.perf_counter() - self.t0, 1),
                "complete": final and all(
                    k in self.sweep and "skipped" not in self.sweep[k]
                    and "error" not in self.sweep[k]
                    for k in self.order),
                "sweep": sweep,
                "entry_order": self.order,
                "compile_cache_bytes_at_start": self.cache_bytes0,
                "north_star_projection": projection,
                "pallas_sor_mnode_sweeps_per_s": sor.get(
                    "pallas_sor_mnode_sweeps_per_s", 0.0),
                "platform": sor.get("platform") or next(
                    (e.get("platform") for e in sweep
                     if e.get("platform")), None),
            },
        })
        print(line, flush=True)
        try:
            with open(_PARTIAL_PATH, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass

    # -- worker management --------------------------------------------------
    def _kill_worker(self):
        if self.proc and self.proc.poll() is None:
            try:
                self.proc.kill()
                self.proc.wait(timeout=10)
            except Exception:  # noqa: BLE001
                pass

    def _on_term(self, signum, frame):
        # emit the final artifact from whatever is done, then exit.
        self.stopping = True
        self._kill_worker()
        self.emit(final=True)
        os._exit(0)

    # retries are bounded by the remaining budget (VERDICT r4 item 1d):
    # the attempt cap only stops a spec that keeps crashing from
    # spinning forever within a generous budget.
    MAX_ATTEMPTS = 5

    def pending(self):
        return [s for s in self.specs if _spec_key(s) not in self.sweep
                and self.attempts[_spec_key(s)] < self.MAX_ATTEMPTS]

    def demote(self, key):
        """Move the spec that just crashed the worker to the end of the
        schedule so its next attempt cannot poison the cheap entries
        (measured round 5: a scale-8 worker crash burned three retry
        launches in a row, erroring scale-1/2/sor in the same processes
        while 2.5 ks of budget sat unused)."""
        idx = next((i for i, s in enumerate(self.specs)
                    if _spec_key(s) == key), None)
        if idx is not None:
            self.specs.append(self.specs.pop(idx))

    def run(self):
        import subprocess

        signal.signal(signal.SIGTERM, self._on_term)
        signal.signal(signal.SIGINT, self._on_term)
        self.emit()  # an artifact exists from second zero

        cooldown = 0.0
        while not self.stopping:
            pend = self.pending()
            if not pend:
                break
            first_est = _EST_S.get(_spec_key(pend[0]), _EST_DEFAULT)
            if self.remaining() < min(first_est, 150.0):
                break
            if cooldown:
                time.sleep(min(cooldown, max(0.0, self.remaining() - 60)))
            for s in pend:
                kk = _spec_key(s)
                self.attempts[kk] += 1
                # the crash follows the PROGRAM, not the process
                # (measured: LS89's fused dispatch killed fresh workers
                # across three on-chip runs) — after one crash of this
                # spec, rerun it with the fused program disabled
                if self.crashed[kk]:
                    s["no_fused"] = True
            extra_env = {}
            if any(self.attempts[_spec_key(s)] >= self.MAX_ATTEMPTS - 1
                   for s in pend):
                # last-chance retry: force the staged granularity in
                # case the fused program's dispatch kills the worker
                extra_env["TURBOMESH_FUSED_SOLVE"] = "0"
            env = dict(os.environ)
            env.update(extra_env)
            deadline_rel = max(60.0, self.remaining() - 45.0)
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   json.dumps(pend), str(deadline_rel),
                   str(self.picard_cap)]
            self.proc = subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=sys.stderr,
                text=True, env=env)
            last_err = ""
            # stream entry lines; enforce the deadline ourselves
            import threading

            def _enforcer(proc=self.proc):
                while proc.poll() is None and not self.stopping:
                    if self.remaining() < 30.0:
                        proc.kill()
                        return
                    time.sleep(2.0)

            threading.Thread(target=_enforcer, daemon=True).start()
            for line in self.proc.stdout:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                key = None
                if "scale_cells" in rec:
                    key = "scale%d" % rec["scale_cells"]
                elif "example" in rec:
                    key = rec["example"]
                elif rec.get("entry") == "sor":
                    key = "sor"
                if key is None:
                    continue
                if "error" in rec and _crash_class(rec["error"]):
                    last_err = rec["error"]
                    if key in self.crashed:
                        self.crashed[key] += 1
                    # leave it pending for a fresh-process retry (unless
                    # attempts are exhausted — then record the error);
                    # demote it so the retry runs the cheap entries
                    # before re-risking the one that crashed the worker
                    if self.attempts.get(key, self.MAX_ATTEMPTS) \
                            < self.MAX_ATTEMPTS:
                        self.demote(key)
                        break
                self.sweep[key] = rec
                self.emit()
            self._kill_worker()
            rc = self.proc.wait()
            if rc != 0 and not last_err:
                last_err = f"worker exited rc={rc}"
            # escalating cooldown: a crashed TPU worker can take
            # minutes to restart — retrying after 30 s was measured to
            # fail UNAVAILABLE three launches in a row (round 5)
            if last_err:
                self.crashes = getattr(self, "crashes", 0) + 1
                cooldown = min(3 * _COOLDOWN_BASE_S,
                               _COOLDOWN_BASE_S * self.crashes)
            else:
                cooldown = 0.0
            if not last_err:
                # clean pass: anything still missing was skipped for
                # budget inside the worker; don't spin on it
                for s in self.pending():
                    k, v = _spec_ident(s)
                    kk = _spec_key(s)
                    if self.attempts[kk] >= 2:
                        self.sweep[kk] = {k: v, "skipped": "budget"}
        self.emit(final=True)


def _cache_bytes():
    """Total size of the persistent XLA compilation cache (0 if absent).

    Used only to pick the entry ORDER: with a warm cache the big
    entries deserialize in ~40-80 s; on a fresh container (the cache
    was observed wiped between rounds) every compile goes through the
    remote compiler at 240-700 s, so a driver bench budget of ~11 min
    would finish NOTHING if a big entry ran first."""
    loc = os.environ.get("TURBOMESH_JAX_CACHE") or os.path.expanduser(
        "~/.cache/turbomesh_jax")
    try:
        return sum(e.stat().st_size for e in os.scandir(loc)
                   if e.is_file())
    except OSError:
        return 0


def build_specs(scales):
    # Most-valuable-first order (VERDICT r4 item 1c): scale 4 (fast,
    # known-good), then the headline 5.4M-node scale 15, then the
    # reference examples (BASELINE configs 1-3), then the rest cheapest
    # first (scale 8 is the measured crash-prone entry on this runtime
    # — round-4/5 worker crashes both hit scale-8 chains — so it runs
    # after the cheap small scales), then the SOR kernel probe.
    #
    # COLD-CACHE INSURANCE: when the persistent compile cache is
    # missing/empty (fresh container), scale 1 runs FIRST — its cold
    # compile (~250-300 s) is the only device entry that can finish
    # inside a short driver budget, guaranteeing the artifact of record
    # a nonzero headline value even in the worst case. With a warm
    # cache it would only delay the true headline entries, so it stays
    # in its cheap-first slot.
    prio = [4, 15]
    ordered = [s for s in prio if s in scales] + \
              sorted((s for s in scales if s not in prio),
                     key=lambda s: _EST_S.get("scale%d" % s, _EST_DEFAULT))
    specs = [{"kind": "scale", "scale": s} for s in ordered[:2]]
    # LS89 starts with the fused program DISABLED: its fused dispatch
    # has killed the tunneled TPU worker in four separate on-chip runs
    # (three in the round-5 rehearsals, one more in rehearsal 3 even
    # after a clean post-scale-15 worker restart), each costing a
    # crash + cooldown + relaunch cycle that pushed LS89 out of the
    # budget. The staged stepper is measured-clean on meshes this size;
    # at 37.7k nodes the speed delta is negligible next to one crash.
    specs += [{"kind": "example", "name": "LS89", "no_fused": True},
              {"kind": "example", "name": "T106"}]
    specs += [{"kind": "scale", "scale": s} for s in ordered[2:]]
    specs += [{"kind": "sor"}]
    if _cache_bytes() < 50e6:
        idx = next((i for i, s in enumerate(specs)
                    if s["kind"] == "scale" and s["scale"] == 1), None)
        if idx is not None:
            specs.insert(0, specs.pop(idx))
    return specs


def main(scales, picard_cap: int = 30):
    _Supervisor(build_specs(scales), picard_cap).run()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker_main(sys.argv[2], float(sys.argv[3]),
                     int(sys.argv[4]) if len(sys.argv) > 4 else 30)
        sys.exit(0)

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
        # single-entry worker (kept for tools/ probes + manual use)
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

    scales = ([int(x) for x in sys.argv[1].replace(",", " ").split()]
              if len(sys.argv) > 1 else [4, 15, 8, 1, 2])
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    main(scales, cap)
