"""Time ONE linearized scale-N solve under solver-option variants.

The decision-relevant number for ROADMAP item 1 (scale-15 per-solve
rate) is the wall time of one converged linearized solve, not the
stationary V-I contraction (FGMRES handles low-dimensional slow modes —
e.g. the ~10 junction points — far better than a stationary iteration,
so contraction proxies can mislead). This probe builds the bench mesh
once and times DeviceSmoother.solve for each requested variant.

Usage: python tools/solve_rate_probe.py [scale] [variant ...]
  variants: base | ip4 | defl | defl_ip4 | restart30 | ip1
Run on the TPU alone (one process per chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: F401

import jax

import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)


VARIANTS = {
    "base": {},
    "ip1": {"mg_opts": {"interface_passes": 1}},
    "ip4": {"mg_opts": {"interface_passes": 4}},
    "defl": {"mg_opts": {"deflation": "y"}},
    "defl_j": {"mg_opts": {"deflation": "j"}},
    "defl_ip4": {"mg_opts": {"deflation": "y", "interface_passes": 4}},
    "restart30": {"restart": 30, "max_restarts": 4},
    # larger per-dispatch f32 iteration budget: fewer host round-trips
    # per refinement pass, still under the ~100-105 s execution watchdog
    # (80 s nominal at scale 15 leaves ~25% headroom for runtime drift)
    "prog80": {"env": {"TURBOMESH_MAX_PROGRAM_SECS": "80"}},
    # smaller Krylov basis: ~40% less basis memory for the ceiling probe
    # (VERDICT r4 item 4 — largest single-chip scale)
    "restart6": {"restart": 6, "max_restarts": 17},
    # interface-elimination composition (device.MG_DEFAULTS.schur)
    "schur": {"mg_opts": {"schur": True}},
    "schur_ip1": {"mg_opts": {"schur": True, "interface_passes": 1}},
}


def run_one(scale: int, name: str):
    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother

    t0 = time.perf_counter()
    mesh = build_mesh(scale)
    info = classify(mesh)
    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()
    print(f"mesh: {mesh.num_points} nodes, built "
          f"{time.perf_counter()-t0:.1f} s", file=sys.stderr, flush=True)

    opts = dict(VARIANTS[name])
    # env-knob variants: set in this child process only (main() runs one
    # subprocess per variant, so nothing leaks across variants)
    for k, v in opts.pop("env", {}).items():
        os.environ[k] = v
    kw = dict(rtol=1e-6, atol=1e-8, restart=10, max_restarts=10)
    kw.update({k: v for k, v in opts.items() if k != "mg_opts"})
    dev = DeviceSmoother(mesh, info, mg_opts=opts.get("mg_opts"), **kw)
    # solve twice: the first run pays any compiles (new program
    # structures are variant-specific); the second, warm run is the
    # comparable per-solve number.
    t0 = time.perf_counter()
    dev.solve(coords.copy(), cf)
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev.solve(coords.copy(), cf)
    dt = time.perf_counter() - t0
    return {
        "variant": name, "scale": scale,
        "solve1_s_incl_compile": round(dt1, 1),
        "solve_s_warm": round(dt, 1),
        "granularity": dev.granularity,
        "linear_residual": dev.last_linear_residual,
        "converged": getattr(dev, "last_linear_converged", None),
        "mnodes_per_s_per_solve": round(mesh.num_points / dt / 1e6, 4),
    }


def main():
    """Each variant in its own subprocess: one scale-15 DeviceSmoother
    holds multiple GB of plan/context buffers, and two instances in one
    process ResourceExhausted the 16 GB chip."""
    import subprocess

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    names = sys.argv[2:] or ["base"]
    for name in names:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(scale), name],
            capture_output=True, text=True)
        line = (out.stdout.strip().splitlines() or [""])[-1]
        try:
            rec = json.loads(line)
            assert isinstance(rec, dict) and rec.get("variant")
        except (ValueError, AssertionError):
            # last line matching an exception pattern beats the literal
            # last line (JAX appends a traceback-filtering notice)
            lines = out.stderr.strip().splitlines() or ["no output"]
            errs = [ln for ln in lines
                    if "Error" in ln or "Exception" in ln
                    or "RESOURCE_EXHAUSTED" in ln or "ABORTED" in ln]
            rec = {"variant": name, "error": (errs or lines)[-1][:300]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        print(json.dumps(run_one(int(sys.argv[2]), sys.argv[3])))
        sys.exit(0)
    main()
