"""Multi-chip scaling measurement on a virtual device mesh.

VERDICT round-2 item 7: hardware has one chip, but the sharded solver on
an 8-virtual-CPU-device mesh gives a legitimate communication-volume and
convergence-vs-devices measurement for the north-star 16-block configs
(SURVEY.md section 5.7).  For D in {1, 2, 4, 8} this script solves ONE
linearized smoothing system on a 16-block grid mesh and records

  * FGMRES restart cycles (convergence must be ~independent of D —
    the glued preconditioner is the same operator regardless of how the
    blocks are laid out over devices),
  * static per-device exchange volume per schedule application (the
    point-to-point ppermute schedules: solution-stage S, face-halo F,
    and the per-MG-level glue), which must stay flat-or-falling as D
    grows at fixed mesh size (per-device volume is proportional to the
    interface points *owned* by a device, not to block count),
  * wall time and solve residual, and cross-D solution agreement.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/multichip_scaling.py [n_per_block] [out.json]
(The script re-execs itself with those env vars when needed.)
"""

import json
import os
import sys
import time

if __name__ == "__main__" and os.environ.get("_TM_MULTICHIP_CHILD") != "1":
    env = dict(os.environ)
    env["_TM_MULTICHIP_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags +
                            " --xla_force_host_platform_device_count=8")
    os.execve(sys.executable, [sys.executable, __file__] + sys.argv[1:], env)

import numpy as np
import jax

# the runtime's sitecustomize pins JAX_PLATFORMS=axon and ignores the
# env var — the config update is the only reliable way to stay on the
# virtual CPU device mesh (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turbomesh_tpu.mesh import Mesh, Block2d
from turbomesh_tpu.boundary import Side, Range, Connection
from turbomesh_tpu.clustering import Uniform
from turbomesh_tpu.smoothing.classify import classify
from turbomesh_tpu.smoothing.control_function import Laplace


def build_grid_mesh(n: int, rows: int = 4, cols: int = 4,
                    seed: int = 0) -> Mesh:
    """rows x cols conformal grid of n x n blocks (x along i, y along j),
    interiors perturbed so the linearized solve is non-trivial.  Interior
    grid corners are genuine 4-block junction points, so the laplacian/
    junction machinery is exercised under sharding."""
    mesh = Mesh()
    u = Uniform()(n)
    rng = np.random.default_rng(seed)
    for r in range(rows):
        for c in range(cols):
            x = c + u
            y = r + u
            pts = np.stack(np.meshgrid(x, y, indexing="ij"), axis=-1)
            pts[1:-1, 1:-1] += 0.3 / n * rng.standard_normal(
                pts[1:-1, 1:-1].shape)
            mesh.add_block(f"b{r}{c}", Block2d(points=pts))

    def bid(r, c):
        return r * cols + c

    m = n
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:  # right: i=n-1 face (J_MAX) <-> i=0 (J_MIN)
                mesh.connections.append(Connection((
                    Range(bid(r, c), Side.J_MAX, 0, m - 1),
                    Range(bid(r, c + 1), Side.J_MIN, 0, m - 1))))
            if r + 1 < rows:  # up: j=m-1 face (I_MAX) <-> j=0 (I_MIN)
                mesh.connections.append(Connection((
                    Range(bid(r, c), Side.I_MAX, 0, n - 1),
                    Range(bid(r + 1, c), Side.I_MIN, 0, n - 1))))
    return mesh


def exchange_volume_bytes(ex, itemsize: int, ncomp: int = 2) -> int:
    """Per-device bytes moved by ONE application of an Exchange schedule
    (offset 0 is the same-device gather: free)."""
    return sum(ex.lengths[o] for o in ex.offsets if o != 0) * itemsize * ncomp


def sweep(n: int, devices, picard: int, rtol: float, atol: float,
          label: str, checkpoint=None, sink=None):
    """One scaling sweep: for each device count, the FULL sharded Picard
    run loop (ShardedSmoother.run — field stays sharded across
    iterations) on a 16-block n x n-per-block mesh. Records setup time,
    per-iteration FGMRES restarts (flatness in D is the scaling
    evidence), exchange volumes, and cross-D solution agreement."""
    from turbomesh_tpu.parallel import ShardedSmoother

    mesh = build_grid_mesh(n)
    info = classify(mesh)
    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()

    section = {
        "label": label,
        "mesh": {"blocks": len(mesh.blocks), "block_size": [n, n],
                 "nodes": mesh.num_points},
        "picard_iterations": picard,
        "rtol": rtol,
        "runs": [],
    }
    if sink is not None:
        sink.append(section)
    sols = {}
    for D in devices:
        if D > len(jax.devices()):
            break
        t0 = time.perf_counter()
        sm = ShardedSmoother(mesh, info, n_devices=D, rtol=rtol, atol=atol)
        setup_s = time.perf_counter() - t0
        restarts, resid = [], []
        t0 = time.perf_counter()
        out, _, disp, n_done = sm.run(coords.copy(), cf.copy(), picard,
                                      residual_history=resid,
                                      restart_history=restarts)
        solve_s = time.perf_counter() - t0
        sols[D] = out
        vol_S = exchange_volume_bytes(sm.ex_S, 8)
        vol_F = exchange_volume_bytes(sm.ex_F, 8)
        vol_glue = [exchange_volume_bytes(ex, 4) for ex in sm.glue_ex]
        rec = {
            "n_devices": D,
            "blocks_per_device": sm.B // D,
            "picard_done": n_done,
            "fgmres_restarts_per_iter": restarts,
            "fgmres_iters_total": sum(restarts) * sm.restart,
            "picard_residuals": [float(r) for r in resid],
            "last_linear_residual": sm.last_linear_residual,
            "setup_s": round(setup_s, 2),
            "run_s": round(solve_s, 2),
            "setup_lt_solve": bool(setup_s < solve_s),
            "exchange_bytes_per_device_per_apply": {
                "solution_stage_S": vol_S,
                "face_halo_F": vol_F,
                "mg_glue_per_level": vol_glue,
            },
            "exchange_bytes_per_krylov_iter":
                2 * (vol_S + vol_F) + 4 * sum(vol_glue),
            "max_abs_diff_vs_firstD":
                float(np.abs(out - sols[devices[0]]).max())
                if devices[0] in sols else None,
        }
        section["runs"].append(rec)
        print(json.dumps(rec), flush=True)
        if checkpoint is not None:
            checkpoint()

    iters = [r["fgmres_iters_total"] for r in section["runs"]]
    section["iterations_flat_vs_devices"] = bool(
        iters and max(iters) - min(iters) <= 0.1 * max(iters) + 30)
    return section


def main():
    """Two-phase artifact (VERDICT r3 item 4):

    phase 1 (flatness): D in {1,2,4,8} at a moderate block size — the
        FGMRES iteration count must be ~independent of how the 16 blocks
        are laid out over devices.
    phase 2 (north-star shape): the largest per-block size CPU memory/
        time allows (>=513^2 -> >=4.2M nodes, BASELINE config 4 shape) on
        all 8 devices, full sharded Picard run loop, at the reference
        solver tolerance (GMRES.zig:21-24 rtol 1e-6).

    Usage: multichip_scaling.py [out.json] [n_flat] [n_big] [picard]
    Set n_flat or n_big to 0 to skip that phase.
    """
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MULTICHIP_SCALING.json"
    n_flat = int(sys.argv[2]) if len(sys.argv) > 2 else 257
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 513
    picard = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    result = {
        "devices_available": len(jax.devices()),
        "platform": jax.devices()[0].platform,
        "run_s_caveat": (
            "run_s GROWS with D on this host: the N virtual devices "
            "share ONE physical CPU core, so wall time measures host "
            "contention, not scaling. The scaling claim is the "
            "iteration counts (flat in D) and the cross-device "
            "solution agreement, which are host-independent."),
        "sweeps": [],
    }

    def checkpoint():
        # incremental write: a multi-hour single-core sweep must not
        # lose completed runs to a kill/timeout
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)

    if n_flat:
        sweep(n_flat, (1, 2, 4, 8), picard, rtol=1e-6, atol=1e-8,
              label="iteration-flatness vs device count",
              checkpoint=checkpoint, sink=result["sweeps"])
        checkpoint()
    if n_big:
        sweep(n_big, (8,), picard, rtol=1e-6, atol=1e-8,
              label="north-star shape (16 blocks, BASELINE config 4)",
              checkpoint=checkpoint, sink=result["sweeps"])
    checkpoint()
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
