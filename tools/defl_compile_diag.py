"""Pinpoint which staged program the XLA compiler crashes on under the
junction-deflation mode (defl_j) at a given scale.

tools/solve_rate_probe.py 15 defl_j died inside the TPU compiler
(HloPassPipeline CHECK) — this AOT-lowers + compiles each staged program
in sequence so the crasher is identified by the last line printed.

Usage: python tools/defl_compile_diag.py [scale]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: F401

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main(scale: int):
    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother

    mesh = build_mesh(scale)
    info = classify(mesh)
    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()
    dev = DeviceSmoother(mesh, info, rtol=1e-6, atol=1e-8,
                         restart=10, max_restarts=10,
                         mg_opts={"deflation": "j"})
    p = dev.plan
    X = jnp.asarray(p.pad_coords(coords).reshape(p.B, p.N, p.M, 2))
    C = jnp.asarray(p.pad_cf(cf).reshape(p.B, p.N, p.M, 2))
    plans = dev._plans_arg

    def step(name, fn):
        print(f"compile {name} ...", flush=True)
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        print(f"  {name} OK ({time.perf_counter() - t0:.1f} s)", flush=True)
        return out

    baseF, b = step("base", lambda: dev._jit_base(plans, X, C))
    ctx = step("prepare32(+defl galerkin)",
               lambda: dev._jit_prepare32(plans, baseF, C))
    r32 = (ctx["diag"].reshape(-1, 2).astype(jnp.float64) * b).astype(
        jnp.float32)
    step("defl_apply", lambda: dev._jit_defl(plans, ctx, r32))
    step("Minv", lambda: dev._jit_Minv(plans, ctx, r32))
    step("inner(fused gmres)",
         lambda: dev._jit_inner(plans, ctx, C, b, jnp.float32(1e-6)))
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
