"""Compare V-I preconditioner compositions on the stationary iteration.

The V-I tail (tools/mg_contraction.py) is an interior<->face alternating
mode: the interface stage (I) perturbs face-adjacent interior residuals
AFTER the V-cycle (V) ran, and nothing damps that within one
application. Candidate fixes, measured here as stationary contraction
per unit work (one V-cycle + one A32 apply ~= 1.0 work units):

  VI      z = V then I (production baseline)            ~1.3 work
  VIV     V-I then one more V on the updated residual   ~2.3 work
  VIVI    two full V-I steps                            ~2.6 work
  VI22    V-I with pre=2/post=2 smoothing               ~2.1 work

The decision metric is iters/digit * work — lower is faster wall-clock.

Usage: python tools/mg_composition_exp.py [scale] [iters]
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


def measure(dev, plans, baseF, C, ctx, b, step, iters):
    x = dev._jit_zeros(b)
    r = b
    rn0 = float(dev._jit_norm(r))
    rates, prev = [], rn0
    for _ in range(iters):
        z = step(r)
        x, r, rn_dev = dev._jit_refine(plans, baseF, C, x, z, b)
        rn = float(rn_dev)
        rates.append(rn / prev)
        prev = rn
        if rn < 1e-14 * rn0:
            break
    tail = float(np.mean(rates[-5:]))
    return tail, rn0, prev


def main(scale=2, iters=25):
    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother

    mesh = build_mesh(scale)
    info = classify(mesh)
    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()

    results = {}
    for name, mg_opts, comp, work in [
        ("VI", None, "vi", 1.3),
        ("VIV", None, "viv", 2.3),
        ("VIVI", None, "vivi", 2.6),
        ("VI22", dict(pre=2, post=2), "vi", 2.1),
    ]:
        dev = DeviceSmoother(mesh, info, mg_opts=mg_opts)
        p = dev.plan
        X = jnp.asarray(p.pad_coords(coords).reshape(p.B, p.N, p.M, 2))
        C = jnp.asarray(p.pad_cf(cf).reshape(p.B, p.N, p.M, 2))
        plans = dev._plans_arg
        baseF, b = dev._jit_base(plans, X, C)
        ctx = dev._jit_prepare32(plans, baseF, C)

        # NOTE ON FRAMES: _stage_Minv acts on RAW residuals and returns
        # solution-frame corrections (in _solve_impl the M_s wrapper
        # multiplies by row_diag only to undo the equilibration of its
        # input). All composition below therefore stays in the raw frame:
        # z1 = Minv(r); r1 = r - A z1; z = z1 + {V(r1) | Minv(r1)}.
        def vi_step(r, dev=dev, plans=plans, ctx=ctx):
            r_s = dev._jit_equil(plans, ctx, r)[0]
            return dev._jit_Ms(plans, ctx, r_s)

        def a64(v, dev=dev, plans=plans, baseF=baseF, C=C):
            return dev._jit_apply64(plans, baseF, C, v)

        def vonly(r, dev=dev, plans=plans, ctx=ctx):
            z = dev._jit_vcycle(plans, ctx, jnp.asarray(r, jnp.float32))
            return jnp.asarray(z, jnp.float64)

        if comp == "vi":
            step = vi_step
        elif comp == "viv":
            def step(r, vi=vi_step, a=a64, vo=vonly):
                z1 = vi(r)
                r1 = r - a(z1)
                return z1 + vo(r1)
        else:  # vivi
            def step(r, vi=vi_step, a=a64):
                z1 = vi(r)
                r1 = r - a(z1)
                return z1 + vi(r1)

        t0 = time.perf_counter()
        tail, rn0, rn = measure(dev, plans, baseF, C, ctx, b, step, iters)
        dt = time.perf_counter() - t0
        ipd = 1.0 / max(-np.log10(tail), 1e-9)
        results[name] = (tail, ipd, ipd * work)
        print(f"{name:5s}: tail rho {tail:.3f}  iters/digit {ipd:5.1f}  "
              f"cost/digit {ipd * work:6.1f}  |r| {rn0:.2e}->{rn:.2e}  "
              f"({dt:.0f} s)", flush=True)

    best = min(results, key=lambda k: results[k][2])
    print(f"best by cost/digit: {best}")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
