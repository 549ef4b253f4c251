"""Quantify the mismatch between the glued V-cycle's finest-level
operator (_apply_glued on levels[0]) and the true f32 operator
(_stage_A32) per row kind.

Motivation: a stationary iteration with the V-cycle ALONE as M diverges
(rho 1.38, tools/mg_composition_exp.py) while V-I converges — so V
over/under-corrects rows where its glued stencil disagrees with the true
discretization, and the interface stage has been papering over it. The
V-cycle can only contract face/junction modes as well as its operator
matches there; this prints ||(A_glued - A_true) v|| localized by kind
for random v supported on each kind.

Usage: python tools/mg_operator_mismatch.py [scale]
"""

import os
import sys

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


def main(scale=1):
    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import Kind, classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother
    from turbomesh_tpu.smoothing.multigrid import MGLevel, _apply_glued

    mesh = build_mesh(scale)
    info = classify(mesh)
    dev = DeviceSmoother(mesh, info)
    p = dev.plan
    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()
    X = jnp.asarray(p.pad_coords(coords).reshape(p.B, p.N, p.M, 2))
    C = jnp.asarray(p.pad_cf(cf).reshape(p.B, p.N, p.M, 2))
    plans = dev._plans_arg
    baseF, b = dev._jit_base(plans, X, C)
    ctx = dev._jit_prepare32(plans, baseF, C)

    level0 = MGLevel(ctx["mg"][0])
    kind_pad = np.full(p.B * p.N * p.M, -1, dtype=np.int8)
    kind_pad[p.scatter_idx] = info.kind
    kind_field = kind_pad.reshape(p.B, p.N, p.M)
    smooth_mask = np.asarray(level0.interior)

    rng = np.random.default_rng(0)
    results = {}
    for kd in (Kind.INTERIOR, Kind.SMOOTHED, Kind.LAPLACIAN, Kind.SLIDING):
        sup = (kind_field == kd) & smooth_mask
        v = np.zeros((p.B, p.N, p.M, 2), np.float32)
        v[sup] = rng.standard_normal((int(sup.sum()), 2)).astype(np.float32)
        vj = jnp.asarray(v)
        a_true = np.asarray(dev._jit_A32(plans, ctx, vj.reshape(-1, 2)))
        a_glued = np.asarray(
            _apply_glued(level0, vj)).reshape(-1, 2)
        diff = (a_true - a_glued).reshape(p.B, p.N, p.M, 2)
        at = np.abs(a_true).max() or 1.0
        # where does the difference land?
        d2 = (diff ** 2).sum(-1)
        tot = d2.sum()
        print(f"support {kd.name:9s}: ||dA v||_inf/||Av||_inf = "
              f"{np.abs(diff).max() / at:.3e}  (total {np.sqrt(tot):.3e})")
        if tot > 0:
            for kd2 in Kind:
                fr = d2[kind_field == kd2].sum() / tot
                if fr > 0.01:
                    print(f"    lands on {kd2.name:9s}: {fr:.3f}")
        results[kd.name] = float(np.abs(diff).max() / at)


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:2]])
