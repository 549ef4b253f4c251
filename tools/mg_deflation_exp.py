"""Prototype coarse-space deflation for the V-I preconditioner.

tools/mg_slow_mode.py identified the stationary tail as a GLOBAL smooth
y-translation: outlet-side blocks shift near-rigidly (sliding BCs let y
float), decaying smoothly to the fixed blade — a near-null mode no
block-local solve or glued V-cycle contracts (measured rho 0.988; even
exact interior+interface block solves give 0.994).

Standard two-level DD fix: deflate with a per-block bilinear coarse
space W (per block, 4 corner hat functions, y component; optionally x),
solved exactly via the K x K Petrov-Galerkin system G = W^T A W:

    alpha = G^-1 W^T r ;  z0 = W alpha ;  r' = r - (A W) alpha
    z = z0 + VI(r')

A W is precomputed (K operator applies at prepare time), so each
application costs two (K, 2P) matmuls + a K x K solve — negligible next
to a V-cycle, and MXU-shaped on TPU.

Usage: python tools/mg_deflation_exp.py [scale] [iters] [with_x]
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


def _lagrange_profiles(n, order):
    """order+1 Lagrange basis profiles on a uniform parameter in [0,1]."""
    t = np.linspace(0.0, 1.0, n)
    nodes = np.linspace(0.0, 1.0, order + 1)
    profs = []
    for k, xk in enumerate(nodes):
        pk = np.ones_like(t)
        for m, xm in enumerate(nodes):
            if m != k:
                pk = pk * (t - xm) / (xk - xm)
        profs.append(pk)
    return profs


def build_bilinear_basis(plan, block_sizes, with_x=False, order=1):
    """(K, B*N*M*2) f64: per block, tensor-Lagrange hats of the given
    order over the block's REAL extents, zero on padding; y component
    (+ x if with_x)."""
    B, N, M = plan.B, plan.N, plan.M
    cols = []
    for b, (ni, nj) in enumerate(block_sizes):
        for fu0 in _lagrange_profiles(ni, order):
            fu = np.zeros((N,))
            fu[:ni] = fu0
            for fv0 in _lagrange_profiles(nj, order):
                fv = np.zeros((M,))
                fv[:nj] = fv0
                hat = np.zeros((B, N, M))
                hat[b] = fu[:, None] * fv[None, :]
                comps = (1,) if not with_x else (0, 1)
                for c in comps:
                    w = np.zeros((B, N, M, 2))
                    w[..., c] = hat
                    cols.append(w.reshape(-1))
    W = np.stack(cols, axis=0)
    free = np.asarray(plan.free_mask, bool).reshape(-1)
    W[:, ~free] = 0.0
    return W


def main(scale=2, iters=30, with_x=0, order=1):
    from bench import build_mesh
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.control_function import Laplace
    from turbomesh_tpu.smoothing.device import DeviceSmoother

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

    W = build_bilinear_basis(dev.plan, dev._block_sizes, bool(with_x), order)
    K = W.shape[0]
    print(f"coarse space: K = {K}", flush=True)
    AW = np.stack(
        [np.asarray(dev._jit_apply64(plans, baseF, C,
                                     jnp.asarray(w.reshape(-1, 2)))).ravel()
         for w in W], axis=0)
    G = W @ AW.T  # G[i, j] = w_i . A w_j
    # rank guard: hats on tiny/fully-fixed blocks can be ~0 after masking
    keep = np.abs(np.diag(G)) > 1e-12 * max(np.abs(np.diag(G)).max(), 1e-30)
    W, AW, G = W[keep], AW[keep], G[np.ix_(keep, keep)]
    K = W.shape[0]
    Ginv = np.linalg.pinv(G, rcond=1e-12)
    print(f"kept K = {K}, cond(G) = {np.linalg.cond(G):.2e}", flush=True)

    def deflate(r):
        rv = np.asarray(r).ravel()
        alpha = Ginv @ (W @ rv)
        z0 = (alpha @ W).reshape(-1, 2)
        r1 = rv - alpha @ AW
        return jnp.asarray(z0), jnp.asarray(r1.reshape(-1, 2))

    def vi(r):
        r_s = dev._jit_equil(plans, ctx, r)[0]
        return dev._jit_Ms(plans, ctx, r_s)

    x = dev._jit_zeros(b)
    r = b
    rn0 = float(dev._jit_norm(r))
    prev, rates = rn0, []
    for k in range(iters):
        z0, r1 = deflate(r)
        z = z0 + vi(r1)
        x, r, rn_dev = dev._jit_refine(plans, baseF, C, x, z, b)
        rn = float(rn_dev)
        rates.append(rn / prev)
        print(f"iter {k:2d}: |r| = {rn:.3e}  rate {rn / prev:.3f}",
              flush=True)
        prev = rn
        if rn < 1e-13 * rn0:
            break
    print(f"asymptotic contraction ~ {np.mean(rates[-5:]):.3f}")


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:5]])
