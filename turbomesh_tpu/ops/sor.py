"""Pallas red-black SOR kernel for Winslow elliptic smoothing.

The reference's inner linear solves run ILU0-preconditioned Krylov over a
global CSR (GMRES.zig, BiCGStab.zig) — inherently sequential machinery.
The TPU-native alternative for block interiors is red-black
successive-over-relaxation: the checkerboard coloring makes every update
within a color independent, so a sweep is two fully-vectorized VPU passes
over the block held in VMEM. Coefficients are recomputed from the frozen
base coordinates on the fly (no 9-coefficient storage — VMEM stays small).

Kernel layout: all fields are 2-D (N, M) planes (x and y coordinate
components separate) so the lane dimension is the block's M axis —
(N, M, 2) arrays with a trailing dim of 2 do not map onto the 8x128 VPU
tiles and trip Mosaic reshape limitations.

Used as a standalone smoother for single-block problems and as a building
block for multigrid-style solvers; the Krylov path (krylov.py) remains the
general multi-block solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _half_sweep(bx, by, cfp, cfq, color_mask, omega, xx, xy):
    """One colored half-sweep; all operands full-grid 2-D (N, M) planes.

    Neighbor access is by circular shifts (jnp.roll lowers to tpu.rotate in
    Mosaic; jnp.pad of interior slices does not lower) — the wrapped values
    only reach boundary rows, which the color mask zeroes.
    """
    up = lambda z: jnp.roll(z, -1, axis=0)      # z_{i+1,j}
    dn = lambda z: jnp.roll(z, 1, axis=0)       # z_{i-1,j}
    rt = lambda z: jnp.roll(z, -1, axis=1)      # z_{i,j+1}
    lt = lambda z: jnp.roll(z, 1, axis=1)       # z_{i,j-1}

    x_xi_x = 0.5 * (up(bx) - dn(bx))
    x_xi_y = 0.5 * (up(by) - dn(by))
    x_eta_x = 0.5 * (rt(bx) - lt(bx))
    x_eta_y = 0.5 * (rt(by) - lt(by))
    g11 = x_xi_x * x_xi_x + x_xi_y * x_xi_y
    g22 = x_eta_x * x_eta_x + x_eta_y * x_eta_y
    g12 = x_xi_x * x_eta_x + x_xi_y * x_eta_y

    diag = -2.0 * (g11 + g22)
    c_ip = g22 * (1 + 0.5 * cfp)
    c_im = g22 * (1 - 0.5 * cfp)
    c_jp = g11 * (1 + 0.5 * cfq)
    c_jm = g11 * (1 - 0.5 * cfq)
    h = 0.5 * g12

    def res(z):
        return (
            diag * z
            + c_ip * up(z) + c_im * dn(z)
            + c_jp * rt(z) + c_jm * lt(z)
            - h * up(rt(z)) + h * up(lt(z))
            + h * dn(rt(z)) - h * dn(lt(z))
        )

    diag_safe = jnp.where(diag == 0.0, 1.0, diag)
    scale = (-omega) * color_mask / diag_safe
    xx = xx + scale * res(xx)
    xy = xy + scale * res(xy)
    return xx, xy


def _rb_sor_kernel(bx_ref, by_ref, cfp_ref, cfq_ref, red_ref, black_ref,
                   xx_ref, xy_ref, outx_ref, outy_ref, *, omega, sweeps):
    bx = bx_ref[:]
    by = by_ref[:]
    cfp = cfp_ref[:]
    cfq = cfq_ref[:]
    red = red_ref[:]
    black = black_ref[:]

    def one_sweep(_, xs):
        xx, xy = xs
        xx, xy = _half_sweep(bx, by, cfp, cfq, red, omega, xx, xy)
        xx, xy = _half_sweep(bx, by, cfp, cfq, black, omega, xx, xy)
        return (xx, xy)

    xx, xy = jax.lax.fori_loop(0, sweeps, one_sweep, (xx_ref[:], xy_ref[:]))
    outx_ref[:] = xx
    outy_ref[:] = xy


@functools.partial(jax.jit,
                   static_argnames=("omega", "sweeps", "use_pallas", "interpret"))
def red_black_sor(base, cf, x0, interior_mask, omega: float = 1.5,
                  sweeps: int = 10, use_pallas: bool = True,
                  interpret: bool = False):
    """Run `sweeps` red-black SOR sweeps of the frozen Winslow system.

    base, cf, x0: (N, M, 2); interior_mask: (N, M) bool (non-interior
    points are held fixed — Dirichlet). Returns the updated (N, M, 2) x.

    use_pallas=False runs the identical math as plain fused XLA ops (used
    on CPU and as a cross-check of the kernel).
    """
    N, M = x0.shape[:2]
    dt = x0.dtype
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
    red_plane = (((ii + jj) % 2 == 0) & interior_mask).astype(dt)
    black_plane = (((ii + jj) % 2 == 1) & interior_mask).astype(dt)

    bx, by = base[..., 0], base[..., 1]
    cfp, cfq = cf[..., 0], cf[..., 1]
    xx0, xy0 = x0[..., 0], x0[..., 1]

    if not use_pallas:
        def sweep(_, xs):
            xx, xy = xs
            xx, xy = _half_sweep(bx, by, cfp, cfq, red_plane, omega, xx, xy)
            xx, xy = _half_sweep(bx, by, cfp, cfq, black_plane, omega, xx, xy)
            return (xx, xy)

        xx, xy = jax.lax.fori_loop(0, sweeps, sweep, (xx0, xy0))
        return jnp.stack([xx, xy], axis=-1)

    kernel = functools.partial(_rb_sor_kernel, omega=omega, sweeps=sweeps)
    outx, outy = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((N, M), dt),
                   jax.ShapeDtypeStruct((N, M), dt)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(bx, by, cfp, cfq, red_plane, black_plane, xx0, xy0)
    return jnp.stack([outx, outy], axis=-1)
