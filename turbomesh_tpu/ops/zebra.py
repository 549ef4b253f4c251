"""Pallas zebra line-relaxation kernel — the multigrid smoother hot loop.

One call performs one colored half-sweep of zebra line relaxation on the
whole padded block stack: residual evaluation (9-point glued Winslow
stencil) + batched PCR tridiagonal solves along the line direction +
masked colored update, all fused into a single VMEM-resident kernel per
block (grid over the stack's leading axis). The XLA expression of the
same pass (multigrid._smooth_glued) issues ~50 separate ops per color —
on TPU the kernel replaces them with one launch.

Layout follows ops/sor.py: all operands are 2-D (Ng, Mg) ghost-shaped
planes (x/y components separate — trailing dims of 2 do not map onto the
8x128 VPU tiles), neighbor access is by circular shifts (jnp.roll lowers
to tpu.rotate; pads of interior slices do not lower), and wrapped values
only reach rows the selection mask zeroes.

Role parity: the inner relaxation of the reference's solver stack
(ILU0-preconditioned Krylov sweeps over the global CSR, GMRES.zig:477-488)
— re-designed as a colored line smoother because exact per-line solves
vectorize over all lines at once while ILU0 is inherently sequential.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pcr1(a, b, c, r1, axis, n):
    """Parallel cyclic reduction along ``axis`` for ONE rhs plane.

    a/b/c: sub/main/super diagonals, identity rows (a=c=0, b=1) decouple
    chains; r1: rhs plane. Same recurrence as krylov.tridiag_pcr,
    inlined for 2-D planes so it lowers inside the kernel.

    Kept single-rhs deliberately: carrying two rhs planes through one
    recurrence (the obvious flop saving) reliably crashes the Mosaic
    TPU compiler on the current runtime ("failed to legalize
    'func.return'", minimal reproducer in the repo history), while this
    single-rhs version compiles — _pcr2 below just runs it twice.
    """
    steps = max(1, int(math.ceil(math.log2(max(n, 2)))))
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)

    def shift(arr, s, fill):
        rolled = jnp.roll(arr, s, axis=axis)
        valid = ((idx - s >= 0) & (idx - s < n))
        return jnp.where(valid, rolled, fill)

    s = 1
    for _ in range(steps):
        a_m = shift(a, s, 0.0)
        b_m = shift(b, s, 1.0)
        c_m = shift(c, s, 0.0)
        r1_m = shift(r1, s, 0.0)
        a_p = shift(a, -s, 0.0)
        b_p = shift(b, -s, 1.0)
        c_p = shift(c, -s, 0.0)
        r1_p = shift(r1, -s, 0.0)

        alpha = -a / jnp.where(b_m == 0, 1.0, b_m)
        beta = -c / jnp.where(b_p == 0, 1.0, b_p)
        a2 = alpha * a_m
        c2 = beta * c_p
        b = b + alpha * c_m + beta * a_p
        a, c = a2, c2
        r1 = r1 + alpha * r1_m + beta * r1_p
        s *= 2

    return r1 / jnp.where(b == 0, 1.0, b)


def _pcr2(a, b, c, r1, r2, axis, n):
    """Two tridiagonal solves with shared diagonals (see _pcr1 note)."""
    return _pcr1(a, b, c, r1, axis, n), _pcr1(a, b, c, r2, axis, n)


def _zebra_math(bx, by, cfp, cfq, dl, d, du, msk, sel, rx, ry, zx, zy,
                axis, n):
    """Shared kernel math: residual of the glued Winslow stencil + line
    solve along ``axis`` + colored masked update. All planes (Ng, Mg).
    ``msk`` zeroes the rhs at non-smoothed rows — their identity line
    rows feed adjacent smoothed rows through the sub/super diagonals, so
    a garbage rhs there would corrupt the line solutions."""
    up = lambda z: jnp.roll(z, -1, axis=0)      # z_{i+1,j}
    dn = lambda z: jnp.roll(z, 1, axis=0)       # z_{i-1,j}
    rt = lambda z: jnp.roll(z, -1, axis=1)      # z_{i,j+1}
    lt = lambda z: jnp.roll(z, 1, axis=1)       # z_{i,j-1}

    x_xi = 0.5 * (up(bx) - dn(bx))
    y_xi = 0.5 * (up(by) - dn(by))
    x_eta = 0.5 * (rt(bx) - lt(bx))
    y_eta = 0.5 * (rt(by) - lt(by))
    g11 = x_xi * x_xi + y_xi * y_xi
    g22 = x_eta * x_eta + y_eta * y_eta
    g12 = x_xi * x_eta + y_xi * y_eta

    diag = -2.0 * (g11 + g22)
    c_ip = g22 * (1 + 0.5 * cfp)
    c_im = g22 * (1 - 0.5 * cfp)
    c_jp = g11 * (1 + 0.5 * cfq)
    c_jm = g11 * (1 - 0.5 * cfq)
    h = 0.5 * g12

    def apply_stencil(z):
        return (
            diag * z
            + c_ip * up(z) + c_im * dn(z)
            + c_jp * rt(z) + c_jm * lt(z)
            - h * up(rt(z)) + h * up(lt(z))
            + h * dn(rt(z)) - h * dn(lt(z))
        )

    resx = msk * (rx - apply_stencil(zx))
    resy = msk * (ry - apply_stencil(zy))
    solx, soly = _pcr2(dl, d, du, resx, resy, axis, n)
    return zx + sel * solx, zy + sel * soly


def _zebra_kernel(bx_ref, by_ref, cfp_ref, cfq_ref, dl_ref, d_ref, du_ref,
                  msk_ref, sel_ref, rx_ref, ry_ref, zx_ref, zy_ref,
                  outx_ref, outy_ref, *, axis, n):
    zx, zy = _zebra_math(
        bx_ref[:], by_ref[:], cfp_ref[:], cfq_ref[:], dl_ref[:], d_ref[:],
        du_ref[:], msk_ref[:], sel_ref[:], rx_ref[:], ry_ref[:],
        zx_ref[:], zy_ref[:], axis, n)
    outx_ref[:] = zx
    outy_ref[:] = zy


# rough VMEM budget: 14 planes resident per grid step must fit comfortably
_VMEM_PLANE_BUDGET = 12 * 2 ** 20

_PROBE_OK: bool | None = None


def pallas_service_ok() -> bool:
    """One-time probe: can this runtime compile a Pallas kernel at all?

    The tunneled remote compile service intermittently rejects Pallas
    programs wholesale (Mosaic HTTP-500s even for trivial kernels);
    gating on a cheap probe keeps large fused programs from failing to
    compile because of the embedded smoother kernel."""
    global _PROBE_OK
    if _PROBE_OK is None:
        try:
            def k(i_ref, o_ref):
                o_ref[:] = i_ref[:] + 1.0

            x = jnp.zeros((8, 128), jnp.float32)
            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
            jax.block_until_ready(out)
            _PROBE_OK = True
        except Exception:  # noqa: BLE001 — any compile failure disables
            _PROBE_OK = False
    return _PROBE_OK


def zebra_supported(B, Ng, Mg, dtype_bytes=4) -> bool:
    return 14 * Ng * Mg * dtype_bytes <= _VMEM_PLANE_BUDGET


@functools.partial(jax.jit, static_argnames=("axis", "use_pallas", "interpret"))
def zebra_pass(bx, by, cfp, cfq, dl, d, du, msk, sel, rx, ry, zx, zy,
               axis: int, use_pallas: bool = True, interpret: bool = False):
    """One colored zebra half-sweep over the stack.

    All operands (B, Ng, Mg) f32 ghost-shaped planes; ``axis`` is the
    line-solve direction within a plane (0 = i-lines, 1 = j-lines);
    ``msk`` = smooth mask, ``sel`` = msk x color parity. Returns the
    updated (zx, zy).
    """
    B, Ng, Mg = zx.shape
    n = Ng if axis == 0 else Mg

    if not use_pallas:
        f = jax.vmap(lambda *a: _zebra_math(*a, axis, n))
        return f(bx, by, cfp, cfq, dl, d, du, msk, sel, rx, ry, zx, zy)

    kernel = functools.partial(_zebra_kernel, axis=axis, n=n)
    # None squeezes the grid axis out of the kernel's refs -> (Ng, Mg)
    spec = pl.BlockSpec((None, Ng, Mg), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    outx, outy = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=(jax.ShapeDtypeStruct((B, Ng, Mg), zx.dtype),
                   jax.ShapeDtypeStruct((B, Ng, Mg), zy.dtype)),
        in_specs=[spec] * 13,
        out_specs=(spec, spec),
        interpret=interpret,
    )(bx, by, cfp, cfq, dl, d, du, msk, sel, rx, ry, zx, zy)
    return outx, outy
