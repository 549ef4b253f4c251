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

import contextlib
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
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


def _thomas_zebra_kernel(bx_ref, by_ref, cfp_ref, cfq_ref, dl_ref, d_ref,
                         du_ref, msk_ref, sel_ref, rx_ref, ry_ref, zx_ref,
                         zy_ref, outx_ref, outy_ref, cp_ref, px_ref, py_ref,
                         *, n):
    """Mosaic-compatible zebra half-sweep: residual + batched THOMAS
    line solves along axis 0 + colored update, one launch.

    The PCR variant above is the flop-optimal formulation, but this
    runtime's Mosaic crashes on any kernel that chains a computed value
    into the PCR recurrence ("failed to legalize 'func.return'").  The
    Thomas formulation sidesteps the crash pattern entirely: the
    recurrence runs as a fori_loop over VMEM scratch rows (cp/px/py),
    i.e. memory ops instead of one huge unrolled dataflow.  Lines are
    solved along the SUBLANE axis only — each elimination step is a
    (1, Mg) lane-vector op, so the sweep vectorizes across all lines of
    all columns; the caller transposes the planes for j-line sweeps.

    Scratch: cp = normalized superdiagonal c', px/py = forward-swept
    rhs, overwritten with the solution during back substitution.
    """
    zx, zy = zx_ref[:], zy_ref[:]
    msk = msk_ref[:]

    up = lambda z: jnp.roll(z, -1, axis=0)
    dn = lambda z: jnp.roll(z, 1, axis=0)
    rt = lambda z: jnp.roll(z, -1, axis=1)
    lt = lambda z: jnp.roll(z, 1, axis=1)

    bx, by = bx_ref[:], by_ref[:]
    x_xi = 0.5 * (up(bx) - dn(bx))
    y_xi = 0.5 * (up(by) - dn(by))
    x_eta = 0.5 * (rt(bx) - lt(bx))
    y_eta = 0.5 * (rt(by) - lt(by))
    g11 = x_xi * x_xi + y_xi * y_xi
    g22 = x_eta * x_eta + y_eta * y_eta
    g12 = x_xi * x_eta + y_xi * y_eta

    diag = -2.0 * (g11 + g22)
    cfp, cfq = cfp_ref[:], cfq_ref[:]
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

    px_ref[:] = msk * (rx_ref[:] - apply_stencil(zx))
    py_ref[:] = msk * (ry_ref[:] - apply_stencil(zy))

    # forward elimination (row 0: cp = du/d, p = p/d; d is 1 on ghost rows)
    d0 = d_ref[pl.ds(0, 1), :]
    d0 = jnp.where(d0 == 0, 1.0, d0)
    cp_ref[pl.ds(0, 1), :] = du_ref[pl.ds(0, 1), :] / d0
    px_ref[pl.ds(0, 1), :] = px_ref[pl.ds(0, 1), :] / d0
    py_ref[pl.ds(0, 1), :] = py_ref[pl.ds(0, 1), :] / d0

    def fwd(i, _):
        a = dl_ref[pl.ds(i, 1), :]
        cm = cp_ref[pl.ds(i - 1, 1), :]
        den = d_ref[pl.ds(i, 1), :] - a * cm
        den = jnp.where(den == 0, 1.0, den)
        cp_ref[pl.ds(i, 1), :] = du_ref[pl.ds(i, 1), :] / den
        px_ref[pl.ds(i, 1), :] = (
            px_ref[pl.ds(i, 1), :] - a * px_ref[pl.ds(i - 1, 1), :]) / den
        py_ref[pl.ds(i, 1), :] = (
            py_ref[pl.ds(i, 1), :] - a * py_ref[pl.ds(i - 1, 1), :]) / den
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)

    def bwd(k, _):
        i = n - 2 - k
        c = cp_ref[pl.ds(i, 1), :]
        px_ref[pl.ds(i, 1), :] = (px_ref[pl.ds(i, 1), :]
                                  - c * px_ref[pl.ds(i + 1, 1), :])
        py_ref[pl.ds(i, 1), :] = (py_ref[pl.ds(i, 1), :]
                                  - c * py_ref[pl.ds(i + 1, 1), :])
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)

    sel = sel_ref[:]
    outx_ref[:] = zx + sel * px_ref[:]
    outy_ref[:] = zy + sel * py_ref[:]


def _residual_kernel(bx_ref, by_ref, cfp_ref, cfq_ref, msk_ref, rx_ref,
                     ry_ref, zx_ref, zy_ref, outx_ref, outy_ref):
    """Masked residual of the glued Winslow stencil — rolls + elementwise
    only (the ops/sor.py op mix, which this runtime's Mosaic compiles)."""
    zx, zy = zx_ref[:], zy_ref[:]
    msk = msk_ref[:]

    up = lambda z: jnp.roll(z, -1, axis=0)
    dn = lambda z: jnp.roll(z, 1, axis=0)
    rt = lambda z: jnp.roll(z, -1, axis=1)
    lt = lambda z: jnp.roll(z, 1, axis=1)

    bx, by = bx_ref[:], by_ref[:]
    x_xi = 0.5 * (up(bx) - dn(bx))
    y_xi = 0.5 * (up(by) - dn(by))
    x_eta = 0.5 * (rt(bx) - lt(bx))
    y_eta = 0.5 * (rt(by) - lt(by))
    g11 = x_xi * x_xi + y_xi * y_xi
    g22 = x_eta * x_eta + y_eta * y_eta
    g12 = x_xi * x_eta + y_xi * y_eta

    diag = -2.0 * (g11 + g22)
    cfp, cfq = cfp_ref[:], cfq_ref[:]
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

    outx_ref[:] = msk * (rx_ref[:] - apply_stencil(zx))
    outy_ref[:] = msk * (ry_ref[:] - apply_stencil(zy))


def _pcr_kernel(dl_ref, d_ref, du_ref, r_ref, out_ref, *, axis, n):
    """One PCR tridiagonal solve, rhs read RAW from its input ref — the
    one dataflow shape this runtime's Mosaic accepts for the recurrence
    (chaining any computed value into it crashes; see _pcr1)."""
    out_ref[:] = _pcr1(dl_ref[:], d_ref[:], du_ref[:], r_ref[:], axis, n)


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


def zebra_variant() -> str:
    """Production kernel variant (TURBOMESH_ZEBRA):

    - "split" (default): residual kernel + raw-rhs PCR kernel + XLA
      update — the only dataflow decomposition this runtime's Mosaic
      accepts (computed-rhs recurrences and dynamic scratch indexing
      both crash it), and log-depth like "pcr".
    - "pcr": everything in ONE launch — fastest where Mosaic is healthy.
    - "thomas": fori_loop elimination over VMEM scratch rows.
    """
    import os

    return os.environ.get("TURBOMESH_ZEBRA", "split")


_KERNEL_OK: dict[str, bool] = {}

#: module-source hash: keys the persisted probe verdict to THIS kernel
#: code, so a later kernel fix invalidates stale "0" markers instead of
#: staying disabled until someone hand-deletes the file
_SRC_HASH: str | None = None

#: nesting counter for pallas_force_off() — a per-instance (not
#: process-global-env) way for a smoother that hit a Pallas failure to
#: disable the kernel while ITS programs trace, without leaking the
#: degradation into other instances
_FORCE_OFF = 0


def _src_hash() -> str:
    global _SRC_HASH
    if _SRC_HASH is None:
        import hashlib

        try:
            with open(__file__, "rb") as f:
                _SRC_HASH = hashlib.sha1(f.read()).hexdigest()[:10]
        except OSError:
            _SRC_HASH = "unknown"
    return _SRC_HASH


@contextlib.contextmanager
def pallas_force_off():
    """Disable the Pallas zebra kernel while tracing inside this context
    (checked by multigrid._use_zebra_pallas). Instance-scoped alternative
    to mutating TURBOMESH_PALLAS in os.environ."""
    global _FORCE_OFF
    _FORCE_OFF += 1
    try:
        yield
    finally:
        _FORCE_OFF -= 1


def pallas_forced_off() -> bool:
    return _FORCE_OFF > 0


def _transient_probe_failure(e) -> bool:
    """Crash-class failures (wedged compile service, dead TPU worker)
    say nothing about whether the KERNEL is acceptable — a verdict from
    one must not be persisted, or a healthy runtime stays disabled for
    every future process."""
    s = str(e)
    return ("UNAVAILABLE" in s or "worker process crashed" in s
            or "ABORTED" in s or "DEADLINE" in s
            or "TPU backend error" in s)


def _probe_marker_path(variant: str):
    """Persist the probe verdict next to the persistent compilation
    cache so repeat processes skip the (multi-minute on this runtime)
    probe compiles. The filename is keyed to the kernel source hash —
    a kernel change re-probes. Returns None when no cache dir is
    configured."""
    import pathlib

    loc = jax.config.jax_compilation_cache_dir
    if not loc:
        return None
    return (pathlib.Path(loc) /
            f"zebra_probe_{variant}_{jax.default_backend()}_"
            f"{_src_hash()}.ok")


def zebra_kernel_ok(variant: str = "thomas") -> bool:
    """One-time probe: does the zebra kernel itself compile and run on
    this runtime's Mosaic — at PRODUCTION-representative shapes?

    pallas_service_ok() only proves a trivial kernel compiles, and a
    tiny-shape kernel probe is not enough either: this runtime's Mosaic
    compiles the real kernel at (1, 8, 128) but HTTP-500s on the same
    kernel at (8, 123, 83) — the smallest shape the production V-cycle
    actually launches — and the crash both wedges the compile service
    for minutes and can kill the TPU worker mid-bench. So the probe
    runs the real kernel at a small-production shape along BOTH sweep
    axes; healthy runtimes pass and auto-enable, this one fails and
    cleanly disables. The verdict persists next to the compilation
    cache (delete the marker file to re-probe)."""
    if variant not in _KERNEL_OK:
        marker = _probe_marker_path(variant)
        prior_transient = False
        if marker is not None and marker.exists():
            txt = marker.read_text().strip()
            if txt in ("0", "1"):
                _KERNEL_OK[variant] = txt == "1"
                return _KERNEL_OK[variant]
            # "t1": the last probe failed for a transient crash-class
            # reason (wedged service / dead worker) — re-probe ONCE more;
            # a second transient failure disables this kernel version
            # (the probe itself can kill the TPU worker on this runtime,
            # so unbounded re-probing would crash every future process)
            prior_transient = txt == "t1"
        transient = False
        try:
            ok = True
            for (B, Ng, Mg), axis in (((1, 8, 128), 0),
                                      ((8, 123, 83), 0),
                                      ((8, 123, 83), 1)):
                z = jnp.zeros((B, Ng, Mg), jnp.float32)
                one = jnp.ones((B, Ng, Mg), jnp.float32)
                base = (jnp.cumsum(one, axis=1)
                        + jnp.cumsum(one, axis=2)) * 0.01
                out = zebra_pass(base, base, z, z, -one, 4.0 * one, -one,
                                 one, one, one, one, z, z, axis=axis,
                                 use_pallas=True, variant=variant)
                jax.block_until_ready(out)
                ok &= bool(np.isfinite(np.asarray(out[0])).all())
                if not ok:
                    break
            _KERNEL_OK[variant] = ok
        except Exception as e:  # noqa: BLE001 — any compile failure disables
            _KERNEL_OK[variant] = False
            transient = _transient_probe_failure(e)
            # A server-side Mosaic crash wedges the remote compile
            # helper for minutes, and the caller is typically about to
            # compile the real (non-Pallas) program — wait the wedge out
            # with trivial-kernel probes so the probe's failure cannot
            # poison the production compile. Client-side verification
            # errors don't touch the service; skip the wait for those.
            if "verification error" not in str(e):
                import time

                global _PROBE_OK
                for _ in range(20):
                    _PROBE_OK = None  # force a fresh service probe
                    if pallas_service_ok():
                        break
                    time.sleep(15)
        # Deterministic verdicts persist as 0/1. A transient crash-class
        # failure persists as "t1" the first time (one more process may
        # re-probe — the wedge may have been incidental) and hardens to
        # "0" the second time: unbounded re-probing is worse than a
        # false disable, because the probe itself can kill the worker.
        if marker is not None:
            val = "1" if _KERNEL_OK[variant] else (
                "0" if not transient else ("0" if prior_transient else "t1"))
            try:
                marker.write_text(val)
            except OSError:
                pass
    return _KERNEL_OK[variant]


@functools.partial(jax.jit,
                   static_argnames=("axis", "use_pallas", "interpret",
                                    "variant"))
def zebra_pass(bx, by, cfp, cfq, dl, d, du, msk, sel, rx, ry, zx, zy,
               axis: int, use_pallas: bool = True, interpret: bool = False,
               variant: str = "thomas"):
    """One colored zebra half-sweep over the stack.

    All operands (B, Ng, Mg) f32 ghost-shaped planes; ``axis`` is the
    line-solve direction within a plane (0 = i-lines, 1 = j-lines);
    ``msk`` = smooth mask, ``sel`` = msk x color parity. Returns the
    updated (zx, zy).

    variant: "split" (default — residual kernel + raw-rhs PCR kernel +
    XLA update, see zebra_variant), "pcr" (log-depth PCR fused into one
    launch), or "thomas" (fori_loop elimination over VMEM scratch rows;
    always solves along the sublane axis — j-line sweeps transpose the
    planes around the call, and the Winslow stencil is
    transpose-symmetric once P/Q swap roles).
    """
    B, Ng, Mg = zx.shape
    n = Ng if axis == 0 else Mg

    if not use_pallas:
        f = jax.vmap(lambda *a: _zebra_math(*a, axis, n))
        return f(bx, by, cfp, cfq, dl, d, du, msk, sel, rx, ry, zx, zy)

    # None squeezes the grid axis out of the kernel's refs -> (Ng, Mg)
    def plane_spec(Ngk, Mgk):
        return pl.BlockSpec((None, Ngk, Mgk), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    if variant == "thomas":
        ops = [bx, by, cfq, cfp, dl, d, du, msk, sel, rx, ry, zx, zy] \
            if axis == 1 else \
            [bx, by, cfp, cfq, dl, d, du, msk, sel, rx, ry, zx, zy]
        if axis == 1:
            ops = [jnp.swapaxes(o, 1, 2) for o in ops]
        Ngk, Mgk = ops[-1].shape[1:]
        spec = plane_spec(Ngk, Mgk)
        kernel = functools.partial(_thomas_zebra_kernel, n=Ngk)
        outx, outy = pl.pallas_call(
            kernel,
            grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, Ngk, Mgk), zx.dtype),
                       jax.ShapeDtypeStruct((B, Ngk, Mgk), zy.dtype)),
            in_specs=[spec] * 13,
            out_specs=(spec, spec),
            scratch_shapes=[pltpu.VMEM((Ngk, Mgk), zx.dtype)] * 3,
            interpret=interpret,
        )(*ops)
        if axis == 1:
            outx = jnp.swapaxes(outx, 1, 2)
            outy = jnp.swapaxes(outy, 1, 2)
        return outx, outy

    if variant == "split":
        # Two GRIDLESS launches per chunk of blocks, each a dataflow
        # this runtime's Mosaic accepts: residual (rolls + elementwise,
        # the ops/sor.py mix) then PCR with rhs raw from HBM; the
        # colored update stays in XLA (fuses with the caller). No grid:
        # the tunneled compile helper crashes on ANY gridded pallas
        # call (even a trivial elementwise kernel with a
        # block-indexed spec), while gridless full-VMEM kernels
        # compile — so chunks of blocks are flattened to one
        # (k*Ng, Mg) plane instead. Correctness of the flattening:
        # every block segment is bracketed by its own ghost rows,
        # which carry identity line-rows (dl=du=0, d=1 — they decouple
        # the tridiagonal chains) and a zero rhs mask, so cross-block
        # roll wrap-around only ever reaches rows whose update ``sel``
        # zeroes. The x/y solves share diagonals and batch along the
        # non-line axis (independent lines), not as a second
        # recurrence in one kernel (which crashes Mosaic).
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        dt = zx.dtype
        k = max(1, int(_VMEM_PLANE_BUDGET // (14 * Ng * Mg * 4)))
        outsx, outsy = [], []
        for c0 in range(0, B, k):
            kc = min(k, B - c0)
            L = kc * Ng
            fl = lambda v: v[c0:c0 + kc].reshape(L, Mg)
            resx, resy = pl.pallas_call(
                _residual_kernel,
                out_shape=(jax.ShapeDtypeStruct((L, Mg), dt),) * 2,
                in_specs=[full] * 9,
                out_specs=(full, full),
                interpret=interpret,
            )(*[fl(v) for v in (bx, by, cfp, cfq, msk, rx, ry, zx, zy)])
            cat_ax = 1 - axis   # batch x/y along the non-line axis
            rr = jnp.concatenate([resx, resy], axis=cat_ax)
            dlf, duf = fl(dl), fl(du)
            if axis == 0:
                # axis-0 lines span all kc blocks of the flattened
                # plane: cut the tridiagonal chains at block edges by
                # zeroing the off-diagonals there (a zero sub/super
                # diagonal entry stays zero through every PCR step, so
                # the isolation is exact — production planes already
                # carry identity ghost rows, but don't rely on it)
                rows = np.arange(L)
                dlf = dlf * jnp.asarray((rows % Ng != 0)[:, None], dt)
                duf = duf * jnp.asarray((rows % Ng != Ng - 1)[:, None], dt)
            dd = [jnp.concatenate([v, v], axis=cat_ax)
                  for v in (dlf, fl(d), duf)]
            nline = L if axis == 0 else Mg
            sol = pl.pallas_call(
                functools.partial(_pcr_kernel, axis=axis, n=nline),
                out_shape=jax.ShapeDtypeStruct(rr.shape, dt),
                in_specs=[full] * 4,
                out_specs=full,
                interpret=interpret,
            )(*dd, rr)
            solx, soly = ((sol[:, :Mg], sol[:, Mg:]) if axis == 0
                          else (sol[:L], sol[L:]))
            outsx.append(solx.reshape(kc, Ng, Mg))
            outsy.append(soly.reshape(kc, Ng, Mg))
        solx = (jnp.concatenate(outsx, axis=0) if len(outsx) > 1
                else outsx[0])
        soly = (jnp.concatenate(outsy, axis=0) if len(outsy) > 1
                else outsy[0])
        return zx + sel * solx, zy + sel * soly

    kernel = functools.partial(_zebra_kernel, axis=axis, n=n)
    spec = plane_spec(Ng, Mg)
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
