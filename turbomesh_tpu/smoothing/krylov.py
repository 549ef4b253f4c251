"""Shared Krylov solvers and the line-implicit preconditioner.

Replaces the reference's GMRES(30)+ILU0 / BiCGStab machinery (GMRES.zig,
BiCGStab.zig). ILU0 is inherently sequential, so the TPU preconditioner is
**line-implicit**: exact tridiagonal solves along the j-direction of every
block line (the wall-normal, strongly-clustered direction in O-grid
boundary layers where the Winslow system is most anisotropic), batched
over all lines — the "Thomas kernel" of the north star. Lines are
independent, so the preconditioner is embarrassingly parallel across
blocks/chips and needs no communication.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("turbomesh.krylov")


def _warn_nonconverged(name: str, iters: int, resid: float, tol: float):
    """Reference behavior: a stalled Krylov solve is a loud warning, not a
    silent return (GMRES.zig:422, BiCGStab.zig:369)."""
    log.warning("%s solve did not converge: iter=%d, residual=%.3e (tol %.3e)",
                name, iters, resid, tol)


def restarted_gmres(A, b, M_inv, dot, rtol, atol, restart, max_restarts):
    """Right-preconditioned restarted GMRES.

    A: linear operator on pytrees shaped like b (here: arrays)
    M_inv: preconditioner application
    dot: inner product (psum'd under shard_map)
    Returns (x, final_residual_norm).
    """
    bnorm = jnp.sqrt(dot(b, b))
    tol = jnp.maximum(rtol * bnorm, atol)
    m = restart

    def gmres_cycle(x):
        r = b - A(x)
        beta = jnp.sqrt(dot(r, r))
        V = jnp.zeros((m + 1,) + b.shape, b.dtype)
        V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))
        H = jnp.zeros((m + 1, m), b.dtype)

        def arnoldi(k, carry):
            V, H = carry
            w = A(M_inv(V[k]))

            def mgs(i, wh):
                w, H = wh
                hik = dot(w, V[i])
                H = H.at[i, k].set(jnp.where(i <= k, hik, H[i, k]))
                w = jnp.where(i <= k, w - hik * V[i], w)
                return (w, H)

            w, H = jax.lax.fori_loop(0, m, mgs, (w, H))
            hk1 = jnp.sqrt(dot(w, w))
            H = H.at[k + 1, k].set(hk1)
            V = V.at[k + 1].set(w / jnp.where(hk1 == 0, 1.0, hk1))
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))
        e1 = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
        y = _lsq_givens(H, e1, m)
        dx = jnp.tensordot(y, V[:m], axes=1)
        return x + M_inv(dx)

    def cond(state):
        i, x, rn = state
        return jnp.logical_and(i < max_restarts, rn > tol)

    def body(state):
        i, x, _ = state
        x = gmres_cycle(x)
        r = b - A(x)
        return (i + 1, x, jnp.sqrt(dot(r, r)))

    x0 = jnp.zeros_like(b)
    _, x, rn = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), x0, jnp.asarray(jnp.inf, b.dtype)))
    return x, rn


def fgmres_one_cycle(A, b, M_inv, dot, m, x):
    """One FGMRES(m) restart cycle from iterate ``x``: Arnoldi over the
    preconditioned directions Z, Givens least-squares, update. Returns
    (x1, r1, ||r1||). Split out of restarted_fgmres so callers can run
    ONE cycle per device program and carry ``x`` across calls — the
    tunneled TPU runtime kills any single program execution beyond
    ~100 s, which caps how much Krylov work one dispatch may do at
    multi-million-node scale."""
    r = b - A(x)
    beta = jnp.sqrt(dot(r, r))
    V = jnp.zeros((m + 1,) + b.shape, b.dtype)
    V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))
    Z = jnp.zeros((m,) + b.shape, b.dtype)
    H = jnp.zeros((m + 1, m), b.dtype)

    def arnoldi(k, carry):
        V, Z, H = carry
        z = M_inv(V[k])
        Z = Z.at[k].set(z)
        w = A(z)

        def mgs(i, wh):
            w, H = wh
            hik = dot(w, V[i])
            H = H.at[i, k].set(jnp.where(i <= k, hik, H[i, k]))
            w = jnp.where(i <= k, w - hik * V[i], w)
            return (w, H)

        w, H = jax.lax.fori_loop(0, m, mgs, (w, H))
        hk1 = jnp.sqrt(dot(w, w))
        H = H.at[k + 1, k].set(hk1)
        V = V.at[k + 1].set(w / jnp.where(hk1 == 0, 1.0, hk1))
        return (V, Z, H)

    V, Z, H = jax.lax.fori_loop(0, m, arnoldi, (V, Z, H))
    e1 = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
    y = _lsq_givens(H, e1, m)
    x1 = x + jnp.tensordot(y, Z, axes=1)
    r1 = b - A(x1)
    return x1, r1, jnp.sqrt(dot(r1, r1))


def restarted_fgmres(A, b, M_inv, dot, rtol, atol, restart, max_restarts,
                     w2=None, tol2=None, return_restarts=False):
    """Flexible restarted GMRES (FGMRES, Saad 1993): stores the
    preconditioned directions Z_k = M_inv(V_k) and forms the update from
    Z, so M_inv may vary between applications — required when the
    preconditioner runs in a lower precision than the Krylov iteration
    (each f32 application is a slightly different linear operator, which
    breaks the Arnoldi relation of standard right-preconditioned GMRES).

    Optional secondary stop test: when ``w2``/``tol2`` are given, the
    iteration also stops once ``||w2 * r|| <= tol2`` — used to pair the
    equilibrated (row-relative) criterion with the reference's plain
    residual criterion, whichever is met first.

    Same fused structure as restarted_gmres (lax loops, one jittable
    program); costs one extra basis copy of memory. Returns
    (x, primary_residual_norm).
    """
    bnorm = jnp.sqrt(dot(b, b))
    tol = jnp.maximum(rtol * bnorm, atol)
    m = restart

    def not_done(r, rn):
        live = rn > tol
        if w2 is not None:
            rn2 = jnp.sqrt(dot(w2 * r, w2 * r))
            live = jnp.logical_and(live, rn2 > tol2)
        return live

    def cond(state):
        i, x, rn, live = state
        return jnp.logical_and(i < max_restarts, live)

    def body(state):
        i, x, _, _ = state
        x, r, rn = fgmres_one_cycle(A, b, M_inv, dot, m, x)
        return (i + 1, x, rn, not_done(r, rn))

    x0 = jnp.zeros_like(b)
    i, x, rn, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), x0, jnp.asarray(jnp.inf, b.dtype),
                     jnp.asarray(True)))
    if return_restarts:
        return x, rn, i
    return x, rn


def _lsq_givens(H, g, m):
    """Least squares min ||H y - g|| for Hessenberg H (m+1, m) via Givens
    rotations + back substitution. Uses only elementwise ops — LAPACK-style
    custom calls (SVD/QR) are not available on all TPU runtimes.
    Statically unrolled: m is small (the GMRES restart)."""
    R = H
    for k in range(m):
        a, b_ = R[k, k], R[k + 1, k]
        r = jnp.sqrt(a * a + b_ * b_)
        safe = jnp.where(r == 0, 1.0, r)
        c = jnp.where(r == 0, 1.0, a / safe)
        s = jnp.where(r == 0, 0.0, b_ / safe)
        Rk = c * R[k] + s * R[k + 1]
        Rk1 = -s * R[k] + c * R[k + 1]
        R = R.at[k].set(Rk).at[k + 1].set(Rk1)
        gk = c * g[k] + s * g[k + 1]
        gk1 = -s * g[k] + c * g[k + 1]
        g = g.at[k].set(gk).at[k + 1].set(gk1)
    y = jnp.zeros(m, H.dtype)
    for k in range(m - 1, -1, -1):
        num = g[k] - jnp.dot(R[k, k + 1 : m], y[k + 1 : m])
        y = y.at[k].set(num / jnp.where(R[k, k] == 0, 1.0, R[k, k]))
    return y


def host_gmres(A, M_inv, b, rtol, atol, restart, max_restarts):
    """Restarted GMRES with host-side control flow over device arrays.

    A and M_inv are (separately jitted) device functions; the Arnoldi /
    Givens bookkeeping runs in NumPy on scalars pulled from device. Each
    iteration costs a couple of host-device syncs — slower than the fused
    while_loop version (restarted_gmres) but compiles each small piece
    independently, which sidesteps TPU-runtime failures on very large
    fused programs.
    """
    import numpy as onp

    bnorm = float(jnp.linalg.norm(b))
    tol = max(rtol * bnorm, atol)
    m = restart

    x = jnp.zeros_like(b)
    rn = onp.inf
    for _ in range(max_restarts):
        r = b - A(x)
        beta = float(jnp.linalg.norm(r))
        rn = beta
        if beta <= tol:
            break
        V = [r / beta]
        H = onp.zeros((m + 1, m))
        k_used = m
        for k in range(m):
            w = A(M_inv(V[k]))
            for i in range(k + 1):
                hik = float(jnp.vdot(V[i], w).real) if w.ndim == 1 else float(
                    jnp.sum(V[i] * w))
                H[i, k] = hik
                w = w - hik * V[i]
            hk1 = float(jnp.linalg.norm(w))
            H[k + 1, k] = hk1
            if hk1 == 0.0:
                k_used = k + 1
                break
            V.append(w / hk1)
        e1 = onp.zeros(m + 1)
        e1[0] = beta
        y, *_ = onp.linalg.lstsq(H[: k_used + 1, :k_used], e1[: k_used + 1],
                                 rcond=None)
        dx = V[0] * y[0]
        for i in range(1, k_used):
            dx = dx + y[i] * V[i]
        x = x + M_inv(dx)
    else:
        r = b - A(x)
        rn = float(jnp.linalg.norm(r))
    if rn > tol:
        _warn_nonconverged("gmres(host)", max_restarts * m, rn, tol)
    return x, rn


def host_fgmres(A, M_inv, b, x0, rtol, atol, restart, max_restarts, *,
                dot, axpy, scale, norm, warn_name=None, stop_check=None):
    """Flexible restarted GMRES with host-side control flow and
    INJECTED jitted vector primitives — the large-mesh workhorse.

    Three TPU-runtime constraints shape it (see DeviceSmoother.
    _solve_staged_dev): the fused while_loop program trips a ~100 s
    per-execution watchdog, the one-restart-per-program variant crashes
    the remote compiler above ~5M nodes, and EAGER device ops on big
    (P, 2) fields insert 64x-padded layout copies. So each A / M_inv /
    axpy / dot application is its own small jitted program; Arnoldi and
    Givens bookkeeping run in NumPy on pulled scalars. Per-iteration
    dispatch overhead is a few ms — noise next to the multi-second
    operator applications at multi-million-node scale.

    dot(u, v) -> device scalar; axpy(w, v, a) -> w + a*v (a: scalar);
    scale(v, a) -> a*v; norm(v) -> device scalar.
    stop_check(x) -> bool: optional secondary stop criterion evaluated
    once per restart cycle (e.g. the caller's PLAIN-residual tolerance
    when this solve runs in an equilibrated frame); True ends the solve.
    Returns (x, rn, iters_done).
    """
    import numpy as onp

    bnorm = float(norm(b))
    tol = max(rtol * bnorm, atol)
    m = restart

    x = x0
    rn = onp.inf
    iters = 0
    for cyc in range(max_restarts):
        r = axpy(b, A(x), -1.0)
        beta = float(norm(r))
        rn = beta
        log.debug("host_fgmres cycle %d: residual %.3e (tol %.3e, %d iters)",
                  cyc, beta, tol, iters)
        if beta <= tol:
            break
        if stop_check is not None and stop_check(x):
            break
        V = [scale(r, 1.0 / beta)]
        Z = []
        H = onp.zeros((m + 1, m))
        k_used = m
        for k in range(m):
            z = M_inv(V[k])
            Z.append(z)
            w = A(z)
            for i in range(k + 1):
                hik = float(dot(V[i], w))
                H[i, k] = hik
                w = axpy(w, V[i], -hik)
            hk1 = float(norm(w))
            H[k + 1, k] = hk1
            iters += 1
            if hk1 == 0.0:
                k_used = k + 1
                break
            V.append(scale(w, 1.0 / hk1))
        e1 = onp.zeros(m + 1)
        e1[0] = beta
        y, *_ = onp.linalg.lstsq(H[: k_used + 1, :k_used],
                                 e1[: k_used + 1], rcond=None)
        for i in range(k_used):
            x = axpy(x, Z[i], float(y[i]))
        del V, Z  # free the basis buffers before the next cycle
    else:
        rn = float(norm(axpy(b, A(x), -1.0)))
    if rn > tol and warn_name:
        _warn_nonconverged(warn_name, iters, rn, tol)
    return x, rn, iters


def thomas(dl, d, du, rhs):
    """Batched tridiagonal solve along the LAST-but-one axis of rhs.

    dl, d, du: (..., M) sub/main/super diagonals (dl[...,0] and du[...,M-1]
    ignored); rhs: (..., M, C). Sequential Thomas via lax.scan over M —
    each step is a fused vector op over the batch; the batch is all block
    lines x 2 components, so the VPU stays busy.
    """
    # forward sweep
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        dl_k, d_k, du_k, r_k = inp
        denom = d_k - dl_k * cp_prev
        denom = jnp.where(denom == 0, 1.0, denom)
        cp = du_k / denom
        dp = (r_k - dl_k[..., None] * dp_prev) / denom[..., None]
        return (cp, dp), (cp, dp)

    Mn = d.shape[-1]
    dl_t = jnp.moveaxis(dl, -1, 0)
    d_t = jnp.moveaxis(d, -1, 0)
    du_t = jnp.moveaxis(du, -1, 0)
    r_t = jnp.moveaxis(rhs, -2, 0)

    cp0 = jnp.zeros_like(d_t[0])
    dp0 = jnp.zeros_like(r_t[0])
    _, (cps, dps) = jax.lax.scan(fwd, (cp0, dp0), (dl_t, d_t, du_t, r_t))

    # back substitution
    def bwd(x_next, inp):
        cp_k, dp_k = inp
        x = dp_k - cp_k[..., None] * x_next
        return x, x

    xM = dps[-1]
    _, xs = jax.lax.scan(bwd, xM, (cps[:-1], dps[:-1]), reverse=True)
    x = jnp.concatenate([xs, xM[None]], axis=0)
    return jnp.moveaxis(x, 0, -2)


def gauss_solve_f64(A, b):
    """Dense f64 solve of a SMALL (K, K) system in plain arithmetic.

    ``jnp.linalg.solve`` lowers to XLA's LuDecomposition custom op,
    which this TPU runtime implements only for f32/c64 — compiling an
    f64 solve aborts the whole program ("Only F32 and C64 types are
    implemented in LuDecomposition; got shape f64[24,24]", the
    deflation Galerkin solve at scale 15). The coarse-space algebra
    must stay f64 (an f32 solve biases exactly the modes deflation
    exists to eliminate and stalls the outer FGMRES — see
    DeviceSmoother._defl_galerkin), so: Gauss-Jordan elimination with
    partial pivoting via lax.fori_loop. O(K^3) scalar-ish work is
    irrelevant at K <= O(100) coarse columns, and every op lowers to
    supported f64 arithmetic on any backend.
    """
    n = A.shape[0]
    Ab = jnp.concatenate([A, b[:, None]], axis=1)  # (n, n+1)
    idx = jnp.arange(n)

    def body(k, Ab):
        col = jnp.abs(Ab[:, k])
        col = jnp.where(idx < k, -1.0, col)  # pivot from rows >= k
        p = jnp.argmax(col)
        rk, rp = Ab[k], Ab[p]
        Ab = Ab.at[k].set(rp).at[p].set(rk)
        piv = Ab[k]
        den = piv[k]
        # a singular system must surface as NaN (like jnp.linalg.solve
        # would), not as a finite-but-wrong solution
        den = jnp.where(den == 0.0, jnp.nan, den)
        piv = piv / den
        Ab = Ab - Ab[:, k][:, None] * piv[None, :]
        return Ab.at[k].set(piv)

    Ab = jax.lax.fori_loop(0, n, body, Ab)
    return Ab[:, n]


def tridiag_pcr(dl, d, du, rhs):
    """Parallel cyclic reduction tridiagonal solve along the last-but-one
    axis of rhs; same signature/semantics as thomas().

    O(n log n) work in ceil(log2 n) fully-vectorized steps — latency-
    friendly on TPU for long lines (the sequential Thomas scan pays one
    VPU dispatch per grid line point). Out-of-range neighbors are treated
    as identity rows (a=c=0, b=1, d=0).
    """
    n = d.shape[-1]
    steps = max(1, int(np.ceil(np.log2(n))))

    a = dl
    b = d
    c = du
    r = rhs  # (..., n, C)

    def shift(arr, s, fill):
        """arr shifted so out[i] = arr[i - s], out-of-range -> fill."""
        rolled = jnp.roll(arr, s, axis=-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
        valid = (idx - s >= 0) & (idx - s < n)
        return jnp.where(valid, rolled, fill)

    def shift_r(arr, s, fill):
        rolled = jnp.roll(arr, s, axis=-2)
        idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 2)
        valid = (idx - s >= 0) & (idx - s < n)
        return jnp.where(valid, rolled, fill)

    s = 1
    for _ in range(steps):
        a_m = shift(a, s, 0.0)
        b_m = shift(b, s, 1.0)
        c_m = shift(c, s, 0.0)
        r_m = shift_r(r, s, 0.0)
        a_p = shift(a, -s, 0.0)
        b_p = shift(b, -s, 1.0)
        c_p = shift(c, -s, 0.0)
        r_p = shift_r(r, -s, 0.0)

        alpha = -a / jnp.where(b_m == 0, 1.0, b_m)
        beta = -c / jnp.where(b_p == 0, 1.0, b_p)

        a = alpha * a_m
        c = beta * c_p
        b = b + alpha * c_m + beta * a_p
        r = r + alpha[..., None] * r_m + beta[..., None] * r_p
        s *= 2

    return r / jnp.where(b == 0, 1.0, b)[..., None]


# threshold above which PCR beats the sequential scan on TPU
_PCR_MIN_LEN = 128


def tridiag_solve(dl, d, du, rhs):
    """Dispatch: sequential Thomas scan for short lines, PCR for long."""
    if d.shape[-1] >= _PCR_MIN_LEN:
        return tridiag_pcr(dl, d, du, rhs)
    return thomas(dl, d, du, rhs)


def build_line_precond_i(baseX, cf, diag_field, interior_mask):
    """i-direction analog of build_line_precond: tridiagonal factors along i
    with the xi-coupling coefficients g22(1 +/- P/2)."""
    x_xi = 0.5 * (baseX[:, 2:, 1:-1] - baseX[:, :-2, 1:-1])
    x_eta = 0.5 * (baseX[:, 1:-1, 2:] - baseX[:, 1:-1, :-2])
    g22 = jnp.sum(x_eta * x_eta, axis=-1)
    P = cf[:, 1:-1, 1:-1, 0]

    c_ip1 = g22 * (1 + 0.5 * P)
    c_im1 = g22 * (1 - 0.5 * P)

    pad = lambda a: jnp.pad(a, ((0, 0), (1, 1), (1, 1)))
    dl = jnp.where(interior_mask, pad(c_im1), 0.0)
    du = jnp.where(interior_mask, pad(c_ip1), 0.0)
    d = jnp.where(interior_mask, diag_field[..., 0], 1.0)
    return dl, d, du


def apply_line_precond_i(dl, d, du, diag_field, free_mask, interior_mask, v):
    """Tridiagonal solve along i (axis 1). Transpose to put i last-but-one."""
    vt = jnp.swapaxes(v, 1, 2)           # (B, M, N, 2)
    sol = tridiag_solve(jnp.swapaxes(dl, 1, 2), jnp.swapaxes(d, 1, 2),
                        jnp.swapaxes(du, 1, 2), vt)
    sol = jnp.swapaxes(sol, 1, 2)
    inv_diag = 1.0 / jnp.where(diag_field == 0.0, 1.0, diag_field)
    out = jnp.where(interior_mask[..., None], sol, v * inv_diag)
    return jnp.where(free_mask, out, 0.0)


def build_line_precond(baseX, cf, diag_field, interior_mask):
    """Line-implicit preconditioner factors along j.

    baseX: (B, N, M, 2) frozen coords; cf: (B, N, M, 2) control function;
    diag_field: (B, N, M, 2) the full-system diagonal (boundary rows
    included); interior_mask: (B, N, M).

    Returns (dl, d, du): (B, N, M) tridiagonal factors where interior rows
    carry the j-coupling Winslow coefficients and all other rows are
    diagonal (decoupled), so M^-1 is exact on lines and Jacobi elsewhere.
    """
    x_xi = 0.5 * (baseX[:, 2:, 1:-1] - baseX[:, :-2, 1:-1])
    x_eta = 0.5 * (baseX[:, 1:-1, 2:] - baseX[:, 1:-1, :-2])
    g11 = jnp.sum(x_xi * x_xi, axis=-1)
    g22 = jnp.sum(x_eta * x_eta, axis=-1)
    Q = cf[:, 1:-1, 1:-1, 1]

    c_jp1 = g11 * (1 + 0.5 * Q)
    c_jm1 = g11 * (1 - 0.5 * Q)

    pad = lambda a: jnp.pad(a, ((0, 0), (1, 1), (1, 1)))
    dl = jnp.where(interior_mask, pad(c_jm1), 0.0)
    du = jnp.where(interior_mask, pad(c_jp1), 0.0)
    # diagonal: use x-component of the full diagonal (x and y diagonals are
    # identical for stencil rows; sliding y rows differ but are boundary)
    d = jnp.where(interior_mask, diag_field[..., 0], 1.0)
    return dl, d, du


def apply_line_precond(dl, d, du, diag_field, free_mask, interior_mask, v):
    """Apply M^-1 to v: tridiagonal solve along j on interior lines,
    diagonal scaling on non-interior free rows.

    v: (B, N, M, 2). Non-free components pass through zeroed.
    """
    sol = thomas(dl, d, du, v)
    inv_diag = 1.0 / jnp.where(diag_field == 0.0, 1.0, diag_field)
    out = jnp.where(interior_mask[..., None], sol, v * inv_diag)
    return jnp.where(free_mask, out, 0.0)


def numpy_gmres(A, M_inv, b, rtol, atol, restart, max_restarts):
    """Restarted right-preconditioned GMRES in pure NumPy f64.

    For the host-Krylov architecture: A is a cheap host operator (native
    C++ kernels), M_inv may dispatch to the accelerator. Basis vectors
    live in host memory (no device memory pressure at scale)."""
    import numpy as onp

    bnorm = float(onp.linalg.norm(b))
    tol = max(rtol * bnorm, atol)
    m = restart
    x = onp.zeros_like(b)
    rn = bnorm
    for _ in range(max_restarts):
        r = b - A(x)
        beta = float(onp.linalg.norm(r))
        rn = beta
        if beta <= tol:
            break
        V = [r / beta]
        H = onp.zeros((m + 1, m))
        k_used = m
        for k in range(m):
            w = A(M_inv(V[k]))
            for i in range(k + 1):
                hik = float(onp.vdot(V[i], w))
                H[i, k] = hik
                w = w - hik * V[i]
            hk1 = float(onp.linalg.norm(w))
            H[k + 1, k] = hk1
            if hk1 <= 1e-300:
                k_used = k + 1
                break
            V.append(w / hk1)
        e1 = onp.zeros(m + 1)
        e1[0] = beta
        y, *_ = onp.linalg.lstsq(H[: k_used + 1, :k_used], e1[: k_used + 1],
                                 rcond=None)
        dx = V[0] * y[0]
        for i in range(1, k_used):
            dx = dx + y[i] * V[i]
        x = x + M_inv(dx)
    else:
        rn = float(onp.linalg.norm(b - A(x)))
    if rn > tol:
        _warn_nonconverged("gmres(numpy)", max_restarts * m, rn, tol)
    return x, rn


def numpy_bicgstab(A, M_inv, b, rtol, atol, max_iters, x0=None):
    """Preconditioned BiCGStab in NumPy f64 — the reference's second
    user-facing Krylov backend (BiCGStab.zig:279-370): breakdown guards at
    1e-30, defaults max_iters=1000 / rtol 1e-6 / atol 1e-8, warning on
    non-convergence. Right-preconditioned (the reference preconditions the
    residual update, same fixed point)."""
    import numpy as onp

    x = onp.zeros_like(b) if x0 is None else x0.copy()
    r = b - A(x)
    bnorm = float(onp.linalg.norm(b))
    tol = max(rtol * bnorm, atol)
    rn = float(onp.linalg.norm(r))
    if rn <= tol:
        return x, rn
    r_hat = r.copy()
    rho_old = alpha = omega = 1.0
    v = onp.zeros_like(b)
    p = onp.zeros_like(b)
    it = 0
    for it in range(1, max_iters + 1):
        rho_new = float(onp.vdot(r_hat, r))
        if abs(rho_new) < 1e-30:
            break  # breakdown (BiCGStab.zig rho guard)
        if it == 1:
            p = r.copy()
        else:
            beta = (rho_new / rho_old) * (alpha / omega)
            p = r + beta * (p - omega * v)
        p_hat = M_inv(p)
        v = A(p_hat)
        den = float(onp.vdot(r_hat, v))
        if abs(den) < 1e-30:
            break
        alpha = rho_new / den
        s = r - alpha * v
        sn = float(onp.linalg.norm(s))
        if sn <= tol:
            x = x + alpha * p_hat
            rn = sn
            break
        s_hat = M_inv(s)
        t = A(s_hat)
        tt = float(onp.vdot(t, t))
        if tt < 1e-30:
            break
        omega = float(onp.vdot(t, s)) / tt
        x = x + alpha * p_hat + omega * s_hat
        r = s - omega * t
        rn = float(onp.linalg.norm(r))
        if rn <= tol:
            break
        if abs(omega) < 1e-30:
            break
        rho_old = rho_new
    if rn > tol:
        _warn_nonconverged("bicgstab", it, rn, tol)  # absolute, like tol
    return x, rn
