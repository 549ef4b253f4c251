"""Pallas zebra smoother vs the XLA expression of the same pass."""

import numpy as np
import jax
import jax.numpy as jnp

import turbomesh_tpu.smoothing.multigrid as mg


def _glued_level():
    from turbomesh_tpu import input as input_mod
    from turbomesh_tpu.smoothing.classify import classify
    from turbomesh_tpu.smoothing.device import DeviceSmoother

    cfg = {
        "template": {"O4H": {
            "inlet_distance": 0.05, "outlet_distance": 0.02,
            "blade_clustering": {"roberts": {"alpha": 0.5, "beta": 1.1}},
            "num_cells": {
                "o_grid": 6, "middle_i": 12, "in_up_j": 6, "in_down_j": 5,
                "in_i": 5, "out_up_j": 6, "out_down_j": 5, "out_i": 5,
                "down_j": 6, "bulge": 6, "upstream_i": 5, "downstream_i": 5,
            },
        }},
        "smoothing": {},
        "geometry": {"pitch": 0.08836,
                     "profile": {"csv": {
                         "down_csv_path": "examples/T106/T106_ps.dat",
                         "up_csv_path": "examples/T106/T106_ss.dat"}}},
    }
    inp = input_mod.load(cfg, base_dir="/root/repo")
    mesh = inp.template.run(inp.geometry)
    info = classify(mesh)
    sm = DeviceSmoother(mesh, info)
    p = sm.plan
    coords = mesh.flat_coords()
    X = jnp.asarray(p.pad_coords(coords).reshape(p.B, p.N, p.M, 2))
    C = jnp.asarray(np.zeros((p.B, p.N, p.M, 2)))
    baseF, _ = sm._jit_base(sm._plans_arg, X, C)
    ctx = sm._jit_prepare32(sm._plans_arg, baseF, C)
    return mg.MGLevel(ctx["mg"][0])


def test_zebra_math_matches_xla_smoother():
    """The kernel's math path (vmapped rolls + PCR) must reproduce the
    XLA zebra smoother exactly on the glued T106 level."""
    level = _glued_level()
    rng = np.random.default_rng(0)
    shape = level.interior.shape + (2,)
    r = jnp.where(level.interior[..., None],
                  jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                  0.0)
    z0 = jnp.zeros_like(r)

    z_xla = mg._smooth_glued(level, r, z0)  # CPU: takes the XLA path
    z_pal = mg._smooth_glued_pallas(level, r, z0)  # CPU: vmapped kernel math
    err = float(jnp.max(jnp.abs(z_xla - z_pal)))
    scale = float(jnp.max(jnp.abs(z_xla))) or 1.0
    assert err / scale < 5e-5, f"zebra math mismatch: rel {err/scale:.2e}"


def test_zebra_kernel_interpret_matches_math():
    """The Pallas kernel body (via the interpreter) must match the
    vmapped math path bit-for-bit — validates the kernel semantics
    without TPU hardware."""
    from turbomesh_tpu.ops.zebra import zebra_pass

    B, Ng, Mg = 3, 14, 12
    rng = np.random.default_rng(2)

    def mk():
        return jnp.asarray(rng.standard_normal((B, Ng, Mg)).astype(np.float32))

    bx, by, rx, ry, zx, zy = mk(), mk(), mk(), mk(), mk(), mk()
    # nonzero P != Q so the Thomas variant's transpose path (which must
    # swap the P/Q roles for j-line sweeps) is actually exercised
    cfp = 0.1 * mk()
    cfq = 0.1 * mk()
    d = jnp.ones((B, Ng, Mg), jnp.float32) * 4.0
    dl = -jnp.ones_like(d)
    du = -jnp.ones_like(d)
    # production contract (zebra_pass docstring): the planes are
    # ghost-framed and edge rows/cols are never smoothed — wrapped
    # neighbor values must only reach rows ``sel`` zeroes. The split
    # variant additionally relies on it where block planes abut in its
    # flattened layout.
    msk = np.ones((B, Ng, Mg), np.float32)
    msk[:, [0, -1], :] = 0.0
    msk[:, :, [0, -1]] = 0.0
    msk = jnp.asarray(msk)
    sel = (jnp.arange(Mg) % 2 == 0).astype(jnp.float32) * msk

    for axis in (0, 1):
        ref = zebra_pass(bx, by, cfp, cfq, dl, d, du, msk, sel,
                         rx, ry, zx, zy, axis=axis, use_pallas=False)
        for variant in ("pcr", "thomas", "split"):
            ker = zebra_pass(bx, by, cfp, cfq, dl, d, du, msk, sel,
                             rx, ry, zx, zy, axis=axis,
                             use_pallas=True, interpret=True,
                             variant=variant)
            for a, b in zip(ker, ref):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                    err_msg=f"variant={variant} axis={axis}")


def test_zebra_reduces_residual():
    level = _glued_level()
    rng = np.random.default_rng(1)
    shape = level.interior.shape + (2,)
    r = jnp.where(level.interior[..., None],
                  jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                  0.0)
    z = jnp.zeros_like(r)
    for _ in range(3):
        z = mg._smooth_glued_pallas(level, r, z)
    res = jnp.where(level.interior[..., None],
                    r - mg._apply_glued(level, z), 0.0)
    assert float(jnp.linalg.norm(res)) < 0.2 * float(jnp.linalg.norm(r))
