"""Each reference JSON solver option selects a distinct working backend
(solver.zig:10-38) and all converge the same linear systems, so one Picard
step agrees with the direct oracle to Krylov tolerance.

Also checks the non-convergence warning behavior (GMRES.zig:422,
BiCGStab.zig:369): a starved solve logs a warning instead of failing
silently.
"""

import logging

import numpy as np
import pytest

from turbomesh_tpu import input as input_mod
from turbomesh_tpu.smoothing.classify import classify
from turbomesh_tpu.smoothing.control_function import Laplace
from turbomesh_tpu.smoothing.smooth import _solver_name
from turbomesh_tpu.smoothing.system import SparseSystem


def _small_mesh():
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
        "geometry": {
            "pitch": 0.08836,
            "profile": {"csv": {
                "down_csv_path": "examples/T106/T106_ps.dat",
                "up_csv_path": "examples/T106/T106_ss.dat",
            }},
        },
    }
    inp = input_mod.load(cfg, base_dir="/root/repo")
    return inp.template.run(inp.geometry)


def test_option_mapping():
    """The JSON schema's solver options map to distinct backends."""
    assert _solver_name({"gmres": {"preconditioner": "ilu0"}}) == ("gmres", "ilu0")
    assert _solver_name({"gmres": {"preconditioner": "diagonal"}}) == (
        "gmres", "diagonal")
    assert _solver_name({"bicgstab": {"preconditioner": "ilu0"}}) == (
        "bicgstab", "ilu0")
    assert _solver_name({"umfpack": {}}) == ("direct", "ilu0")
    assert _solver_name({"petsc": {}}) == ("direct", "ilu0")
    assert _solver_name("device")[0] == "device"
    with pytest.raises(ValueError):
        _solver_name("nonsense")


@pytest.mark.parametrize("method,precond", [
    ("gmres", "ilu0"),
    ("gmres", "diagonal"),
    ("bicgstab", "ilu0"),
    ("bicgstab", "diagonal"),
])
def test_krylov_backend_matches_direct(method, precond):
    mesh = _small_mesh()
    info = classify(mesh)
    cf = Laplace().init(mesh)
    c0 = mesh.flat_coords()

    direct = SparseSystem(mesh, info).solve(c0, cf)
    krylov = SparseSystem(mesh, info, method=method,
                          preconditioner=precond).solve(c0, cf)
    err = np.abs(direct - krylov).max()
    # reference Krylov tolerance is rtol 1e-6 / atol 1e-8 on the residual;
    # the solution error is looser by the (preconditioned) condition
    # number — ILU0 keeps it ~O(1), diagonal leaves ~O(50)
    tol = 1e-5 if precond == "ilu0" else 2e-4
    assert err < tol, f"{method}/{precond} vs direct: {err:.3e}"


def test_nonconvergence_warns(caplog):
    """A deliberately starved GMRES (1 restart of 2 on an ILU-free system)
    must log a warning, not return silently (GMRES.zig:422)."""
    from turbomesh_tpu.smoothing.krylov import numpy_gmres, numpy_bicgstab

    rng = np.random.default_rng(0)
    n = 50
    A = np.diag(np.linspace(1.0, 100.0, n)) + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    ident = lambda v: v

    with caplog.at_level(logging.WARNING, logger="turbomesh.krylov"):
        numpy_gmres(lambda v: A @ v, ident, b, rtol=1e-12, atol=0.0,
                    restart=2, max_restarts=1)
    assert any("did not converge" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="turbomesh.krylov"):
        numpy_bicgstab(lambda v: A @ v, ident, b, rtol=1e-14, atol=0.0,
                       max_iters=2)
    assert any("did not converge" in r.message for r in caplog.records)


def test_mumps_prototype_smoke():
    """The reference's dormant MUMPS prototype (mumps.zig:37-97): solve
    diag(1,2) x = [1,4] from 1-based COO triplets, solution written into
    rhs in place — same call shape, direct sparse backend."""
    import numpy as np

    from turbomesh_tpu.smoothing.system import mumps_prototype_solve

    rhs = np.array([1.0, 4.0])
    out = mumps_prototype_solve(2, [1, 2], [1, 2], [1.0, 2.0], rhs)
    np.testing.assert_allclose(out, [1.0, 2.0], atol=1e-15)
    np.testing.assert_allclose(rhs, [1.0, 2.0], atol=1e-15)  # in place
