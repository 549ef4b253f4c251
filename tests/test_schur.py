"""Interface-elimination ("schur") preconditioner composition parity.

mg_opts["schur"] replaces the V->I multiplicative alternation with an
approximate exact elimination of the interface unknowns (device.py
MG_DEFAULTS.schur, _stage_Minv schur branch): e = A_JJ^-1 v_J feeds the
V-cycle the Schur right-hand side v - A e. A preconditioner change must
never change the converged solution, so every granularity (fused,
staged, staged_hostinner) and the sharded path must still match the
SparseSystem oracle (the exact reference discretization,
smooth.zig:74-166) on a mesh that carries EVERY eliminated row kind:
periodic CONNECTED slaves, SMOOTHED chains, a junction ON the periodic
seam (LAPLACIAN), and SLIDING inlet rows.
"""

import numpy as np
import pytest

import test_periodic_junction_analytic as strip

from turbomesh_tpu.boundary import BCKind, Condition, Range, Side
from turbomesh_tpu.smoothing.classify import Kind, classify
from turbomesh_tpu.smoothing.control_function import Laplace
from turbomesh_tpu.smoothing.device import DeviceSmoother
from turbomesh_tpu.smoothing.system import SparseSystem


def _mesh_all_row_kinds(n=9, m=5):
    """Periodic 2x2 strip + INLET bottom edges: exercises SLIDING,
    LAPLACIAN (incl. the periodic-seam junction), SMOOTHED chains,
    CONNECTED periodic slaves, and FIXED rows in one 4-block mesh."""
    mesh = strip._strip_mesh(n, m)
    mesh.boundary_conditions += [
        Condition(Range(0, Side.I_MIN, 0, n - 1), BCKind.INLET),
        Condition(Range(1, Side.I_MIN, 0, n - 1), BCKind.INLET),
    ]
    return mesh


@pytest.fixture(scope="module")
def strip_case():
    mesh = _mesh_all_row_kinds()
    info = classify(mesh)
    kinds = set(np.unique(info.kind))
    assert {Kind.SLIDING, Kind.LAPLACIAN, Kind.SMOOTHED,
            Kind.CONNECTED}.issubset({Kind(k) for k in kinds})
    cf = Laplace().init(mesh)
    ref = SparseSystem(mesh, info).solve(mesh.flat_coords(), cf)
    return mesh, info, cf, ref


@pytest.mark.parametrize("env,expected_granularity", [
    ({}, "fused"),
    ({"TURBOMESH_FUSED_SOLVE": "0"}, "staged"),
    ({"TURBOMESH_FUSED_SOLVE": "0", "TURBOMESH_FUSED_INNER": "0"},
     "staged_hostinner"),
])
def test_schur_granularity_parity(monkeypatch, strip_case, env,
                                  expected_granularity):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    mesh, info, cf, ref = strip_case
    dev = DeviceSmoother(mesh, info, mg_opts={"schur": True})
    out = dev.solve(mesh.flat_coords(), cf)
    assert dev.granularity == expected_granularity
    err = np.abs(out - ref).max()
    assert err < 1e-8, f"schur {expected_granularity} parity {err:.3e}"


def test_schur_sharded_parity(strip_case):
    import jax

    from turbomesh_tpu.parallel import ShardedSmoother

    mesh, info, cf, ref = strip_case
    sm = ShardedSmoother(mesh, info,
                         n_devices=min(4, len(jax.devices())),
                         mg_opts={"schur": True})
    out = sm.solve(mesh.flat_coords(), cf)
    err = np.abs(out - ref).max()
    assert err < 1e-8, f"schur sharded parity {err:.3e}"
