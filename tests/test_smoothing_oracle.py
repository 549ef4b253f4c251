"""Oracle (host direct) smoothing tests.

Strategy (SURVEY.md §4): small exact cases with known fixed points, then
the full multi-block examples checking convergence + invariant preservation.
"""

import numpy as np
import pytest

from turbomesh_tpu import input as input_mod
from turbomesh_tpu.mesh import Mesh, Block2d
from turbomesh_tpu.boundary import Side, Range, Connection, Condition, BCKind
from turbomesh_tpu.edge import Edge
from turbomesh_tpu.geometry import Line
from turbomesh_tpu.clustering import Uniform, Roberts
from turbomesh_tpu.smoothing import smooth_mesh
from turbomesh_tpu.smoothing.classify import classify, Kind
from turbomesh_tpu.check import check_connections


def _square_block(n=9, m=7, distort=0.0, seed=0):
    """Unit-square block with optionally distorted interior."""
    u = Uniform()(n)
    v = Uniform()(m)
    pts = np.stack(np.meshgrid(u, v, indexing="ij"), axis=-1)
    if distort:
        rng = np.random.default_rng(seed)
        pts[1:-1, 1:-1] += distort * rng.standard_normal(pts[1:-1, 1:-1].shape)
    return Block2d(points=pts)


def test_single_block_laplace_fixed_point():
    """A uniform grid on a square is a fixed point of Winslow smoothing."""
    mesh = Mesh()
    mesh.add_block("b", _square_block())
    before = mesh.blocks[0].points.copy()
    smooth_mesh(mesh, iterations=3)
    np.testing.assert_allclose(mesh.blocks[0].points, before, atol=1e-12)


def test_single_block_laplace_recovers_uniform():
    """Distorted interior on a square relaxes back to the uniform grid
    (the Winslow solution for straight uniform boundaries)."""
    mesh = Mesh()
    mesh.add_block("b", _square_block(distort=0.02))
    u = Uniform()(9)
    v = Uniform()(7)
    expect = np.stack(np.meshgrid(u, v, indexing="ij"), axis=-1)
    res = []
    smooth_mesh(mesh, iterations=30, residual_history=res)
    np.testing.assert_allclose(mesh.blocks[0].points, expect, atol=1e-10)
    assert res[-1] < 1e-25  # residual collapses at the fixed point


def test_single_block_boundaries_never_move():
    mesh = Mesh()
    mesh.add_block("b", _square_block(distort=0.05, seed=3))
    b = mesh.blocks[0].points
    edges = [b[0, :].copy(), b[-1, :].copy(), b[:, 0].copy(), b[:, -1].copy()]
    smooth_mesh(mesh, iterations=5)
    b = mesh.blocks[0].points
    for got, want in zip([b[0, :], b[-1, :], b[:, 0], b[:, -1]], edges):
        np.testing.assert_array_equal(got, want)


def _two_block_mesh(n=7, m=5):
    """Two blocks sharing the line x=1: [0,1]x[0,1] and [1,2]x[0,1].

    Connection: block0 j_max (i = n-1 column) <-> block1 j_min (i = 0
    column). Interior connection points are SMOOTHED/CONNECTED.
    """
    u = Uniform()(n)
    v = Uniform()(m)
    b0 = np.stack(np.meshgrid(u, v, indexing="ij"), axis=-1)
    b1 = np.stack(np.meshgrid(u + 1.0, v, indexing="ij"), axis=-1)
    mesh = Mesh()
    mesh.add_block("left", Block2d(points=b0))
    mesh.add_block("right", Block2d(points=b1))
    mesh.connections.append(
        Connection((Range(0, Side.J_MAX, 0, m - 1), Range(1, Side.J_MIN, 0, m - 1)))
    )
    return mesh


def test_two_block_classification():
    mesh = _two_block_mesh()
    info = classify(mesh)
    starts = mesh.block_row_starts()
    n, m = mesh.blocks[0].size
    # block 0 j_max interior points are smoothed
    for j in range(1, m - 1):
        g0 = starts[0] + (n - 1) * m + j
        g1 = starts[1] + 0 * m + j
        assert info.kind[g0] == Kind.SMOOTHED
        assert info.kind[g1] == Kind.CONNECTED
    # endpoints fixed on side 0, connected on side 1
    assert info.kind[starts[0] + (n - 1) * m] == Kind.FIXED
    assert info.kind[starts[1]] == Kind.CONNECTED
    # slaves map to their side-0 partners
    sl = dict(zip(info.slave_ids.tolist(), info.master_ids.tolist()))
    assert sl[starts[1] + 1] == starts[0] + (n - 1) * m + 1


def test_two_block_smoothing_keeps_continuity():
    """The coupled interface is *solved*, stays continuous, and relaxes to
    the single-domain uniform solution on a rectangle."""
    mesh = _two_block_mesh()
    # distort the shared interface and interiors
    rng = np.random.default_rng(1)
    n, m = mesh.blocks[0].size
    shift = 0.03 * rng.standard_normal((m - 2,))
    mesh.blocks[0].points[-1, 1:-1, 0] += shift
    mesh.blocks[1].points[0, 1:-1, 0] += shift
    mesh.blocks[0].points[1:-1, 1:-1] += 0.02 * rng.standard_normal(
        mesh.blocks[0].points[1:-1, 1:-1].shape)

    res = []
    smooth_mesh(mesh, iterations=40, residual_history=res)
    check_connections(mesh, tol=1e-9)

    u = Uniform()(n)
    v = Uniform()(m)
    expect0 = np.stack(np.meshgrid(u, v, indexing="ij"), axis=-1)
    expect1 = np.stack(np.meshgrid(u + 1.0, v, indexing="ij"), axis=-1)
    np.testing.assert_allclose(mesh.blocks[0].points, expect0, atol=1e-8)
    np.testing.assert_allclose(mesh.blocks[1].points, expect1, atol=1e-8)
    assert res[-1] < 1e-20


@pytest.mark.parametrize("config,basedir", [
    ("/root/repo/examples/T106/T106.json", "/root/repo"),
])
def test_t106_smoothing_end_to_end(config, basedir):
    """Full 8-block T106 with White control function: residual decreases,
    topology invariants hold, wall spacing tightens toward ds_target."""
    inp = input_mod.load(config, base_dir=basedir)
    mesh = inp.template.run(inp.geometry)

    blade_wall_before = mesh.blocks[0].points[:, 0, :].copy()
    ds_before = np.sqrt(np.sum(
        (mesh.blocks[0].points[:, 1, :] - mesh.blocks[0].points[:, 0, :]) ** 2, axis=1))

    res = []
    smooth_mesh(mesh, iterations=inp.smoothing.iterations,
                solver=inp.smoothing.solver,
                wall_control_function=inp.smoothing.wall_control_function,
                residual_history=res)

    # all points finite
    for b in mesh.blocks:
        assert np.all(np.isfinite(b.points))
    # blade wall (fixed) never moves
    np.testing.assert_array_equal(mesh.blocks[0].points[:, 0, :], blade_wall_before)
    # connections stay coincident after smoothing
    check_connections(mesh, tol=1e-8)
    # residual decreased by orders of magnitude
    assert res[-1] < 1e-3 * res[0]
    # White control function pulls wall spacing toward ds_target=1e-6
    ds_after = np.sqrt(np.sum(
        (mesh.blocks[0].points[:, 1, :] - mesh.blocks[0].points[:, 0, :]) ** 2, axis=1))
    assert np.median(ds_after) < np.median(ds_before)


def test_white_wall_spacing_reaches_target_quantitatively():
    """Quantitative White acceptance (VERDICT r3 'next' #6b): the wall
    spacing must CONVERGE to ds_target within a stated factor, not just
    decrease. From an initial median 1.57e-5 the feedback must reach a
    2e-3 target within [0.4, 2.5]x after 25 iterations (measured
    equilibrium oscillates mildly at 0.7-0.9x) — a >20x closing of the
    initial 127x gap. A sign or formula drift in the feedback law
    (wall_control_function.zig eq. 6.10 + ds/theta feedback) integrates
    without bound and fails this by orders of magnitude."""
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

    def wall_ds(m):
        return np.median(np.sqrt(np.sum(
            (m.blocks[0].points[:, 1, :] - m.blocks[0].points[:, 0, :]) ** 2,
            axis=1)))

    target = 2e-3
    ds0 = wall_ds(mesh)
    assert ds0 < 0.1 * target  # the run must close a real gap
    smooth_mesh(mesh, 25, solver="direct",
                wall_control_function={"white": {
                    "ds_target": target, "theta_target": 1.570796327}})
    ds1 = wall_ds(mesh)
    assert 0.4 * target < ds1 < 2.5 * target, (ds0, ds1)
    # the spacing moved > 20x toward the target (initial gap was 127x)
    assert ds1 / ds0 > 20, (ds0, ds1)
