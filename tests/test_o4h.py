"""O4H template end-to-end blocking tests on the reference example configs."""

import json

import numpy as np
import pytest

from turbomesh_tpu import input as input_mod
from turbomesh_tpu.check import check_connections
from turbomesh_tpu.io.cgns import write_cgns, read_cgns

LS89 = "/root/repo/examples/LS89/LS89.json"
T106 = "/root/repo/examples/T106/T106.json"


@pytest.fixture(scope="module")
def t106_mesh():
    inp = input_mod.load(T106, base_dir="/root/repo")
    return inp, inp.template.run(inp.geometry)


@pytest.fixture(scope="module")
def ls89_mesh():
    inp = input_mod.load(LS89, base_dir="/root/repo")
    return inp, inp.template.run(inp.geometry)


def _expected_shapes(nc, n_in_jmin=None):
    num_cells_up = nc.in_up_j + nc.middle_i + nc.bulge + nc.out_up_j + nc.out_i
    num_cells_down = nc.in_down_j + nc.middle_i + nc.out_down_j
    in_jmin = nc.in_up_j + nc.in_down_j + 1
    out_jmin = nc.out_down_j + nc.out_up_j + 1
    down_imin = (nc.in_i + 1) + (nc.middle_i + 1) + (nc.out_i + 1) - 2
    up_imin = nc.middle_i + nc.bulge + nc.out_i + nc.in_i + 1
    upstream_jmax = (nc.down_j + 1) + in_jmin + (nc.out_i + 1) - 2
    downstream_jmin = (nc.down_j + 1) + out_jmin + (nc.bulge + 1) - 2
    return {
        "blade_up": (num_cells_up + 1, nc.o_grid + 1),
        "blade_down": (num_cells_down + 1, nc.o_grid + 1),
        "in": (nc.in_i + 1, in_jmin),
        "out": (nc.out_i + 1, out_jmin),
        "down": (down_imin, nc.down_j + 1),
        "up": (up_imin, nc.out_i + 1),
        "upstream": (nc.upstream_i + 1, upstream_jmax),
        "downstream": (nc.downstream_i + 1, downstream_jmin),
    }


@pytest.mark.parametrize("fixture", ["t106_mesh", "ls89_mesh"])
def test_o4h_structure(fixture, request):
    inp, mesh = request.getfixturevalue(fixture)
    assert mesh.names == [
        "blade_up", "blade_down", "in", "out", "down", "up", "upstream", "downstream",
    ]
    assert len(mesh.connections) == 21
    periodic = [c for c in mesh.connections if c.periodicity is not None]
    assert len(periodic) == 3
    for c in periodic:
        np.testing.assert_allclose(np.asarray(c.periodicity), [0.0, inp.pitch])
    assert len(mesh.boundary_conditions) == 2

    shapes = _expected_shapes(inp.template.num_cells)
    for name, blk in zip(mesh.names, mesh.blocks):
        assert blk.size == shapes[name], name
        assert np.all(np.isfinite(blk.points)), name


def test_o4h_connection_coincidence_t106(t106_mesh):
    """smooth.zig:220-275 would panic above 1e-15; for O(1) coordinates the
    template must match connection data at the reference's absolute 1e-15."""
    _, mesh = t106_mesh
    check_connections(mesh, tol=1e-15)


def test_o4h_connection_coincidence_ls89(ls89_mesh):
    """LS89's mm-unit config (scale 1e-3 applied to profile AND pitch,
    gui/main.zig:45) — the scale-aware default tolerance (a few ulp)
    must pass on its O(0.08) coordinates."""
    _, mesh = ls89_mesh
    check_connections(mesh)


def test_o4h_blade_points_on_profile(t106_mesh):
    inp, mesh = t106_mesh
    blade_up = mesh.blocks[0]
    # i_min row of blade_up is the blade suction surface: spline points
    up_edge = blade_up.points[:, 0, :]
    # re-evaluate through the spline at the same clustering
    clustering = inp.template.blade_clustering(blade_up.size[0])
    expect = inp.profile.up_part.interpolate(clustering)
    # template forces LE/TE identification; interior must match exactly
    np.testing.assert_allclose(up_edge[1:-1], expect[1:-1], atol=1e-14)


def test_o4h_wall_offset_distance(t106_mesh):
    _, mesh = t106_mesh
    blade_up = mesh.blocks[0]
    wall = blade_up.points[:, 0, :]
    outer = blade_up.points[:, -1, :]
    d = np.sqrt(np.sum((outer - wall) ** 2, axis=1))
    # interior points are offset by exactly 0.001 along normals (O4H.zig:102);
    # endpoints are snapped to the down_outer edge
    np.testing.assert_allclose(d[1:-1], 0.001, rtol=1e-6)


def test_cgns_roundtrip(t106_mesh, tmp_path):
    _, mesh = t106_mesh
    path = str(tmp_path / "t106.cgns")
    write_cgns(mesh, path)
    names, blocks = read_cgns(path)
    assert set(names) == set(mesh.names)
    by_name = dict(zip(names, blocks))
    for name, blk in zip(mesh.names, mesh.blocks):
        np.testing.assert_array_equal(by_name[name], blk.points)


def test_vtk_write(ls89_mesh, tmp_path):
    _, mesh = ls89_mesh
    mesh.write(str(tmp_path / "ls89.vtk"))
    files = list(tmp_path.glob("*.vtk"))
    assert len(files) == 8
