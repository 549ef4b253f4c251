"""CGNS BC + 1-to-1 connectivity nodes: structural and numerical checks.

The Transform test is the strong one: for every connection, the CGNS
transform matrix applied to each point of the owner's PointRange must
land exactly on the corresponding donor point (the same physical node
the framework's Range iteration pairs up)."""

import numpy as np
import h5py

from turbomesh_tpu import input as input_mod
from turbomesh_tpu.io.cgns import write_cgns

CFG = {
    "template": {"O4H": {
        "inlet_distance": 0.05, "outlet_distance": 0.02,
        "blade_clustering": {"roberts": {"alpha": 0.5, "beta": 1.1}},
        "num_cells": {
            "o_grid": 4, "middle_i": 8, "in_up_j": 4, "in_down_j": 4,
            "in_i": 4, "out_up_j": 4, "out_down_j": 4, "out_i": 4,
            "down_j": 4, "bulge": 4, "upstream_i": 4, "downstream_i": 4,
        },
    }},
    "smoothing": {},
    "geometry": {"pitch": 0.08836,
                 "profile": {"csv": {
                     "down_csv_path": "examples/T106/T106_ps.dat",
                     "up_csv_path": "examples/T106/T106_ss.dat"}}},
}


def _mesh(tmp_path):
    inp = input_mod.load(CFG, base_dir="/root/repo")
    mesh = inp.template.run(inp.geometry)
    path = str(tmp_path / "topo.cgns")
    write_cgns(mesh, path)
    return mesh, path


def test_cgns_bc_and_connectivity_nodes(tmp_path):
    mesh, path = _mesh(tmp_path)
    n_conn_nodes = 0
    n_bc = 0
    n_periodic = 0
    with h5py.File(path, "r") as f:
        base = f["Base"]
        for name in mesh.names:
            zone = base[name]
            if "ZoneBC" in zone:
                for k, bc in zone["ZoneBC"].items():
                    kind = bytes(bc[" data"][()]).decode()
                    assert kind in ("BCWall", "BCInflow", "BCOutflow")
                    assert bc["PointRange/ data"].shape == (2, 2)
                    n_bc += 1
            if "ZoneGridConnectivity" in zone:
                for k, g in zone["ZoneGridConnectivity"].items():
                    donor = bytes(g[" data"][()]).decode()
                    assert donor in mesh.names
                    assert g["Transform/ data"].shape == (2,)
                    n_conn_nodes += 1
                    if "GridConnectivityProperty" in g:
                        tr = g["GridConnectivityProperty/Periodic/"
                               "Translation/ data"][()]
                        assert abs(float(tr[1]) - 0.08836) < 1e-6
                        n_periodic += 1
    assert n_bc == len(mesh.boundary_conditions)
    assert n_conn_nodes == len(mesh.connections)
    assert n_periodic == sum(c.periodicity is not None
                             for c in mesh.connections)


def test_cgns_transform_maps_ranges_exactly(tmp_path):
    from turbomesh_tpu.io.cgns import _range_points, _transform

    inp = input_mod.load(CFG, base_dir="/root/repo")
    mesh = inp.template.run(inp.geometry)
    for c in mesh.connections:
        r0, r1 = c.ranges
        s0 = mesh.blocks[r0.block].size
        s1 = mesh.blocks[r1.block].size
        b0, e0 = _range_points(r0, s0)
        b1, e1 = _range_points(r1, s1)
        t = _transform(r0, r1)
        # T as a matrix: column a (zone-0 axis) -> row |t[a]| sign t[a]
        T = np.zeros((2, 2), dtype=int)
        for a in range(2):
            T[abs(t[a]) - 1, a] = np.sign(t[a])
        # walk the owner range; transformed indices must equal the donor
        # range walk (these index the same physical points)
        i0 = np.array(b0)
        i1 = np.array(b1)
        n = len(r0)
        f0 = r0.flat_indices(s0)
        f1 = r1.flat_indices(s1)
        for k in range(n):
            # owner (i, j) of point k, 1-based
            step = (np.array(e0) - np.array(b0)) // max(n - 1, 1)
            p0 = np.array(b0) + k * step
            p1 = T @ (p0 - np.array(b0)) + np.array(b1)
            # check against the framework's pairing via flat ids
            nj0, nj1 = s0[1], s1[1]
            flat0 = (p0[0] - 1) * nj0 + (p0[1] - 1)
            flat1 = (p1[0] - 1) * nj1 + (p1[1] - 1)
            assert flat0 == f0[k]
            assert flat1 == f1[k], (
                f"transform mismatch: conn {r0}->{r1}, k={k}")
            # and the physical coincidence (with periodicity)
            x0 = mesh.blocks[r0.block].points.reshape(-1, 2)[flat0]
            x1 = mesh.blocks[r1.block].points.reshape(-1, 2)[flat1]
            off = np.zeros(2) if c.periodicity is None else np.asarray(c.periodicity)
            np.testing.assert_allclose(x0 + off, x1, atol=1e-9)
