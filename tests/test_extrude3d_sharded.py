"""BASELINE config 5 pipeline: per-cut 2-D smoothing with blocks sharded
across devices, stacked into a 3-D mesh, CGNS-3D roundtrip.

The reference lists 3-D from stacked 2-D cuts as planned-but-
unimplemented (/root/reference/README.md:19-21); tools/demo_3d_sharded.py
records the full-size T106 artifact. This test runs the same pipeline at
toy size against the host oracle."""

import numpy as np
import jax
import pytest

from turbomesh_tpu.mesh import Mesh, Block2d
from turbomesh_tpu.boundary import Side, Range, Connection
from turbomesh_tpu.clustering import Uniform
from turbomesh_tpu.extrude import from_cuts
from turbomesh_tpu.io.cgns3d import write_cgns3d, read_cgns3d
from turbomesh_tpu.smoothing.classify import classify
from turbomesh_tpu.smoothing.control_function import Laplace
from turbomesh_tpu.smoothing.system import SparseSystem
from turbomesh_tpu.parallel import ShardedSmoother

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual CPU) mesh"
)


def _cut_mesh(scale=1.0, seed=0):
    mesh = Mesh()
    u = Uniform()(9)
    v = Uniform()(7)
    rng = np.random.default_rng(seed)
    for k, x0 in enumerate((0.0, 1.0)):
        pts = np.stack(np.meshgrid(scale * (x0 + u), scale * v,
                                   indexing="ij"), axis=-1)
        pts[1:-1, 1:-1] += 0.02 * scale * rng.standard_normal(
            pts[1:-1, 1:-1].shape)
        mesh.add_block(f"b{k}", Block2d(points=pts))
    mesh.connections.append(
        Connection((Range(0, Side.J_MAX, 0, 6), Range(1, Side.J_MIN, 0, 6))))
    mesh.blocks[1].points[0, :, :] = mesh.blocks[0].points[-1, :, :]
    return mesh


def test_stacked_cuts_sharded_smoothing_roundtrip(tmp_path):
    spans = np.array([0.0, 0.5, 1.0])
    scales = [1.0, 0.9, 0.8]
    cf0 = None
    smoothed = []
    for k, s in enumerate(scales):
        mesh = _cut_mesh(scale=s, seed=k)
        info = classify(mesh)
        cf = Laplace().init(mesh)
        cf0 = cf if cf0 is None else cf0
        oracle = SparseSystem(mesh, info)
        sharded = ShardedSmoother(mesh, info, n_devices=2)
        co = mesh.flat_coords()
        cs = co.copy()
        for _ in range(2):
            co = oracle.solve(co, cf)
        cs, _cf, _disp, n_done = sharded.run(cs, cf.copy(), 2)
        assert n_done == 2
        err = np.abs(co - cs).max()
        assert err < 1e-9, f"cut {k}: sharded vs oracle {err:.3e}"
        mesh.set_flat_coords(cs)
        smoothed.append(mesh)

    m3 = from_cuts(smoothed, spans)
    assert m3.num_points == 3 * smoothed[0].num_points
    # each cut's z-plane carries its own smoothed section
    assert not np.allclose(m3.blocks[0].points[0, ..., :2],
                           m3.blocks[0].points[2, ..., :2])

    path = str(tmp_path / "cuts3d.cgns")
    write_cgns3d(m3, path)
    names, blocks = read_cgns3d(path)  # zone order: alphabetical
    got = dict(zip(names, blocks))
    assert sorted(names) == sorted(m3.names)
    for nm, blk in zip(m3.names, m3.blocks):
        np.testing.assert_array_equal(got[nm], blk.points)
