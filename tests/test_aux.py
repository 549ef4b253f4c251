"""Auxiliary subsystems: 3-D extrusion, checkpoint/resume, profiling."""

import os

import numpy as np
import pytest

from turbomesh_tpu.mesh import Mesh, Block2d
from turbomesh_tpu.clustering import Uniform
from turbomesh_tpu.extrude import extrude, from_cuts
from turbomesh_tpu.checkpoint import save_checkpoint, load_checkpoint
from turbomesh_tpu.smoothing import smooth_mesh
from turbomesh_tpu.profiling import PhaseTimer


def _square_mesh(n=7, m=5, distort=0.0, seed=0):
    u = Uniform()(n)
    v = Uniform()(m)
    pts = np.stack(np.meshgrid(u, v, indexing="ij"), axis=-1)
    if distort:
        rng = np.random.default_rng(seed)
        pts[1:-1, 1:-1] += distort * rng.standard_normal(pts[1:-1, 1:-1].shape)
    mesh = Mesh()
    mesh.add_block("b", Block2d(points=pts))
    return mesh


def test_extrude_linear():
    mesh = _square_mesh()
    spans = np.linspace(0.0, 2.0, 4)
    m3 = extrude(mesh, spans)
    assert m3.blocks[0].size == (4, 7, 5)
    np.testing.assert_array_equal(m3.blocks[0].points[2, :, :, 2], 2.0 / 3 * 2)
    np.testing.assert_array_equal(
        m3.blocks[0].points[0, :, :, :2], mesh.blocks[0].points)


def test_extrude_twist_scale():
    mesh = _square_mesh()
    spans = [0.0, 1.0]
    m3 = extrude(mesh, spans, twist=[0.0, np.pi / 2], scale=[1.0, 2.0])
    # cut 0 unchanged
    np.testing.assert_allclose(m3.blocks[0].points[0, :, :, :2],
                               mesh.blocks[0].points, atol=1e-15)
    # cut 1: rotated 90deg about centroid, scaled 2x — distances to centroid double
    pts2 = mesh.blocks[0].points.reshape(-1, 2)
    c = pts2.mean(axis=0)
    d0 = np.linalg.norm(pts2 - c, axis=1)
    cut1 = m3.blocks[0].points[1, :, :, :2].reshape(-1, 2)
    d1 = np.linalg.norm(cut1 - c, axis=1)
    np.testing.assert_allclose(d1, 2 * d0, atol=1e-12)


def test_from_cuts():
    m1 = _square_mesh()
    m2 = _square_mesh()
    m2.blocks[0].points[..., 0] += 0.1  # shifted section
    m3 = from_cuts([m1, m2], spans=[0.0, 1.0])
    assert m3.blocks[0].size == (2, 7, 5)
    assert m3.blocks[0].points[1, 0, 0, 0] == m2.blocks[0].points[0, 0, 0]


def test_cgns3d_write(tmp_path):
    mesh = _square_mesh()
    m3 = extrude(mesh, np.linspace(0, 1, 3))
    path = str(tmp_path / "mesh3d.cgns")
    m3.write(path)
    import h5py

    with h5py.File(path) as f:
        zone = f["Base/b"]
        assert zone["GridCoordinates/CoordinateZ/ data"].shape == (3, 5, 7)


def test_checkpoint_roundtrip(tmp_path):
    mesh = _square_mesh(distort=0.03)
    cf = np.random.default_rng(0).standard_normal((mesh.num_points, 2))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, mesh, iteration=7, control_function=cf)

    mesh2 = _square_mesh()  # same topology, different coords
    it, cf2 = load_checkpoint(path, mesh2)
    assert it == 7
    np.testing.assert_array_equal(mesh2.blocks[0].points, mesh.blocks[0].points)
    np.testing.assert_array_equal(cf2, cf)


def test_smooth_checkpoint_resume(tmp_path):
    """Interrupted run + resume == uninterrupted run."""
    path = str(tmp_path / "smooth_ckpt.npz")

    mesh_a = _square_mesh(distort=0.04, seed=2)
    smooth_mesh(mesh_a, iterations=6)

    mesh_b = _square_mesh(distort=0.04, seed=2)
    smooth_mesh(mesh_b, iterations=3, checkpoint_path=path, checkpoint_every=3)
    mesh_c = _square_mesh(distort=0.04, seed=2)
    smooth_mesh(mesh_c, iterations=6, checkpoint_path=path, resume=True)

    np.testing.assert_allclose(mesh_c.blocks[0].points, mesh_a.blocks[0].points,
                               atol=1e-12)


def test_phase_timer_report():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    rep = t.report(nodes=1000)
    assert "a:" in rep and "2x" in rep and "Mnodes/s" in rep


def test_import_does_not_configure_compilation_cache():
    """Importing the library must not mutate global JAX config beyond the
    documented x64 requirement (ADVICE r3: cache setup is deferred to
    smoother construction and respects an application-configured dir)."""
    import subprocess
    import sys

    code = (
        "import turbomesh_tpu, jax; "
        "assert jax.config.jax_compilation_cache_dir is None, "
        "jax.config.jax_compilation_cache_dir; "
        "assert jax.config.jax_enable_x64; "
        "from turbomesh_tpu.smoothing.device import ensure_compilation_cache; "
        "ensure_compilation_cache(); "
        "assert jax.config.jax_compilation_cache_dir, 'deferred setup inert'"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("TURBOMESH_JAX_CACHE", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr[-1500:]
