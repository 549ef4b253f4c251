"""Device (matrix-free JAX) solver vs host oracle (scipy direct) parity.

The device path eliminates slave DOFs by substitution; its solution must
match the oracle's full-system direct solve to solver tolerance — this is
the core 1e-10 parity test between the TPU formulation and the reference
discretization.
"""

import numpy as np
import pytest

from turbomesh_tpu.mesh import Mesh, Block2d
from turbomesh_tpu.boundary import Side, Range, Connection, Condition, BCKind
from turbomesh_tpu.clustering import Uniform
from turbomesh_tpu.smoothing.classify import classify
from turbomesh_tpu.smoothing.system import SparseSystem
from turbomesh_tpu.smoothing.device import DeviceSmoother
from turbomesh_tpu.smoothing.control_function import Laplace


def _uniform_block(n, m, x0=0.0, y0=0.0, sx=1.0, sy=1.0, distort=0.0, seed=0):
    u = x0 + sx * Uniform()(n)
    v = y0 + sy * Uniform()(m)
    pts = np.stack(np.meshgrid(u, v, indexing="ij"), axis=-1)
    if distort:
        rng = np.random.default_rng(seed)
        pts[1:-1, 1:-1] += distort * rng.standard_normal(pts[1:-1, 1:-1].shape)
    return Block2d(points=pts)


def _compare(mesh, picard_iters=3, atol=1e-10):
    info = classify(mesh)
    oracle = SparseSystem(mesh, info)
    device = DeviceSmoother(mesh, info)
    cf = Laplace().init(mesh)

    co = mesh.flat_coords()
    cd = co.copy()
    for _ in range(picard_iters):
        co = oracle.solve(co, cf)
        cd = device.solve(cd, cf)
        err = np.abs(co - cd).max()
        assert err < atol, f"device vs oracle mismatch {err:.3e}"
    return co, cd


def test_single_block_parity():
    mesh = Mesh()
    mesh.add_block("b", _uniform_block(9, 7, distort=0.05))
    _compare(mesh)


def test_two_block_parity():
    mesh = Mesh()
    mesh.add_block("left", _uniform_block(7, 5, distort=0.03))
    mesh.add_block("right", _uniform_block(7, 5, x0=1.0, distort=0.03, seed=5))
    m = 5
    mesh.connections.append(
        Connection((Range(0, Side.J_MAX, 0, m - 1), Range(1, Side.J_MIN, 0, m - 1)))
    )
    # re-impose exact interface coincidence after distortion
    mesh.blocks[1].points[0, :, :] = mesh.blocks[0].points[-1, :, :]
    _compare(mesh)


def test_periodic_and_sliding_parity():
    """Channel with periodic top/bottom connection and sliding inlet."""
    n, m = 9, 7
    mesh = Mesh()
    mesh.add_block("b", _uniform_block(n, m, distort=0.04, seed=2))
    # periodic: i_min row (j=0) <-> i_max row (j=m-1), pitch (0, 1)
    mesh.blocks[0].points[:, -1, :] = mesh.blocks[0].points[:, 0, :] + np.array([0.0, 1.0])
    mesh.connections.append(
        Connection((Range(0, Side.I_MIN, 0, n - 1), Range(0, Side.I_MAX, 0, n - 1)),
                   periodicity=(0.0, 1.0))
    )
    # sliding inlet on j_min side (i = 0 column)
    mesh.boundary_conditions.append(
        Condition(Range(0, Side.J_MIN, 0, m - 1), BCKind.INLET)
    )
    _compare(mesh, picard_iters=4)


def test_o4h_small_parity():
    """A small full O4H topology (8 blocks, junctions, periodic, sliding)."""
    from turbomesh_tpu import input as input_mod

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
        "smoothing": {"iterations": 2, "solver": "direct"},
        "geometry": {
            "pitch": 0.08836,
            "profile": {"csv": {
                "down_csv_path": "examples/T106/T106_ps.dat",
                "up_csv_path": "examples/T106/T106_ss.dat",
            }},
        },
    }
    inp = input_mod.load(cfg, base_dir="/root/repo")
    mesh = inp.template.run(inp.geometry)
    _compare(mesh, picard_iters=2, atol=1e-10)


def test_o4h_white_parity():
    """Device vs oracle with the White control function active (nonzero
    P,Q exercise the connection-row argument-order quirk and cf plumbing)."""
    from turbomesh_tpu import input as input_mod
    from turbomesh_tpu.smoothing.control_function import from_config as cf_config

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
    mesh = inp.template.run(inp.geometry)
    info = classify(mesh)
    oracle = SparseSystem(mesh, info)
    device = DeviceSmoother(mesh, info)
    white = cf_config({"white": {"ds_target": 1e-4}})
    cf = white.init(mesh)

    co = mesh.flat_coords()
    cd = co.copy()
    for it in range(2):
        if it > 0:
            mesh.set_flat_coords(co)
            white.update(cf, mesh)
        co = oracle.solve(co, cf)
        cd = device.solve(cd, cf)
        err = np.abs(co - cd).max()
        assert err < 1e-10, f"white parity mismatch at iter {it}: {err:.3e}"
