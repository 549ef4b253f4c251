"""Analytic anchor for the PERIODIC-connection and JUNCTION-point
discretization (VERDICT r4 missing #3 / next-round item 6a).

The riskiest discretization pieces — periodic connection rows with the
pitch-shifted cross-block neighbor (smooth.zig:994-1105) and the
junction ("laplacian") point stencils with accumulated periodicity
(smooth.zig:1340-1513) — were previously verified only against the
repo's own SparseSystem oracle. This file anchors them to mathematics,
like tests/test_analytic_winslow.py does for the interior stencil:

The conformal map  w(z) = z - i*eps*e^{iz}  (z = x+iy physical,
w = xi+i*eta parameter) is analytic, so its inverse z(w) has harmonic
components and solves the Winslow system with P=Q=0 — and it is
TRANSLATION-periodic:  z(w + 2*pi) = z(w) + 2*pi,  exactly the
constant-vector periodicity the reference supports ({0, pitch} rows,
O4H.zig:503-514; here the offset is in x).

The strip  xi in [0, 2*pi], eta in [eta0, eta1]  is meshed as a 2x2
block split whose seams produce, through the SAME classify() topology
path the O4H template uses:
  * 4 plain connections (SMOOTHED rows across interior seams),
  * 2 PERIODIC connections at the xi = 0 <-> 2*pi seam (CONNECTED
    slaves with the (-2*pi, 0) offset),
  * a 4-fold interior junction at (pi, eta_mid),
  * a 4-fold junction ON the periodic seam whose stencil accumulates
    the periodicity into its RHS.
The index lattice is uniform with EQUAL spacing in xi and eta, so the
junction graph-Laplacian stencil (sum of the members' diagonal interior
neighbors) is O(h^4)-consistent for harmonic components and cannot
break the global second order.

The discrete smoothed fixed point must converge to the sampled exact
inverse map at SECOND order: halving h shrinks the max error ~4x. Any
drift in the periodic shift handling, slave offsets, or junction
stencil/RHS breaks the order (or the constant by orders of magnitude)
with no reference to SparseSystem's own assembly as truth.
"""

import numpy as np
import pytest

from turbomesh_tpu.boundary import Connection, Range, Side
from turbomesh_tpu.mesh import Block2d, Mesh
from turbomesh_tpu.smoothing.classify import Kind, classify
from turbomesh_tpu.smoothing.control_function import Laplace
from turbomesh_tpu.smoothing.system import SparseSystem

EPS = 0.15
ETA0 = 0.3


def _inverse_map(xi, eta):
    """z(w) with w(z) = z - i*EPS*e^{iz}, by Newton per point (to 1e-14).
    Components of z are harmonic in (xi, eta) — an exact Winslow
    solution with x-periodicity 2*pi."""
    w = xi + 1j * eta
    z = w.astype(np.complex128).copy()
    for _ in range(60):
        f = z - 1j * EPS * np.exp(1j * z) - w
        fp = 1.0 + EPS * np.exp(1j * z)
        z = z - f / fp
        if np.abs(f).max() < 1e-14:
            break
    assert np.abs(z - 1j * EPS * np.exp(1j * z) - w).max() < 1e-12
    return np.stack([z.real, z.imag], axis=-1)


def _block_points(i0, j0, n, m, h):
    ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
    return _inverse_map((i0 + ii) * h, ETA0 + (j0 + jj) * h)


def _strip_mesh(n, m):
    """2x2-block periodic strip: blocks (n, m) points each, i ~ xi and
    j ~ eta with one shared lattice spacing h = pi/(n-1)."""
    h = np.pi / (n - 1)
    mesh = Mesh()
    # bottom-left, bottom-right, top-left, top-right
    mesh.add_block("bl", Block2d(points=_block_points(0, 0, n, m, h)))
    mesh.add_block("br", Block2d(points=_block_points(n - 1, 0, n, m, h)))
    mesh.add_block("tl", Block2d(points=_block_points(0, m - 1, n, m, h)))
    mesh.add_block("tr", Block2d(points=_block_points(n - 1, m - 1,
                                                      n, m, h)))
    BL, BR, TL, TR = 0, 1, 2, 3
    c = mesh.connections
    # interior vertical seams at xi = pi (J_MAX: i = n-1, j varies)
    c.append(Connection((Range(BL, Side.J_MAX, 0, m - 1),
                         Range(BR, Side.J_MIN, 0, m - 1))))
    c.append(Connection((Range(TL, Side.J_MAX, 0, m - 1),
                         Range(TR, Side.J_MIN, 0, m - 1))))
    # interior horizontal seams at eta = eta_mid (I_MAX: j = m-1)
    c.append(Connection((Range(BL, Side.I_MAX, 0, n - 1),
                         Range(TL, Side.I_MIN, 0, n - 1))))
    c.append(Connection((Range(BR, Side.I_MAX, 0, n - 1),
                         Range(TR, Side.I_MIN, 0, n - 1))))
    # PERIODIC seams: x(xi=0 side) + (+2*pi, 0) == x(xi=2*pi side).
    # ORIENTATION MATTERS: the junction assembly (classify.py, replicating
    # smooth.zig:1381-1384) stores each overlapping member with the RAW
    # periodicity of the connection it was reached through, direction-
    # agnostic — consistent only when range0 carries the junction frame
    # and periodicity maps range0 -> range1, which is how the reference's
    # O4H template orients its pitch connections (o4h.py:331-336,
    # O4H.zig:503-514). The reverse orientation shifts the seam junction
    # by a full period (caught by this very test before the flip).
    c.append(Connection((Range(BL, Side.J_MIN, 0, m - 1),
                         Range(BR, Side.J_MAX, 0, m - 1)),
                        periodicity=(2.0 * np.pi, 0.0)))
    c.append(Connection((Range(TL, Side.J_MIN, 0, m - 1),
                         Range(TR, Side.J_MAX, 0, m - 1)),
                        periodicity=(2.0 * np.pi, 0.0)))
    return mesh


def _topology_probe(n=9, m=5):
    mesh = _strip_mesh(n, m)
    info = classify(mesh)
    return mesh, info


def test_strip_topology_has_periodic_seam_and_junctions():
    """The 2x2 periodic strip exercises exactly the risky pieces:
    periodic CONNECTED slaves with the x-offset, and two 4-fold
    junction groups — one of them on the periodic seam with nonzero
    accumulated periodicity in its stencil RHS."""
    mesh, info = _topology_probe()
    offs = info.slave_offsets
    assert len(offs) and np.any(np.abs(np.abs(offs[:, 0]) - 2 * np.pi)
                                < 1e-12)
    laps = info.laplacian_points
    assert len(laps) == 2
    sizes = sorted(len(lp.overlapping) for lp in laps)
    assert sizes == [4, 4], sizes
    rhs_norms = sorted(float(np.abs(lp.rhs).max()) for lp in laps)
    # interior junction: zero accumulated periodicity; seam junction:
    # its far-side neighbors each accumulate the 2*pi x-offset
    assert rhs_norms[0] < 1e-12
    assert rhs_norms[1] > 1.0
    assert (info.kind == Kind.SMOOTHED).sum() > 0


def _solve_fixed_point(solver_factory, n, m, seed=0):
    mesh = _strip_mesh(n, m)
    h = np.pi / (n - 1)
    exact = mesh.flat_coords().copy()
    # perturb every block interior; the smoothed fixed point must come
    # back to the analytic map through the periodic/junction coupling
    rng = np.random.default_rng(seed)
    for b, s in zip(mesh.blocks, mesh.block_row_starts()):
        ni, nj = b.size
        p = b.points.copy()
        p[1:-1, 1:-1] += (0.3 * h) * rng.standard_normal(
            p[1:-1, 1:-1].shape)
        b.points[...] = p
    info = classify(mesh)
    solver = solver_factory(mesh, info)
    cf = Laplace().init(mesh)
    coords = mesh.flat_coords()
    for _ in range(80):
        new = solver.solve(coords, cf)
        d = new - coords
        coords = new
        if float(d[:, 0] @ d[:, 0] + d[:, 1] @ d[:, 1]) < 1e-26:
            break
    return np.abs(coords - exact).max()


@pytest.mark.parametrize("backend", ["direct", "device"])
def test_periodic_junction_second_order(backend):
    """Max error vs the analytic inverse map over ALL points (incl.
    SMOOTHED seam rows, junction rows, and periodic slaves) drops ~4x
    per mesh halving — the same bar test_analytic_winslow.py sets for
    the interior stencil, now across the periodic+junction topology."""
    if backend == "direct":
        factory = lambda mesh, info: SparseSystem(mesh, info)
    else:
        from turbomesh_tpu.smoothing.device import DeviceSmoother

        factory = lambda mesh, info: DeviceSmoother(
            mesh, info, rtol=1e-12, atol=1e-14)

    e_coarse = _solve_fixed_point(factory, 9, 5)
    e_fine = _solve_fixed_point(factory, 17, 9)
    # sanity: genuinely close to the analytic map at both resolutions
    assert e_coarse < 5e-3, e_coarse
    assert e_fine < 1.5e-3, e_fine
    ratio = e_coarse / e_fine
    assert 3.0 < ratio < 5.6, (e_coarse, e_fine, ratio)


def test_reversed_periodic_orientation_is_rejected():
    """A periodic connection oriented range1->range0 at a junction would
    silently shift the junction row by a full period (the raw-periodicity
    accumulation of smooth.zig:1381-1384 is direction-agnostic); classify
    must reject it loudly instead."""
    n, m = 9, 5
    mesh = _strip_mesh(n, m)
    BL, BR = 0, 1
    bad = Connection((Range(BR, Side.J_MAX, 0, m - 1),
                      Range(BL, Side.J_MIN, 0, m - 1)),
                     periodicity=(-2.0 * np.pi, 0.0))
    mesh.connections[4] = bad
    with pytest.raises(ValueError, match="junction group"):
        classify(mesh)


def test_periodic_junction_three_level_order_chain():
    """Three-level refinement pins the ORDER itself (log2 ratios ~2)."""
    factory = lambda mesh, info: SparseSystem(mesh, info)
    errs = [_solve_fixed_point(factory, n, m)
            for n, m in ((9, 5), (17, 9), (33, 17))]
    orders = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert np.all(orders > 1.5) and np.all(orders < 2.7), (errs, orders)
