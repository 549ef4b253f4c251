"""Foundation-layer tests: clustering laws, splines, edges, TFI.

Mirrors the reference's unit tests (SURVEY.md §4): spline straight-line
exactness, monotonic arc mapping, two-point length, Edge.combine cases,
and the T106 physical-data arc-length validation.
"""

import numpy as np
import pytest

from turbomesh_tpu.clustering import Uniform, Roberts, SingleHyperbolic
from turbomesh_tpu.spline import FittingSpline
from turbomesh_tpu.geometry import Line
from turbomesh_tpu.edge import Edge, EdgeView
from turbomesh_tpu import tfi
from turbomesh_tpu.input import parse_csv_points, _read_side


def test_uniform_clustering():
    u = Uniform()(5)
    np.testing.assert_allclose(u, [0.0, 0.25, 0.5, 0.75, 1.0], rtol=0, atol=0)


def test_roberts_endpoints_and_symmetry():
    u = Roberts(alpha=0.5, beta=1.03)(11)
    assert abs(u[0]) < 1e-15 and abs(u[-1] - 1.0) < 1e-15
    # alpha=0.5 clusters both ends symmetrically
    np.testing.assert_allclose(u + u[::-1], 1.0, atol=1e-14)
    # clustered: first spacing much smaller than middle spacing
    d = np.diff(u)
    assert d[0] < 0.3 * d[len(d) // 2]


def test_vinokur_first_spacing():
    ds = 0.01
    u = SingleHyperbolic(delta_s=ds)(41)
    assert u[0] == 0.0 and u[-1] == 1.0
    # the tanh law matches the requested first spacing approximately
    assert 0.3 * ds < u[1] - u[0] < 3.0 * ds
    assert np.all(np.diff(u) > 0)


def test_vinokur_log_branch():
    # large delta_s pushes y = 1/((n-1) ds) below the crossover; tiny ds
    # exercises the log branch
    u = SingleHyperbolic(delta_s=1e-6)(11)
    assert u[0] == 0.0 and u[-1] == 1.0
    assert np.all(np.diff(u) > 0)


# --- spline tests (spline.zig:235-304) --------------------------------------

def test_spline_straight_line():
    pts = np.array([[0, 0], [0.5, 0.5], [1, 1], [2, 2], [3, 3], [4, 4]], float)
    s = FittingSpline(pts)
    u = [0.0, 0.125, 0.25, 0.5, 0.75, 1.0]
    vals = s.interpolate(u)
    np.testing.assert_allclose(vals, pts, atol=1e-9)
    assert abs(s.integrate() - np.sqrt(2.0) * 4.0) < 1e-9


def test_spline_monotonic_arc_mapping():
    pts = np.array([[0, 0], [1, 0.5], [2, 1.5], [2.5, 3.0]], float)
    s = FittingSpline(pts)
    vals = s.interpolate([0.0, 0.5, 1.0])
    assert vals[0, 0] <= vals[1, 0] <= vals[2, 0]
    np.testing.assert_allclose(vals[0], pts[0], atol=1e-9)
    np.testing.assert_allclose(vals[2], pts[-1], atol=1e-9)


def test_spline_two_point_length():
    s = FittingSpline(np.array([[0.0, 0.0], [0.0, 3.0]]))
    assert abs(s.integrate() - 3.0) < 1e-9


def test_t106_blade_arc_length():
    """Physical-data validation (pattern of spline.zig:306-514): the fitted
    spline arc length of each T106 blade side must agree with the chord
    polyline length of the input data within 0.5% (a smooth fit through
    dense blade data adds negligible length)."""
    for path in (
        "/root/repo/examples/T106/T106_ss.dat",
        "/root/repo/examples/T106/T106_ps.dat",
    ):
        pts = _read_side(path)
        s = FittingSpline(pts)
        polyline = np.sum(np.sqrt(np.sum(np.diff(pts, axis=0) ** 2, axis=1)))
        assert abs(s.integrate() - polyline) / polyline < 5e-3


def test_stieger_t106_published_arc_length():
    """Reference ground-truth anchor (spline.zig:306-514): fit the full
    Stieger T106 blade (184 points over chord, Table I-2 p.213 of Stieger's
    PhD thesis) scaled by the 198 mm chord; the integrated spline arc
    length must match the PUBLISHED suction + pressure surface lengths
    264.7 mm + 230.0 mm within the reference's 1e-2 (absolute, meters).

    The Zig reference binary cannot run in this environment (no Zig
    toolchain), so this published-data assertion is the independent
    correctness oracle for the spline component; the golden files in
    tests/golden are framework-pinned regressions, not reference diffs.
    """
    pts = parse_csv_points("/root/repo/tests/data/stieger_t106_blade.csv")
    assert pts.shape == (184, 2)
    chord = 198.0e-3  # [m]
    s = FittingSpline(pts * chord)
    suction = 264.7e-3
    pressure = 230.0e-3
    assert abs(s.integrate() - (suction + pressure)) < 1e-2


def test_csv_parse_endpoints():
    """csv.zig:59-67 — first/last points of T106_ps.dat parse exactly."""
    data = parse_csv_points("/root/repo/examples/T106/T106_ps.dat")
    np.testing.assert_array_equal(data[0], [1.127030384, -0.047185256])
    np.testing.assert_array_equal(data[-1], [1.047805900, 0.000076595])


# --- edge combine tests (discrete.zig:219-290) -------------------------------

def _edge(start, end):
    return Edge.from_curve(3, Line(start, end), Uniform())


def test_combine_forward():
    e1 = _edge((0.0, 0.0), (2.0, 0.0))
    e2 = _edge((2.0, 0.0), (4.0, 0.0))
    e = Edge.combine([EdgeView(e1, 0, 2), EdgeView(e2, 0, 2)])
    np.testing.assert_array_equal(e.points[:, 0], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(e.clustering, [0.0, 0.25, 0.5, 0.75, 1.0])


def test_combine_partial():
    e1 = _edge((0.0, 0.0), (2.0, 0.0))
    e2 = _edge((2.0, 0.0), (4.0, 0.0))
    e = Edge.combine([EdgeView(e1, 1, 2), EdgeView(e2, 0, 1)])
    np.testing.assert_array_equal(e.points[:, 0], [1, 2, 3])
    np.testing.assert_array_equal(e.clustering, [0.0, 0.5, 1.0])


def test_combine_fully_reversed():
    e1 = _edge((0.0, 0.0), (2.0, 0.0))
    e2 = _edge((2.0, 0.0), (4.0, 0.0))
    e = Edge.combine([EdgeView(e2, 2, 0), EdgeView(e1, 2, 0)])
    np.testing.assert_array_equal(e.points[:, 0], [4, 3, 2, 1, 0])
    np.testing.assert_array_equal(e.clustering, [0.0, 0.25, 0.5, 0.75, 1.0])


def test_combine_mixed_direction():
    e1 = _edge((0.0, 0.0), (2.0, 0.0))
    e2 = _edge((2.0, 0.0), (4.0, 0.0))
    e = Edge.combine([EdgeView(e2, 1, 0), EdgeView(e1, 2, 1)])
    np.testing.assert_array_equal(e.points[:, 0], [3, 2, 1])
    np.testing.assert_array_equal(e.clustering, [0.0, 0.5, 1.0])


def test_combine_mismatch_raises():
    e1 = _edge((0.0, 0.0), (2.0, 0.0))
    e2 = _edge((2.5, 0.0), (4.0, 0.0))
    with pytest.raises(ValueError):
        Edge.combine([EdgeView(e1, 0, 2), EdgeView(e2, 0, 2)])


# --- TFI tests ----------------------------------------------------------------

def test_blended_tfi_unit_square_uniform():
    n, m = 5, 4
    s = Uniform()(n)
    t = Uniform()(m)
    x_i_min = np.stack([s, np.zeros(n)], 1)          # j=0 row: y=0
    x_i_max = np.stack([s, np.ones(n)], 1)           # j=m-1 row: y=1
    x_j_min = np.stack([np.zeros(m), t], 1)          # i=0 col: x=0
    x_j_max = np.stack([np.ones(m), t], 1)           # i=n-1 col: x=1
    out = np.asarray(tfi.blended_tfi(x_i_min, x_i_max, x_j_min, x_j_max, s, s, t, t))
    expect = np.stack(np.meshgrid(s, t, indexing="ij"), axis=-1)
    np.testing.assert_allclose(out, expect, atol=1e-14)


def test_blended_tfi_respects_boundary_clustering():
    # clustered i on both rails -> interior follows the clustering exactly on
    # a rectangle
    n, m = 9, 5
    s = Roberts(alpha=0.5, beta=1.05)(n)
    t = Uniform()(m)
    x_i_min = np.stack([s, np.zeros(n)], 1)
    x_i_max = np.stack([s, np.ones(n)], 1)
    x_j_min = np.stack([np.zeros(m), t], 1)
    x_j_max = np.stack([np.ones(m), t], 1)
    out = np.asarray(tfi.blended_tfi(x_i_min, x_i_max, x_j_min, x_j_max, s, s, t, t))
    for j in range(m):
        np.testing.assert_allclose(out[:, j, 0], s, atol=1e-13)


def test_linear_tfi_matches_blended_on_uniform():
    n, m = 6, 7
    rng = np.random.default_rng(0)
    # gently perturbed boundaries of a rectangle
    s = Uniform()(n)
    t = Uniform()(m)
    x_i_min = np.stack([s, 0.05 * rng.standard_normal(n)], 1)
    x_i_max = np.stack([s, 1.0 + 0.05 * rng.standard_normal(n)], 1)
    x_i_min[0] = (0, 0); x_i_min[-1] = (1, 0)
    x_i_max[0] = (0, 1); x_i_max[-1] = (1, 1)
    x_j_min = np.stack([0.05 * rng.standard_normal(m), t], 1)
    x_j_max = np.stack([1.0 + 0.05 * rng.standard_normal(m), t], 1)
    x_j_min[0] = (0, 0); x_j_min[-1] = (0, 1)
    x_j_max[0] = (1, 0); x_j_max[-1] = (1, 1)
    a = np.asarray(tfi.blended_tfi(x_i_min, x_i_max, x_j_min, x_j_max, s, s, t, t))
    b = np.asarray(tfi.linear_tfi(x_i_min, x_i_max, x_j_min, x_j_max))
    np.testing.assert_allclose(a, b, atol=1e-13)
