"""Boundary-aligned multigrid coarsening (glue.keep_boundaries).

The plain [::2] lattice loses a block's far boundary whenever the
lattice length goes even; the coarse level then imposes Dirichlet-0 up
to 2^level fine cells INSIDE the block, which collapses the V-cycle's
coarse correction over widening strips (measured: V-I preconditioner
contraction ~0.995/iteration at 5.4M nodes, scale 15's 1501 -> 751 ->
376 chain). keep_boundaries=True subsamples with both endpoints kept
(glue._subsample_positions) and routes transfers through per-block
gather maps. On odd (stride-2 aligned) transitions the maps are omitted
and behavior is bit-identical to the slicing fast path.
"""

import numpy as np
import jax.numpy as jnp

from turbomesh_tpu.mesh import Mesh
from turbomesh_tpu.smoothing.classify import classify
from turbomesh_tpu.smoothing.control_function import Laplace
from turbomesh_tpu.smoothing.device import DeviceSmoother
from turbomesh_tpu.smoothing.glue import _bracket, _subsample_positions
from turbomesh_tpu.smoothing.multigrid import (_prolong, _prolong_mapped,
                                               _subsample_mapped)
from turbomesh_tpu.smoothing.system import SparseSystem

from test_device_solver import _uniform_block


def test_subsample_positions_odd_is_stride2():
    for n in (5, 9, 41, 321, 1501):
        assert np.array_equal(_subsample_positions(n),
                              2 * np.arange((n - 1) // 2 + 1))


def test_subsample_positions_even_keeps_boundary():
    for n in (6, 10, 40, 376, 751):
        pos = _subsample_positions(n)
        assert pos[0] == 0 and pos[-1] == n - 1
        assert len(pos) == (n - 1) // 2 + 1
        assert np.all(np.diff(pos) >= 1)


def test_bracket_exact_and_interpolated():
    pos = _subsample_positions(10)  # [0, 2, 4, 7, 9]
    lo, w = _bracket(pos, 10)
    # on-lattice points: weight 0 at their own ordinal
    for c, f in enumerate(pos):
        assert lo[f] == c and w[f] == 0.0
    # between 4 (ordinal 2) and 7 (ordinal 3): linear thirds
    assert lo[5] == 2 and abs(w[5] - 1 / 3) < 1e-15
    assert lo[6] == 2 and abs(w[6] - 2 / 3) < 1e-15


def test_mapped_prolong_matches_strided_on_aligned():
    rng = np.random.default_rng(0)
    B, Nc, Mc = 2, 6, 5
    Nf, Mf = 2 * Nc - 1, 2 * Mc - 1
    zc = jnp.asarray(rng.standard_normal((B, Nc, Mc, 2)))
    pos_i, pos_j = 2 * np.arange(Nc), 2 * np.arange(Mc)
    pil, piw = _bracket(pos_i, Nf)
    pjl, pjw = _bracket(pos_j, Mf)
    tile = lambda a: jnp.asarray(np.tile(a, (B, 1)))
    got = _prolong_mapped(zc, (B, Nf, Mf), tile(pil), tile(piw),
                          tile(pjl), tile(pjw))
    want = _prolong(zc, (B, Nf, Mf))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_mapped_subsample_matches_strided_on_aligned():
    rng = np.random.default_rng(1)
    B, Nf, Mf = 2, 9, 7
    a = jnp.asarray(rng.standard_normal((B, Nf, Mf, 2)))
    im = jnp.asarray(np.tile(2 * np.arange(5), (B, 1)).astype(np.int32))
    jm = jnp.asarray(np.tile(2 * np.arange(4), (B, 1)).astype(np.int32))
    got = _subsample_mapped(a, im, jm)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(a[:, ::2, ::2, :]))


def test_even_size_block_device_parity():
    """A block with EVEN lattice lengths (misaligned under [::2]) still
    matches the sparse-direct oracle through the device solver — the
    boundary-aligned maps keep the hierarchy consistent."""
    mesh = Mesh()
    # 14 x 12: both axes go even at the first coarsening
    mesh.add_block("b", _uniform_block(14, 12, distort=0.04))
    info = classify(mesh)
    dev = DeviceSmoother(mesh, info)
    # maps must actually be exercised on some level
    assert any(gl.li_map is not None for gl in dev._glue)
    oracle = SparseSystem(mesh, info)
    cf = Laplace().init(mesh)
    co = mesh.flat_coords()
    cd = co.copy()
    for _ in range(2):
        co = oracle.solve(co, cf)
        cd = dev.solve(cd, cf)
        err = np.abs(co - cd).max()
        assert err < 1e-10, f"device vs oracle mismatch {err:.3e}"
