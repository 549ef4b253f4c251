"""Red-black SOR smoother: convergence to the Winslow fixed point."""

import numpy as np
import jax.numpy as jnp

from turbomesh_tpu.clustering import Uniform
from turbomesh_tpu.ops.sor import red_black_sor


def test_rb_sor_converges_to_uniform():
    """Frozen-coefficient Laplace system on a distorted uniform square:
    SOR sweeps must relax the interior back to the uniform grid (the
    linearized solution at base=uniform)."""
    n, m = 17, 13
    u = Uniform()(n)
    v = Uniform()(m)
    exact = np.stack(np.meshgrid(u, v, indexing="ij"), axis=-1)
    rng = np.random.default_rng(0)
    x0 = exact.copy()
    x0[1:-1, 1:-1] += 0.02 * rng.standard_normal(x0[1:-1, 1:-1].shape)

    interior = np.zeros((n, m), dtype=bool)
    interior[1:-1, 1:-1] = True
    cf = np.zeros((n, m, 2))

    x = jnp.asarray(x0)
    base = jnp.asarray(exact)  # freeze coefficients at the uniform grid
    for _ in range(20):
        x = red_black_sor(base, jnp.asarray(cf), x, jnp.asarray(interior),
                          omega=1.5, sweeps=25, use_pallas=False)
    err = np.abs(np.asarray(x) - exact).max()
    assert err < 1e-10, err


def test_rb_sor_boundary_fixed():
    n, m = 9, 9
    u = Uniform()(n)
    exact = np.stack(np.meshgrid(u, u, indexing="ij"), axis=-1)
    x0 = exact.copy()
    x0[1:-1, 1:-1] += 0.05
    interior = np.zeros((n, m), dtype=bool)
    interior[1:-1, 1:-1] = True
    cf = np.zeros((n, m, 2))
    x = red_black_sor(jnp.asarray(exact), jnp.asarray(cf), jnp.asarray(x0),
                      jnp.asarray(interior), sweeps=3, use_pallas=False)
    x = np.asarray(x)
    np.testing.assert_array_equal(x[0, :], exact[0, :])
    np.testing.assert_array_equal(x[-1, :], exact[-1, :])
    np.testing.assert_array_equal(x[:, 0], exact[:, 0])
    np.testing.assert_array_equal(x[:, -1], exact[:, -1])


def test_rb_sor_pallas_interpret_matches_fallback():
    """The Pallas kernel (interpreter mode on CPU) must match the XLA
    fallback bit-for-bit."""
    n, m = 16, 16
    u = Uniform()(n)
    exact = np.stack(np.meshgrid(u, u, indexing="ij"), axis=-1).astype(np.float32)
    rng = np.random.default_rng(1)
    x0 = exact.copy()
    x0[1:-1, 1:-1] += 0.03 * rng.standard_normal(x0[1:-1, 1:-1].shape).astype(np.float32)
    interior = np.zeros((n, m), dtype=bool)
    interior[1:-1, 1:-1] = True
    cf = np.zeros((n, m, 2), np.float32)
    args = [jnp.asarray(exact), jnp.asarray(cf), jnp.asarray(x0), jnp.asarray(interior)]
    a = red_black_sor(*args, sweeps=5, use_pallas=True, interpret=True)
    b = red_black_sor(*args, sweeps=5, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tridiag_pcr_matches_thomas():
    from turbomesh_tpu.smoothing.krylov import thomas, tridiag_pcr

    rng = np.random.default_rng(0)
    for n in (5, 64, 200, 257):
        dl = rng.random((3, 4, n))
        d = 4.0 + rng.random((3, 4, n))
        du = rng.random((3, 4, n))
        rhs = rng.random((3, 4, n, 2))
        dl[..., 0] = 0.0
        du[..., -1] = 0.0
        a = np.asarray(thomas(jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
                              jnp.asarray(rhs)))
        b = np.asarray(tridiag_pcr(jnp.asarray(dl), jnp.asarray(d),
                                   jnp.asarray(du), jnp.asarray(rhs)))
        np.testing.assert_allclose(a, b, atol=1e-11, err_msg=f"n={n}")
