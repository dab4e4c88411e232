"""Smoother property tests: exact solutions are fixed points, sweeps reduce
the residual, and boundary rows are pinned to ``b`` (``solvers.hpp:37-46``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_prj_tpu.ops.residual import rel_residual_norm
from multigrid_prj_tpu.ops.smoothers import jacobi, red_black_gauss_seidel
from tests.test_stencil import dense_poisson_2d

N, ALPHA, H = 17, 10.0, 0.5


def setup_system(seed=0):
    rng = np.random.default_rng(seed)
    A = dense_poisson_2d(N, ALPHA, H)
    b = rng.standard_normal((N, N))
    u_exact = np.linalg.solve(A, b.reshape(-1)).reshape(N, N)
    return jnp.asarray(b), jnp.asarray(u_exact)


@pytest.mark.parametrize("smoother", [
    lambda u, b: jacobi(u, b, ALPHA, H),
    lambda u, b: jacobi(u, b, ALPHA, H, omega=0.8),
    lambda u, b: red_black_gauss_seidel(u, b, ALPHA, H),
])
def test_exact_solution_is_fixed_point(smoother):
    b, u_exact = setup_system()
    u1 = smoother(u_exact, b)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u_exact), atol=1e-11)


@pytest.mark.parametrize("smoother", [
    lambda u, b, s: jacobi(u, b, ALPHA, H, omega=0.8, sweeps=s),
    lambda u, b, s: red_black_gauss_seidel(u, b, ALPHA, H, sweeps=s),
])
def test_high_frequency_error_damped_fast(smoother):
    """The smoothing property: checkerboard (highest-frequency) error is
    crushed within a few sweeps, long before the smooth error converges."""
    b, u_exact = setup_system(seed=4)
    i = np.indices((N, N)).sum(axis=0)
    noise = np.where((i % 2) == 0, 1.0, -1.0)
    noise[0, :] = noise[-1, :] = noise[:, 0] = noise[:, -1] = 0.0
    u = u_exact + jnp.asarray(noise)
    r0 = float(rel_residual_norm(u, b, ALPHA, H))
    u = smoother(u, b, 4)
    r4 = float(rel_residual_norm(u, b, ALPHA, H))
    assert r4 < 0.12 * r0, (r0, r4)


def test_boundary_pinned_to_b():
    b, _ = setup_system(seed=5)
    u = jnp.full_like(b, 7.0)
    for sm in (jacobi, red_black_gauss_seidel):
        u1 = np.asarray(sm(u, b, ALPHA, H))
        bb = np.asarray(b)
        np.testing.assert_allclose(u1[0, :], bb[0, :])
        np.testing.assert_allclose(u1[-1, :], bb[-1, :])
        np.testing.assert_allclose(u1[:, 0], bb[:, 0])
        np.testing.assert_allclose(u1[:, -1], bb[:, -1])


def test_rbgs_converges_standalone():
    """Many RB-GS sweeps alone converge on a small grid (stationary method)."""
    b, u_exact = setup_system(seed=6)
    u = jnp.zeros_like(b)
    u = red_black_gauss_seidel(u, b, ALPHA, H, sweeps=800)
    err = np.abs(np.asarray(u) - np.asarray(u_exact)).max()
    assert err < 1e-6
