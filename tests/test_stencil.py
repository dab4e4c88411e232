"""Stencil operator unit tests: matrix-free apply vs an explicitly assembled
dense matrix (the reference's ``PoissonMatrix`` semantics,
``linear_system.hpp:11-79``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_prj_tpu.ops.stencil import (
    boundary_mask,
    neighbor_sum,
    poisson_apply,
    poisson_residual,
)


def dense_poisson_2d(n, alpha, h):
    """Reference-semantics dense matrix: identity boundary rows, 4a/h^2 diag,
    -a/h^2 for the 4 axis neighbors."""
    c = alpha / (h * h)
    N = n * n
    A = np.zeros((N, N))
    for i in range(n):
        for j in range(n):
            row = i * n + j
            if i in (0, n - 1) or j in (0, n - 1):
                A[row, row] = 1.0
            else:
                A[row, row] = 4.0 * c
                for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    A[row, (i + di) * n + (j + dj)] = -c
    return A


def dense_poisson_3d(n, alpha, h):
    c = alpha / (h * h)
    N = n**3
    A = np.zeros((N, N))
    for k in range(n):
        for i in range(n):
            for j in range(n):
                row = (k * n + i) * n + j
                if any(t in (0, n - 1) for t in (k, i, j)):
                    A[row, row] = 1.0
                else:
                    A[row, row] = 6.0 * c
                    for dk, di, dj in (
                        (1, 0, 0), (-1, 0, 0), (0, 1, 0),
                        (0, -1, 0), (0, 0, 1), (0, 0, -1),
                    ):
                        A[row, ((k + dk) * n + (i + di)) * n + (j + dj)] = -c
    return A


def test_boundary_mask_2d():
    m = np.asarray(boundary_mask((4, 5)))
    assert m.shape == (4, 5)
    assert m[0].all() and m[-1].all() and m[:, 0].all() and m[:, -1].all()
    assert not m[1:-1, 1:-1].any()


def test_neighbor_sum_matches_manual():
    rng = np.random.default_rng(0)
    u = rng.standard_normal((6, 7))
    s = np.asarray(neighbor_sum(jnp.asarray(u)))
    up = np.pad(u[1:, :], ((0, 1), (0, 0)))
    dn = np.pad(u[:-1, :], ((1, 0), (0, 0)))
    lf = np.pad(u[:, 1:], ((0, 0), (0, 1)))
    rt = np.pad(u[:, :-1], ((0, 0), (1, 0)))
    np.testing.assert_allclose(s, up + dn + lf + rt, rtol=1e-14)


@pytest.mark.parametrize("n,alpha,h", [(7, 10.0, 0.5), (9, 1.0, 1.0 / 8)])
def test_apply_matches_dense_2d(n, alpha, h):
    rng = np.random.default_rng(1)
    u = rng.standard_normal((n, n))
    A = dense_poisson_2d(n, alpha, h)
    want = (A @ u.reshape(-1)).reshape(n, n)
    got = np.asarray(poisson_apply(jnp.asarray(u), alpha, h))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_apply_matches_dense_3d():
    n, alpha, h = 5, 3.0, 0.25
    rng = np.random.default_rng(2)
    u = rng.standard_normal((n, n, n))
    A = dense_poisson_3d(n, alpha, h)
    want = (A @ u.reshape(-1)).reshape(n, n, n)
    got = np.asarray(poisson_apply(jnp.asarray(u), alpha, h))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_residual_zero_at_exact_solution():
    n, alpha, h = 9, 2.0, 0.125
    rng = np.random.default_rng(3)
    A = dense_poisson_2d(n, alpha, h)
    b = rng.standard_normal(n * n)
    u = np.linalg.solve(A, b)
    r = np.asarray(
        poisson_residual(jnp.asarray(u.reshape(n, n)), jnp.asarray(b.reshape(n, n)), alpha, h)
    )
    assert np.abs(r).max() < 1e-10
