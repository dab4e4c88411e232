"""3D Pallas stencil kernels vs the XLA reference path (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from multigrid_prj_tpu.ops import pallas_stencil_3d as p3
from multigrid_prj_tpu.ops import smoothers as sm
from multigrid_prj_tpu.ops import stencil as xs

SHAPE = (16, 16, 128)  # nz, ny, nx (aligned)
LOGICAL = (14, 13, 120)
ALPHA, H = 10.0, 10.0 / 13


@pytest.fixture(scope="module")
def ub():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    b = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    return u, b


def _close(got, want, tol=2e-5):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    scale = max(np.abs(want).max(), 1.0)
    assert np.abs(got - want).max() < tol * scale, \
        np.abs(got - want).max() / scale


def test_supported_predicate():
    assert p3._is_supported3d((16, 16, 128), jnp.float32)
    assert p3._is_supported3d((33, 264, 384), jnp.float32)
    assert not p3._is_supported3d((16, 15, 128), jnp.float32)  # ny % 8
    assert not p3._is_supported3d((16, 16, 120), jnp.float32)  # nx % 128
    assert not p3._is_supported3d((16, 128), jnp.float32)


@pytest.mark.parametrize("logical", [None, LOGICAL])
def test_apply3d_matches_xla(ub, logical):
    u, _ = ub
    with pltpu.force_tpu_interpret_mode():
        got = p3.poisson_apply_3d(u, ALPHA, H, logical_shape=logical)
    want = xs.poisson_apply(u, ALPHA, H, logical)
    _close(got, want)


@pytest.mark.parametrize("logical", [None, LOGICAL])
def test_residual3d_matches_xla(ub, logical):
    u, b = ub
    with pltpu.force_tpu_interpret_mode():
        got = p3.poisson_residual_3d(u, b, ALPHA, H, logical_shape=logical)
    want = xs.poisson_residual(u, b, ALPHA, H, logical)
    _close(got, want)


@pytest.mark.parametrize("logical", [None, LOGICAL])
def test_rbgs3d_matches_xla(ub, logical):
    u, b = ub
    with pltpu.force_tpu_interpret_mode():
        got = p3.red_black_gauss_seidel_3d(u, b, ALPHA, H, sweeps=2,
                                           logical_shape=logical)
    want = sm.red_black_gauss_seidel(u, b, ALPHA, H, sweeps=2,
                                     logical_shape=logical)
    _close(got, want)


def test_jacobi3d_matches_xla(ub):
    u, b = ub
    with pltpu.force_tpu_interpret_mode():
        got = p3.jacobi_3d(u, b, ALPHA, H, omega=2.0 / 3.0, sweeps=3)
    want = sm.jacobi(u, b, ALPHA, H, omega=2.0 / 3.0, sweeps=3)
    _close(got, want)


def test_2d_entry_points_delegate_3d(ub):
    from multigrid_prj_tpu.ops import pallas_stencil as p2

    u, b = ub
    with pltpu.force_tpu_interpret_mode():
        _close(p2.poisson_apply(u, ALPHA, H),
               xs.poisson_apply(u, ALPHA, H, None))
        _close(p2.red_black_gauss_seidel(u, b, ALPHA, H, sweeps=1),
               sm.red_black_gauss_seidel(u, b, ALPHA, H, sweeps=1))


def test_3d_gmg_solver_with_pallas_smoother():
    """End-to-end 3D GMG with the Pallas smoother path (padded layout) vs
    the XLA path."""
    from multigrid_prj_tpu.gmg import GMGSolver
    from tests.test_gmg_3d import rhs_3d

    n = 33
    kw = dict(shape=(n, n, n), length=10.0, alpha=10.0, num_levels=3,
              cycle="v", nu=2, pre_sweeps=2, tol=1e-5, maxit=30,
              smoother_dtype=jnp.float32)
    b = rhs_3d((n, n, n), 10.0)
    b32 = jnp.asarray(b, jnp.float32)
    sx = GMGSolver(use_pallas=False, **kw)
    ref = sx.solve(b32)
    sp = GMGSolver(use_pallas=True, pad_align=(40, 40, 128), **kw)
    with pltpu.force_tpu_interpret_mode():
        out = sp.solve(b32)
    du = np.abs(np.asarray(out.u, np.float64)[:n, :n, :n]
                - np.asarray(ref.u, np.float64)).max()
    scale = np.abs(np.asarray(ref.u)).max()
    assert du / scale < 1e-4, du / scale
