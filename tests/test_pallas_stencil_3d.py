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


def test_3d_gmg_solver_with_pallas_smoother(monkeypatch):
    """3D GMG with the Pallas path: routing + numerics, without the full
    jitted interpret-mode solve.

    A full ``solve()`` under ``force_tpu_interpret_mode`` at 40x40x128
    compiles for >8 minutes per program on this 2-core box (the interpret
    lowering of each 3D kernel is a giant XLA program; the real-TPU Mosaic
    compile is seconds — bench.py's ``vcycle3d_257`` entry covers that
    path on hardware).  Here: (a) the solver must ROUTE its smoother /
    residual through the 3D Pallas entry points for padded 3D levels;
    (b) those entry points, swapped for their XLA equivalents at solver
    level, must reproduce the XLA solver exactly — isolating the wiring
    (padding, logical shapes, dispatch) that this test owns from the
    kernel numerics that the kernel-level tests above own."""
    from multigrid_prj_tpu import gmg as gmg_mod
    from multigrid_prj_tpu.gmg import GMGSolver
    from multigrid_prj_tpu.ops import pallas_stencil as p2
    from tests.test_gmg_3d import rhs_3d

    n = 33
    kw = dict(shape=(n, n, n), length=10.0, alpha=10.0, num_levels=3,
              cycle="v", nu=2, pre_sweeps=2, tol=1e-5, maxit=30,
              smoother_dtype=jnp.float32)
    b32 = jnp.asarray(rhs_3d((n, n, n), 10.0), jnp.float32)
    sx = GMGSolver(use_pallas=False, **kw)
    ref = sx.solve(b32)

    # (a) routing: the pallas solver's smoother/residual are the pallas
    # entry points, and those entry points dispatch 3D padded shapes to
    # the 3D kernels (predicate check — no interpret compile needed)
    sp = GMGSolver(use_pallas=True, pad_align=(40, 40, 128), **kw)
    assert sp._residual_fn is p2.poisson_residual
    assert sp.levels[0].padded_shape == (40, 40, 128)
    assert p3._is_supported3d(sp.levels[0].padded_shape, jnp.float32)

    # (b) wiring numerics: run the SAME padded solver with the pallas entry
    # points swapped for their XLA-reference implementations — everything
    # the pallas path adds (padded levels, logical-shape plumbing, dead-zone
    # handling) stays active, and the result must match the unpadded XLA
    # solver
    calls = {"residual": 0, "rbgs": 0}

    def fake_residual(u, b, alpha, h, logical_shape=None):
        calls["residual"] += 1
        return xs.poisson_residual(u, b, alpha, h, logical_shape)

    def fake_rbgs(u, b, alpha, h, sweeps=1, omega=1.0, logical_shape=None):
        calls["rbgs"] += 1
        return sm.red_black_gauss_seidel(u, b, alpha, h, sweeps=sweeps,
                                         logical_shape=logical_shape)

    monkeypatch.setattr(p2, "poisson_residual", fake_residual)
    monkeypatch.setattr(p2, "red_black_gauss_seidel", fake_rbgs)
    sp2 = GMGSolver(use_pallas=True, pad_align=(40, 40, 128), **kw)
    out = sp2.solve(b32)
    assert calls["residual"] > 0 and calls["rbgs"] > 0  # routed via pallas
    du = np.abs(np.asarray(out.u, np.float64)[:n, :n, :n]
                - np.asarray(ref.u, np.float64)).max()
    scale = np.abs(np.asarray(ref.u)).max()
    assert du / scale < 1e-4, du / scale
