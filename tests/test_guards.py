"""NaN/Inf guards and cross-sharding determinism (SURVEY.md §5 sanitizer
analog: the reference had no race detection; the JAX equivalents are
finite-value guards and reduction-determinism checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_prj_tpu.utils.guards import (
    check_finite,
    count_nonfinite,
    guard_solve_io,
)


def test_count_nonfinite_jit_safe():
    x = jnp.array([1.0, jnp.nan, jnp.inf, -jnp.inf, 2.0])
    assert int(jax.jit(count_nonfinite)(x)) == 3
    assert int(count_nonfinite(jnp.ones(4))) == 0


def test_check_finite_raises_with_name():
    with pytest.raises(ValueError, match="rhs.*non-finite"):
        check_finite(np.array([0.0, np.nan]), "rhs")
    check_finite(np.zeros(3), "ok")  # no raise


def test_guard_solve_io_rejects_poisoned_input():
    @guard_solve_io
    def solve(b):
        return b

    with pytest.raises(ValueError, match="argument 0"):
        solve(jnp.array([1.0, jnp.nan]))


def test_guarded_gmg_solve_rejects_nan_rhs():
    from multigrid_prj_tpu.gmg import GMGSolver
    from multigrid_prj_tpu.models.poisson import assemble_rhs

    solver = GMGSolver(shape=(17, 17), num_levels=2)
    b = assemble_rhs(solver.levels[0], 10.0, test=1, dtype=jnp.float64)
    b = b.at[5, 5].set(jnp.nan)
    with pytest.raises(ValueError, match="non-finite"):
        solver.solve(b)


def test_sharded_solve_bitwise_deterministic():
    """The same sharded program run twice must be BITWISE identical: XLA
    fixes the psum reduction order for a fixed program, so any variation
    would indicate a real non-determinism bug."""
    from jax.sharding import Mesh

    from multigrid_prj_tpu.models.poisson import assemble_rhs
    from multigrid_prj_tpu.parallel.sharded_gmg import ShardedGMGSolver

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), axis_names=("x",))
    solver = ShardedGMGSolver(shape=(64, 64), mesh=mesh, num_levels=3,
                              tol=1e-8, maxit=30)
    b = assemble_rhs(solver.levels[0], 10.0, test=1, dtype=jnp.float32)
    r1 = solver.solve(b)
    r2 = solver.solve(b)
    assert r1.iterations == r2.iterations
    np.testing.assert_array_equal(np.asarray(r1.u), np.asarray(r2.u))
    np.testing.assert_array_equal(np.asarray(r1.history), np.asarray(r2.history))
