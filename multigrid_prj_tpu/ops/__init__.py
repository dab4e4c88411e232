"""Compute kernels: stencil operators, smoothers, grid transfer, residuals,
Krylov solvers, and sparse-matrix ops.  Pure functions over JAX arrays —
everything here is jit-able, shard_map-able, and differentiable where
meaningful."""

from multigrid_prj_tpu.ops.stencil import (
    boundary_mask,
    interior_mask,
    neighbor_sum,
    poisson_apply,
    poisson_diag,
    poisson_residual,
)
from multigrid_prj_tpu.ops.smoothers import jacobi, red_black_gauss_seidel
from multigrid_prj_tpu.ops.transfer import (
    prolong,
    restrict_full_weighting,
    restrict_inject,
)
from multigrid_prj_tpu.ops.residual import norm2, rel_residual_norm

__all__ = [
    "boundary_mask",
    "interior_mask",
    "neighbor_sum",
    "poisson_apply",
    "poisson_diag",
    "poisson_residual",
    "jacobi",
    "red_black_gauss_seidel",
    "prolong",
    "restrict_full_weighting",
    "restrict_inject",
    "norm2",
    "rel_residual_norm",
]
