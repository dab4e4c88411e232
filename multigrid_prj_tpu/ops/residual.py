"""Residual norms and the convergence monitor.

Parity with the reference ``Residual`` class
(``GeometricMultigrid/include/solvers.hpp:219-308``): the monitored quantity
is the **relative** 2-norm ``sqrt(||b - A u||^2 / ||b||^2)``
(``solvers.hpp:305-307``), accumulated over every row including the identity
boundary rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multigrid_prj_tpu.ops.stencil import poisson_residual


def norm2(x: jax.Array) -> jax.Array:
    """Squared 2-norm (sum of squares over all nodes)."""
    return jnp.sum(x * x)


def rel_residual_norm(u: jax.Array, b: jax.Array, alpha: float, h: float,
                      logical_shape=None) -> jax.Array:
    """``||b - A u||_2 / ||b||_2`` (``solvers.hpp:305-307``)."""
    r = poisson_residual(u, b, alpha, h, logical_shape)
    return jnp.sqrt(norm2(r) / norm2(b))
