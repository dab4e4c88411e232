"""Poisson model problems: built-in test functions and RHS assembly.

Parity with the reference:

* The three built-in ``(f, g)`` pairs match
  ``GeometricMultigrid/src/utilities.cpp:138-147`` exactly (the ``// FFF`` /
  ``// END`` table the PHP web UI scrapes):
    test 0: ``f = 1``, ``g = 0``
    test 1: ``f = -5 e^x e^{-2y}``, ``g = e^x e^{-2y}``
    test 2: ``f = -30 (cos(30 r)/r - 30 sin(30 r))`` (0 at ``r = 0``),
            ``g = sin(30 r)``, ``r = sqrt(x^2 + y^2)``
  Out-of-range test indices fall back to test 0 with a warning
  (``utilities.cpp:149-157``).
* RHS sampling matches ``DataVector`` (``linear_system.hpp:85-92``): ``f`` at
  interior nodes, ``g`` at boundary nodes of the finest grid, using the
  reference's coordinate convention ``coord(i, j) = (j h, L - i h)``
  (``domain.hpp:68``: x grows with the column, y decreases with the row).
"""

from __future__ import annotations

import warnings
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from multigrid_prj_tpu.grids import GridLevel
from multigrid_prj_tpu.ops.stencil import boundary_mask


def _t0_f(x, y):
    return jnp.ones_like(x)


def _t0_g(x, y):
    return jnp.zeros_like(x)


def _t1_f(x, y):
    return -5.0 * jnp.exp(x) * jnp.exp(-2.0 * y)


def _t1_g(x, y):
    return jnp.exp(x) * jnp.exp(-2.0 * y)


def _t2_f(x, y):
    r = jnp.sqrt(x * x + y * y)
    val = -30.0 * (jnp.cos(30.0 * r) / jnp.where(r == 0.0, 1.0, r) - 30.0 * jnp.sin(30.0 * r))
    return jnp.where(r == 0.0, 0.0, val)


def _t2_g(x, y):
    return jnp.sin(30.0 * jnp.sqrt(x * x + y * y))


TEST_FUNCTIONS: dict[int, tuple[Callable, Callable]] = {
    0: (_t0_f, _t0_g),
    1: (_t1_f, _t1_g),
    2: (_t2_f, _t2_g),
}


def get_test_functions(i: int) -> tuple[Callable, Callable]:
    """Select ``(f, g)`` with the reference's fallback (``utilities.cpp:149-157``)."""
    if i not in TEST_FUNCTIONS:
        warnings.warn("Invalid test case index. Default test case selected.")
        return TEST_FUNCTIONS[0]
    return TEST_FUNCTIONS[i]


def grid_coords(shape: Sequence[int], length: float, dtype=jnp.float32):
    """Node coordinate arrays in the reference's convention.

    2D: ``x[i, j] = j h``, ``y[i, j] = L - i h`` (``domain.hpp:68``).
    3D extends with ``z[k] = L - k h`` on the leading axis (framework
    extension; the reference is 2D-only).
    """
    shape = tuple(int(s) for s in shape)
    h = length / (shape[0] - 1)
    if len(shape) == 2:
        i = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(dtype)
        j = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
        return j * h, length - i * h
    if len(shape) == 3:
        k = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(dtype)
        i = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
        j = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(dtype)
        return j * h, length - i * h, length - k * h
    raise ValueError(f"unsupported rank {len(shape)}")


def assemble_rhs(
    level: GridLevel,
    length: float,
    test: int = 1,
    f: Callable | None = None,
    g: Callable | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Sample ``f`` on interior nodes and ``g`` on boundary nodes.

    Matches ``DataVector`` (``linear_system.hpp:85-92``).  Custom ``f``/``g``
    callables (taking the coordinate arrays) override the registry.
    """
    if f is None or g is None:
        rf, rg = get_test_functions(test)
        f = f or rf
        g = g or rg
    coords = grid_coords(level.shape, length, dtype=dtype)
    bmask = boundary_mask(level.shape)
    return jnp.where(bmask, g(*coords), f(*coords)).astype(dtype)


def poisson_fd_csr(nx: int, ny: int | None = None):
    """5-point FD Laplacian on the ``nx x ny`` interior-node grid as a
    :class:`~multigrid_prj_tpu.ops.sparse.HostCSR` (Dirichlet eliminated).

    The standard algebraic test system for the AMG path at sizes where no
    mesh file exists — the explicit-matrix analog of the stencil operator
    (``GeometricMultigrid/include/linear_system.hpp:21-42``) in the CSR form
    the reference AMG consumes (``AMG/src/CSRMatrix.cpp:24-52``).  Vectorized
    COO assembly; ~0.5 s per 10M rows on the host.
    """
    import numpy as np

    from multigrid_prj_tpu.ops.sparse import HostCSR

    ny = nx if ny is None else ny
    n = nx * ny
    idx = np.arange(n, dtype=np.int64)
    ix, iy = idx // ny, idx % ny
    rows = [idx]
    cols = [idx]
    vals = [np.full(n, 4.0)]
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        jx, jy = ix + di, iy + dj
        keep = (jx >= 0) & (jx < nx) & (jy >= 0) & (jy < ny)
        rows.append(idx[keep])
        cols.append((jx * ny + jy)[keep])
        vals.append(np.full(keep.sum(), -1.0))
    return HostCSR.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
        (n, n), sum_duplicates=False,
    )
