"""Pallas TPU kernels for the 2D Poisson stencil hot path.

The XLA lowering of the shifted-slice stencil (``ops/stencil.py``) issues
several padded-slice HLOs that do not fuse into a single memory pass (~100
GB/s measured on v5e).  These kernels stream each grid block through VMEM
exactly once:

* the row-block of ``u`` (``R`` rows x ``n`` lanes) is the pipelined input,
* the two halo rows arrive as separate single-row blocks whose index maps
  clamp at the grid edge (the garbage row this aliases in is only consumed
  at Dirichlet rows, which are masked to identity),
* east/west neighbors are lane rotations of the center block
  (``pltpu.roll``), again masked at the boundary columns.

Traffic per point for one apply: 4 B read + 4 B write (+ 8/R B halo) — the
HBM speed-of-light for this op.  Kernels require an aligned layout
(rows divisible by the block size, columns by 128); the public wrappers
fall back to the XLA path for other shapes, so all callers can use them
unconditionally.

Reference capability: ``PoissonMatrix``/smoother application loops
(``GeometricMultigrid/include/linear_system.hpp:21-42``,
``solvers.hpp:33-48``) — here as speed-of-light TPU kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_prj_tpu.ops import stencil as _xla

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _pick_block_rows(n: int, m: int, n_big_operands: int = 3) -> int | None:
    """Largest row-block size that divides ``n`` and fits VMEM.

    Budget: double-buffered big operands (u, b, out) of (R, m) f32 plus two
    8-row halo blocks.
    """
    for r in (256, 128, 64, 48, 32, 24, 16, 8):
        if n % r:
            continue
        bytes_needed = 2 * (n_big_operands * r * m * 4 + 2 * 8 * m * 4)
        if bytes_needed <= _VMEM_BUDGET:
            return r
    return None


def _is_supported(shape, dtype) -> bool:
    if len(shape) != 2:
        return False
    n, m = shape
    return (
        n % 8 == 0
        and m % _LANE == 0
        and _pick_block_rows(n, m) is not None
        and dtype in (jnp.float32, jnp.dtype("float32"))
    )


def _edge_specs(n: int, m: int, r: int):
    """Center + north/south halo block specs for an (n, m) operand.

    Halo blocks are 8 rows (the f32 sublane minimum); the kernel consumes
    only the last (north) / first (south) row.  At the global edges the
    index map clamps, aliasing in a garbage row that is consumed only at
    Dirichlet-masked points.
    """
    center = pl.BlockSpec((r, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rb = r // 8  # center block size in units of 8-row halo blocks
    north = pl.BlockSpec(
        (8, m), lambda i: (jnp.maximum(i * rb - 1, 0), 0), memory_space=pltpu.VMEM
    )
    south = pl.BlockSpec(
        (8, m),
        lambda i: (jnp.minimum((i + 1) * rb, n // 8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return center, north, south


def _masks(i, r, m, nl, ml):
    """Dirichlet mask for the (r, m) block starting at row i*r.

    ``nl, ml`` are LOGICAL extents (== physical for unpadded arrays); rows
    and columns at or beyond ``logical - 1`` are boundary, which pins the
    padded dead zone to identity rows (aligned-layout invariant)."""
    row = i * r + jax.lax.broadcasted_iota(jnp.int32, (r, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, m), 1)
    boundary = (row == 0) | (row >= nl - 1) | (col == 0) | (col >= ml - 1)
    return boundary


def _neighbor_tiles(cur, north_blk, south_blk):
    """north/south/east/west neighbor tiles of the center block.

    Edge wrap garbage is only consumed at boundary-masked points.
    """
    north = jnp.concatenate([north_blk[-1:, :], cur[:-1, :]], axis=0)
    south = jnp.concatenate([cur[1:, :], south_blk[:1, :]], axis=0)
    west = pltpu.roll(cur, 1, axis=1)
    east = pltpu.roll(cur, cur.shape[1] - 1, axis=1)  # roll by -1 (shift >= 0)
    return north, south, east, west


def _apply_kernel(u_ref, un_ref, us_ref, out_ref, *, c, m, r, nl, ml):
    i = pl.program_id(0)
    cur = u_ref[:]
    north, south, east, west = _neighbor_tiles(cur, un_ref[:], us_ref[:])
    stencil = c * (4.0 * cur - north - south - east - west)
    out_ref[:] = jnp.where(_masks(i, r, m, nl, ml), cur, stencil)


def _residual_kernel(u_ref, un_ref, us_ref, b_ref, out_ref, *, c, m, r, nl, ml):
    i = pl.program_id(0)
    cur = u_ref[:]
    north, south, east, west = _neighbor_tiles(cur, un_ref[:], us_ref[:])
    stencil = c * (4.0 * cur - north - south - east - west)
    out_ref[:] = b_ref[:] - jnp.where(_masks(i, r, m, nl, ml), cur, stencil)


def _rbgs_color_kernel(u_ref, un_ref, us_ref, b_ref, out_ref, *, c, m, r, nl,
                       ml, color):
    i = pl.program_id(0)
    cur = u_ref[:]
    north, south, east, west = _neighbor_tiles(cur, un_ref[:], us_ref[:])
    gs = (b_ref[:] / c + north + south + east + west) * 0.25
    row = i * r + jax.lax.broadcasted_iota(jnp.int32, (r, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, m), 1)
    boundary = (row == 0) | (row >= nl - 1) | (col == 0) | (col >= ml - 1)
    this_color = ((row + col) % 2) == color
    out = jnp.where(this_color & ~boundary, gs, cur)
    out_ref[:] = jnp.where(boundary, b_ref[:], out)


def _jacobi_kernel(u_ref, un_ref, us_ref, b_ref, out_ref, *, c, m, r, nl, ml,
                   omega):
    i = pl.program_id(0)
    cur = u_ref[:]
    north, south, east, west = _neighbor_tiles(cur, un_ref[:], us_ref[:])
    jac = (b_ref[:] / c + north + south + east + west) * 0.25
    if omega != 1.0:
        jac = (1.0 - omega) * cur + omega * jac
    boundary = _masks(i, r, m, nl, ml)
    out_ref[:] = jnp.where(boundary, b_ref[:], jac)


def _call(kernel, u, extra_inputs, n, m, r, logical_shape=None, **kw):
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)
    grid = (n // r,)
    center, north, south = _edge_specs(n, m, r)
    in_specs = [center, north, south] + [center] * len(extra_inputs)
    flops = 6 * n * m
    bytes_accessed = (2 + len(extra_inputs)) * 4 * n * m
    return pl.pallas_call(
        functools.partial(kernel, m=m, r=r, nl=nl, ml=ml, **kw),
        out_shape=jax.ShapeDtypeStruct((n, m), u.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=center,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
    )(u, u, u, *extra_inputs)


# ---------------------------------------------------------------------------
# Public wrappers (fall back to the XLA path for unsupported shapes)
# ---------------------------------------------------------------------------


def poisson_apply(u: jax.Array, alpha: float, h: float,
                  logical_shape=None) -> jax.Array:
    """Fused ``y = A u`` (identity at Dirichlet rows)."""
    if not _is_supported(u.shape, u.dtype):
        return _xla.poisson_apply(u, alpha, h, logical_shape)
    n, m = u.shape
    c = alpha / (h * h)
    return _call(_apply_kernel, u, (), n, m, _pick_block_rows(n, m, 2),
                 logical_shape=logical_shape, c=c)


def poisson_residual(u: jax.Array, b: jax.Array, alpha: float, h: float,
                     logical_shape=None) -> jax.Array:
    """Fused ``r = b - A u``."""
    if not _is_supported(u.shape, u.dtype):
        return _xla.poisson_residual(u, b, alpha, h, logical_shape)
    n, m = u.shape
    c = alpha / (h * h)
    return _call(_residual_kernel, u, (b,), n, m, _pick_block_rows(n, m),
                 logical_shape=logical_shape, c=c)


def rbgs_color_sweep(u, b, alpha, h, color: int, logical_shape=None):
    """One red or black half-sweep of Gauss-Seidel."""
    if not _is_supported(u.shape, u.dtype):
        raise ValueError(f"unsupported shape {u.shape} for pallas RB-GS")
    n, m = u.shape
    c = alpha / (h * h)
    return _call(_rbgs_color_kernel, u, (b,), n, m, _pick_block_rows(n, m),
                 logical_shape=logical_shape, c=c, color=color)


def red_black_gauss_seidel(u, b, alpha, h, sweeps: int = 1, omega: float = 1.0,
                           logical_shape=None):
    """RB-GS sweeps via two fused color kernels per sweep.

    ``omega`` is accepted for API parity with the XLA smoother but only
    ``omega == 1`` is implemented in the kernel (SOR falls back to XLA).
    """
    if omega != 1.0 or not _is_supported(u.shape, u.dtype):
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.red_black_gauss_seidel(u, b, alpha, h, sweeps=sweeps,
                                          omega=omega,
                                          logical_shape=logical_shape)

    def one_sweep(u):
        u = rbgs_color_sweep(u, b, alpha, h, 0, logical_shape)
        return rbgs_color_sweep(u, b, alpha, h, 1, logical_shape)

    if sweeps <= 8:
        for _ in range(sweeps):
            u = one_sweep(u)
        return u
    return jax.lax.fori_loop(0, sweeps, lambda _, v: one_sweep(v), u)


def jacobi(u, b, alpha, h, omega: float = 1.0, sweeps: int = 1,
           logical_shape=None):
    """Fused damped-Jacobi sweeps."""
    if not _is_supported(u.shape, u.dtype):
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.jacobi(u, b, alpha, h, omega=omega, sweeps=sweeps,
                          logical_shape=logical_shape)
    n, m = u.shape
    c = alpha / (h * h)

    def one_sweep(u):
        return _call(_jacobi_kernel, u, (b,), n, m, _pick_block_rows(n, m),
                     logical_shape=logical_shape, c=c, omega=omega)

    if sweeps <= 8:
        for _ in range(sweeps):
            u = one_sweep(u)
        return u
    return jax.lax.fori_loop(0, sweeps, lambda _, v: one_sweep(v), u)
