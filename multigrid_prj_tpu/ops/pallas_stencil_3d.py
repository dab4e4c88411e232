"""Pallas TPU kernels for the 3D 7-point Poisson stencil hot path.

BASELINE config 4 names "3D Poisson 257^3 7-point"; round 2 ran it entirely
on the XLA shifted-slice path (~100 GB/s).  These kernels stream each grid
block through VMEM once, like the 2D kernels (``ops/pallas_stencil.py``),
via a flattened-2D layout:

* ``u`` of shape ``(nz, ny, nx)`` is viewed as ``(nz * ny, nx)`` rows —
  ``nx`` rides the 128-lane axis, ``(z, y)`` ride the sublane/row axis;
* y-neighbors are row shifts by 1 (8-row clamped halo blocks + concat, the
  2D kernel's north/south machinery verbatim);
* z-neighbors are row shifts by ``ny``: because the block size ``r``
  DIVIDES ``ny``, the shifted-by-``ny`` rows are exactly the whole block at
  grid index ``i -/+ ny/r`` — two extra pipelined inputs with clamped index
  maps, no in-kernel gather (clamp garbage is consumed only at
  Dirichlet-masked z-boundary rows);
* x-neighbors are lane rotations (``pltpu.roll``), masked at boundary
  columns;
* a block never straddles a z-slab boundary (``r | ny``), so the slab index
  ``z`` is a per-block SCALAR — no vectorized integer division anywhere.

Padded layouts: callers pad ``nx`` to 128 and ``ny``/``nz`` to 8 (see
``grids.build_hierarchy(pad_align=...)``); logical extents mask the dead
zone to Dirichlet identity rows exactly as in 2D.

Reference capability: the 3D extension of ``PoissonMatrix``/smoother
sweeps (``GeometricMultigrid/include/linear_system.hpp:21-42``,
``solvers.hpp:33-48``; the reference itself is 2D-only — BASELINE config 4
sets the 3D bar).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_prj_tpu.ops import stencil as _xla

_LANE = 128


@functools.lru_cache(maxsize=512)
def _cached_kernel(fn, kv):
    return functools.partial(fn, **dict(kv))


def _kp(fn, **kw):
    """Memoized ``functools.partial`` for kernel bodies: pallas caches
    kernel traces per FUNCTION OBJECT (``weakref_lru_cache`` keyed on
    identity), so a fresh partial per call site re-traces the (up to
    ~10k-op, unrolled) kernel every time — the dominant cost of tracing a
    deep AMG/GMG cycle.  Reusing the partial for identical static params
    makes repeated instantiations cache hits."""
    return _cached_kernel(fn, tuple(sorted(kw.items())))
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_block_rows_3d(ny: int, nx: int, n_big: int) -> int | None:
    """Largest block size dividing ``ny`` that fits ``n_big`` double-buffered
    (r, nx) operands in VMEM."""
    for r in (256, 128, 64, 48, 32, 24, 16, 8):
        if ny % r:
            continue
        if 2 * (n_big * r * nx * 4 + 2 * 8 * nx * 4) <= _VMEM_BUDGET:
            return r
    return None


def _is_supported3d(shape, dtype) -> bool:
    if len(shape) != 3:
        return False
    nz, ny, nx = shape
    return (
        nx % _LANE == 0
        and ny % 8 == 0
        and _pick_block_rows_3d(ny, nx, 5) is not None
        and dtype in (jnp.float32, jnp.dtype("float32"))
    )


def _coords3d(i, r, nx, ny):
    """(z_scalar, y, x) for block ``i``: z is constant per block (r | ny)."""
    row0 = i * r
    z = row0 // ny  # scalar ops on the grid index — no vector division
    y = (row0 % ny) + jax.lax.broadcasted_iota(jnp.int32, (r, nx), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (r, nx), 1)
    return z, y, x


def _boundary3d(z, y, x, nzl, nyl, nxl):
    return ((z == 0) | (z >= nzl - 1) | (y == 0) | (y >= nyl - 1)
            | (x == 0) | (x >= nxl - 1))


def _neighbors3d(cur, un, us, uzn, uzs, nx):
    north = jnp.concatenate([un[-1:, :], cur[:-1, :]], axis=0)  # y - 1
    south = jnp.concatenate([cur[1:, :], us[:1, :]], axis=0)  # y + 1
    west = pltpu.roll(cur, 1, axis=1)
    east = pltpu.roll(cur, nx - 1, axis=1)
    return north + south + east + west + uzn[:] + uzs[:]


def _apply3d_kernel(u_ref, un_ref, us_ref, uzn_ref, uzs_ref, out_ref, *,
                    c, nx, r, ny, nzl, nyl, nxl):
    i = pl.program_id(0)
    cur = u_ref[:]
    nb_sum = _neighbors3d(cur, un_ref[:], us_ref[:], uzn_ref, uzs_ref, nx)
    z, y, x = _coords3d(i, r, nx, ny)
    stencil = c * (6.0 * cur - nb_sum)
    out_ref[:] = jnp.where(_boundary3d(z, y, x, nzl, nyl, nxl), cur, stencil)


def _residual3d_kernel(u_ref, un_ref, us_ref, uzn_ref, uzs_ref, b_ref,
                       out_ref, *, c, nx, r, ny, nzl, nyl, nxl):
    i = pl.program_id(0)
    cur = u_ref[:]
    nb_sum = _neighbors3d(cur, un_ref[:], us_ref[:], uzn_ref, uzs_ref, nx)
    z, y, x = _coords3d(i, r, nx, ny)
    stencil = c * (6.0 * cur - nb_sum)
    out_ref[:] = b_ref[:] - jnp.where(
        _boundary3d(z, y, x, nzl, nyl, nxl), cur, stencil)


def _rbgs3d_color_kernel(u_ref, un_ref, us_ref, uzn_ref, uzs_ref, b_ref,
                         out_ref, *, c, nx, r, ny, nzl, nyl, nxl, color):
    i = pl.program_id(0)
    cur = u_ref[:]
    nb_sum = _neighbors3d(cur, un_ref[:], us_ref[:], uzn_ref, uzs_ref, nx)
    z, y, x = _coords3d(i, r, nx, ny)
    gs = (b_ref[:] / c + nb_sum) * (1.0 / 6.0)
    boundary = _boundary3d(z, y, x, nzl, nyl, nxl)
    this_color = ((z + y + x) % 2) == color
    out = jnp.where(this_color & ~boundary, gs, cur)
    out_ref[:] = jnp.where(boundary, b_ref[:], out)


def _jacobi3d_kernel(u_ref, un_ref, us_ref, uzn_ref, uzs_ref, b_ref,
                     out_ref, *, c, nx, r, ny, nzl, nyl, nxl, omega):
    i = pl.program_id(0)
    cur = u_ref[:]
    nb_sum = _neighbors3d(cur, un_ref[:], us_ref[:], uzn_ref, uzs_ref, nx)
    z, y, x = _coords3d(i, r, nx, ny)
    jac = (b_ref[:] / c + nb_sum) * (1.0 / 6.0)
    if omega != 1.0:
        jac = (1.0 - omega) * cur + omega * jac
    boundary = _boundary3d(z, y, x, nzl, nyl, nxl)
    out_ref[:] = jnp.where(boundary, b_ref[:], jac)


def _specs3d(nrows: int, nx: int, r: int, ny: int):
    """center + y-halo (8-row clamped) + z-neighbor (whole-block, clamped)
    specs for the flattened (nz*ny, nx) layout."""
    nb = nrows // r
    nyb = ny // r
    center = pl.BlockSpec((r, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rb = r // 8
    north = pl.BlockSpec((8, nx), lambda i: (jnp.maximum(i * rb - 1, 0), 0),
                         memory_space=pltpu.VMEM)
    south = pl.BlockSpec(
        (8, nx), lambda i: (jnp.minimum((i + 1) * rb, nrows // 8 - 1), 0),
        memory_space=pltpu.VMEM)
    z_up = pl.BlockSpec((r, nx), lambda i: (jnp.maximum(i - nyb, 0), 0),
                        memory_space=pltpu.VMEM)
    z_dn = pl.BlockSpec((r, nx), lambda i: (jnp.minimum(i + nyb, nb - 1), 0),
                        memory_space=pltpu.VMEM)
    return center, north, south, z_up, z_dn


def _call3d(kernel, u, extra_inputs, logical_shape, **kw):
    nz, ny, nx = u.shape
    nzl, nyl, nxl = ((int(s) for s in logical_shape)
                     if logical_shape is not None else (nz, ny, nx))
    n_big = 5 + len(extra_inputs) + 1  # u + 2 z-blocks + extras + out
    r = _pick_block_rows_3d(ny, nx, n_big)
    u2 = u.reshape(nz * ny, nx)
    extras2 = tuple(e.reshape(nz * ny, nx) for e in extra_inputs)
    center, north, south, z_up, z_dn = _specs3d(nz * ny, nx, r, ny)
    in_specs = [center, north, south, z_up, z_dn] + [center] * len(extras2)
    body = _kp(kernel, nx=nx, r=r, ny=ny, nzl=int(nzl),
                             nyl=int(nyl), nxl=int(nxl), **kw)
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((nz * ny, nx), u.dtype),
        grid=(nz * ny // r,),
        in_specs=in_specs,
        out_specs=center,
        cost_estimate=pl.CostEstimate(
            flops=8 * nz * ny * nx,
            bytes_accessed=(2 + len(extras2)) * 4 * nz * ny * nx,
            transcendentals=0,
        ),
    )(u2, u2, u2, u2, u2, *extras2)
    return out.reshape(nz, ny, nx)


# ---------------------------------------------------------------------------
# Public wrappers (XLA fallback for unsupported shapes, like the 2D module)
# ---------------------------------------------------------------------------


def poisson_apply_3d(u, alpha, h, logical_shape=None):
    """Fused 7-point ``y = A u`` (identity at Dirichlet rows)."""
    if not _is_supported3d(u.shape, u.dtype):
        return _xla.poisson_apply(u, alpha, h, logical_shape)
    return _call3d(_apply3d_kernel, u, (), logical_shape, c=alpha / (h * h))


def poisson_residual_3d(u, b, alpha, h, logical_shape=None):
    """Fused ``r = b - A u``."""
    if not _is_supported3d(u.shape, u.dtype):
        return _xla.poisson_residual(u, b, alpha, h, logical_shape)
    return _call3d(_residual3d_kernel, u, (b,), logical_shape,
                   c=alpha / (h * h))


def red_black_gauss_seidel_3d(u, b, alpha, h, sweeps: int = 1,
                              omega: float = 1.0, logical_shape=None):
    """RB-GS sweeps as per-color Pallas passes (3D parity = x + y + z)."""
    if omega != 1.0 or not _is_supported3d(u.shape, u.dtype):
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.red_black_gauss_seidel(u, b, alpha, h, sweeps=sweeps,
                                          omega=omega,
                                          logical_shape=logical_shape)
    c = alpha / (h * h)
    for _ in range(sweeps):
        for color in (0, 1):
            u = _call3d(_rbgs3d_color_kernel, u, (b,), logical_shape,
                        c=c, color=color)
    return u


def jacobi_3d(u, b, alpha, h, omega: float = 1.0, sweeps: int = 1,
              logical_shape=None):
    """Damped-Jacobi sweeps as single-pass Pallas kernels."""
    if not _is_supported3d(u.shape, u.dtype):
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.jacobi(u, b, alpha, h, omega=omega, sweeps=sweeps,
                          logical_shape=logical_shape)
    c = alpha / (h * h)
    for _ in range(sweeps):
        u = _call3d(_jacobi3d_kernel, u, (b,), logical_shape, c=c,
                    omega=omega)
    return u
