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


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _pick_block_rows(n: int, m: int, n_big_operands: int = 3) -> int | None:
    """Largest row-block size that divides ``n`` and fits VMEM.

    Budget: double-buffered big operands (u, b, out) of (R, m) f32 plus two
    8-row halo blocks.  Simple one-pass kernels (apply/residual/color) fit
    this model; the temporally-FUSED kernels keep live (r+16, m) extended
    temporaries on the same scoped stack and must use
    :func:`_pick_block_rows_fused` (measured: the fused RB-GS at m = 8448,
    r = 48 allocates 21.2 MB and compile-OOMs under this model).
    """
    for r in (256, 128, 64, 48, 32, 24, 16, 8):
        if n % r:
            continue
        bytes_needed = 2 * (n_big_operands * r * m * 4 + 2 * 8 * m * 4)
        if bytes_needed <= _VMEM_BUDGET:
            return r
    return None


def _pick_block_rows_fused(n: int, m: int, n_temps: int = 5,
                           ring: int = 16,
                           budget: int | None = None) -> int | None:
    """Block rows for the temporally-fused kernels: the 3 operand blocks
    (double-buffered) plus ``n_temps`` live (r + ring, m) extended-iterate
    temporaries on the scoped-VMEM stack.

    Calibrated per kernel against measured Mosaic allocations: the fused
    RB-GS allocates ~5 live extended temporaries (21.24 MB at r=48,
    m=8448 -> compile OOM), the leaner apply-chain kernel ~2 (it FIT at
    r=48, m=8192 with ~15 MB and failed only at r=64 — callers pass
    n_temps/budget accordingly)."""
    if budget is None:
        budget = _VMEM_BUDGET
    for r in (256, 128, 64, 48, 32, 24, 16, 8):
        if n % r:
            continue
        bytes_needed = (2 * (3 * r * m * 4 + 2 * 8 * m * 4)
                        + n_temps * (r + ring) * m * 4)
        if bytes_needed <= budget:
            return r
    return None


def _pick_blocks_fused_2d(n: int, m: int, n_temps: int = 5, ring: int = 16,
                          budget: int | None = None,
                          n_in: int = 2) -> tuple[int, int] | None:
    """(row-block, col-block) for COLUMN-TILED fused kernels on wide grids.

    The 1D fused kernels hold full-width (r + ring, m) temporaries in VMEM,
    which stops fitting around m ~ 16k (the 16385^2 padded width 16640 —
    the at-scale cliff VERDICT r4 weak #1 measured).  Column tiling makes
    the extended block (r + ring, mc + 256): 8-row halos vertically plus
    128-lane halos horizontally (the lane-block minimum), assembled from 9
    block refs per operand.  The temporal-blocking ring argument holds per
    axis — corruption travels one row AND one column per color pass, so 8
    valid halo rows / 128 halo columns keep the core rows bit-identical to
    separate launches for up to 4 fused sweeps.

    Returns the candidate maximizing the core fraction
    ``(r * mc) / ((r + ring) * (mc + 256))`` under the VMEM budget (the
    fused sweeps are VPU-bound, so redundant halo compute is the cost that
    matters), or None if nothing fits.
    """
    if budget is None:
        budget = _VMEM_BUDGET
    best = None
    best_eff = 0.0
    mcs = [k * _LANE for k in range(1, m // _LANE + 1)
           if m % (k * _LANE) == 0 and k * _LANE <= 8192]
    for mc in mcs:
        for r in (256, 128, 64, 48, 32, 24, 16, 8):
            if n % r:
                continue
            ext_r, ext_c = r + ring, mc + 2 * _LANE
            in_words = n_in * (r * mc + 2 * 8 * mc + 2 * r * _LANE
                               + 4 * 8 * _LANE)
            out_words = r * mc
            bytes_needed = (2 * (in_words + out_words) * 4
                            + n_temps * ext_r * ext_c * 4)
            if bytes_needed > budget:
                continue
            eff = (r * mc) / (ext_r * ext_c)
            if eff > best_eff:
                best_eff, best = eff, (r, mc)
    return best


def _fused_1d_or_2d(n: int, m: int, n_temps: int = 5, ring: int = 16,
                    budget: int | None = None, n_in: int = 2,
                    n_temps_2d: int | None = None):
    """Pick the better of full-width (1D) and column-tiled (2D) fused
    blocking by core fraction.  Returns ``(r, None)`` for 1D, ``(r, mc)``
    for 2D, or None.

    ``n_temps_2d``: the 2D kernels' 9-block extended assembly keeps more
    live temporaries than the 1D concat (measured: the apply chain at
    8192^2 allocated 18.2 MB against the 1D-calibrated 2-temp model) —
    callers with a 1D-calibrated ``n_temps`` pass a larger 2D value."""
    r1 = _pick_block_rows_fused(n, m, n_temps=n_temps, ring=ring,
                                budget=budget)
    cand2 = _pick_blocks_fused_2d(n, m,
                                  n_temps=(n_temps if n_temps_2d is None
                                           else n_temps_2d),
                                  ring=max(ring, 1),
                                  budget=budget, n_in=n_in)
    eff1 = (r1 / (r1 + ring)) if (r1 is not None and ring) else \
        (1.0 if r1 is not None else 0.0)
    eff2 = 0.0
    if cand2 is not None:
        r2, mc2 = cand2
        eff2 = (r2 * mc2) / ((r2 + max(ring, 1)) * (mc2 + 2 * _LANE))
    if r1 is None and cand2 is None:
        return None
    if cand2 is not None and eff2 > eff1:
        return cand2
    return (r1, None)


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


def _edge_specs_2d(n: int, m: int, r: int, mc: int):
    """Block specs for the column-tiled extended block: center, N/S 8-row
    halos, E/W 128-lane halos, and the 4 corners (8 x 128).  Index maps
    clamp at the grid edges, aliasing in garbage that only reaches
    Dirichlet-pinned cells (same invariant as :func:`_edge_specs`)."""
    rb, cb = r // 8, mc // _LANE
    nbr, nbc = n // 8 - 1, m // _LANE - 1  # max 8-row / 128-lane block index

    def bs(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    lo = jnp.maximum
    hi = jnp.minimum
    return [
        bs((r, mc), lambda i, j: (i, j)),                                   # C
        bs((8, mc), lambda i, j: (lo(i * rb - 1, 0), j)),                   # N
        bs((8, mc), lambda i, j: (hi((i + 1) * rb, nbr), j)),               # S
        bs((r, _LANE), lambda i, j: (i, lo(j * cb - 1, 0))),                # W
        bs((r, _LANE), lambda i, j: (i, hi((j + 1) * cb, nbc))),            # E
        bs((8, _LANE), lambda i, j: (lo(i * rb - 1, 0), lo(j * cb - 1, 0))),
        bs((8, _LANE), lambda i, j: (lo(i * rb - 1, 0), hi((j + 1) * cb, nbc))),
        bs((8, _LANE), lambda i, j: (hi((i + 1) * rb, nbr), lo(j * cb - 1, 0))),
        bs((8, _LANE), lambda i, j: (hi((i + 1) * rb, nbr), hi((j + 1) * cb, nbc))),
    ]


def _assemble_ext(c_, n_, s_, w_, e_, nw_, ne_, sw_, se_):
    """(r + 16, mc + 256) extended block from the 9 halo refs."""
    top = jnp.concatenate([nw_, n_, ne_], axis=1)
    mid = jnp.concatenate([w_, c_, e_], axis=1)
    bot = jnp.concatenate([sw_, s_, se_], axis=1)
    return jnp.concatenate([top, mid, bot], axis=0)


def _ext_coords(r: int, mc: int, ring_r: int = 8):
    """Global (row, col) index arrays for the extended block at grid cell
    (program_id(0), program_id(1))."""
    i, j = pl.program_id(0), pl.program_id(1)
    ext_r, ext_c = r + 2 * ring_r, mc + 2 * _LANE
    row = (i * r - ring_r
           + jax.lax.broadcasted_iota(jnp.int32, (ext_r, ext_c), 0))
    col = (j * mc - _LANE
           + jax.lax.broadcasted_iota(jnp.int32, (ext_r, ext_c), 1))
    return row, col


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


def _apply_carry_kernel(u_ref, out_ref, prev_ref, tail_ref, *, c, m, r, nl,
                        ml, nb):
    """Streaming apply that reads ``u`` exactly once (8 B/point total).

    Output is delayed one grid step: at step ``i`` the kernel emits block
    ``i-1`` from VMEM scratch (``prev``), using the carried last rows of
    block ``i-2`` (``tail``) as the north halo and the first row of the
    just-arrived block ``i`` as the south halo.  Requires a sequential grid
    (``dimension_semantics=("arbitrary",)``).
    """
    i = pl.program_id(0)

    @pl.when(i > 0)
    def _():
        prev = prev_ref[:]
        north = jnp.concatenate([tail_ref[-1:, :], prev[:-1, :]], axis=0)
        south = jnp.concatenate([prev[1:, :], u_ref[:1, :]], axis=0)
        west = pltpu.roll(prev, 1, axis=1)
        east = pltpu.roll(prev, m - 1, axis=1)
        stencil = c * (4.0 * prev - north - south - east - west)
        out_ref[:] = jnp.where(_masks(i - 1, r, m, nl, ml), prev, stencil)

    tail_ref[:] = prev_ref[-8:, :]
    prev_ref[:] = u_ref[:]


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


_HALO = 8  # halo block rows (f32 sublane minimum)
_MAX_FUSED_SWEEPS = 4  # dependency ring grows 2 rows/sweep; 2*4 <= _HALO


def _fused_rbgs_passes(x, bx, row, col, c, nl, ml, sweeps, m):
    """The shared fused RB-GS update: ``sweeps`` full sweeps on the extended
    block ``x`` with global (row, col) index arrays.  Each color pass
    reproduces one :func:`_rbgs_color_kernel` launch bit-exactly: update
    this color's interior points, then pin boundary rows to b."""
    # col <= 0 (not == 0): the column-tiled extended blocks carry NEGATIVE
    # col indices in the west halo; pinning them is harmless in 1D (col is
    # never negative there) and keeps halo garbage from evolving in 2D
    boundary = (row <= 0) | (row >= nl - 1) | (col <= 0) | (col >= ml - 1)
    parity = (row + col) % 2
    b_over_c = bx * (1.0 / c)
    for _ in range(sweeps):
        for color in (0, 1):
            north = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
            south = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
            west = pltpu.roll(x, 1, axis=1)
            east = pltpu.roll(x, m - 1, axis=1)
            gs = (b_over_c + north + south + east + west) * 0.25
            x = jnp.where(boundary, bx,
                          jnp.where(parity == color, gs, x))
    return x


def _fused_jacobi_passes(x, bx, row, col, c, nl, ml, sweeps, m, omega):
    """``sweeps`` damped-Jacobi sweeps on the extended block (the shared
    body of the 1D and column-tiled fused Jacobi kernels)."""
    boundary = (row <= 0) | (row >= nl - 1) | (col <= 0) | (col >= ml - 1)
    b_over_c = bx * (1.0 / c)
    for _ in range(sweeps):
        north = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
        south = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
        west = pltpu.roll(x, 1, axis=1)
        east = pltpu.roll(x, m - 1, axis=1)
        jac = (b_over_c + north + south + east + west) * 0.25
        if omega != 1.0:
            jac = (1.0 - omega) * x + omega * jac
        x = jnp.where(boundary, bx, jac)
    return x


def _fused_apply_passes(x, row, col, c, nl, ml, applies, m):
    """``A^applies`` on the extended block (shared 1D/2D body)."""
    boundary = (row <= 0) | (row >= nl - 1) | (col <= 0) | (col >= ml - 1)
    for _ in range(applies):
        north = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
        south = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
        west = pltpu.roll(x, 1, axis=1)
        east = pltpu.roll(x, m - 1, axis=1)
        stencil = c * (4.0 * x - north - south - east - west)
        x = jnp.where(boundary, x, stencil)
    return x


def _rbgs_fused2d_kernel(*refs, c, r, mc, nl, ml, sweeps):
    """Column-tiled fused RB-GS: refs = 9 u blocks + 9 b blocks + out."""
    u_refs, b_refs, out_ref = refs[:9], refs[9:18], refs[18]
    x = _assemble_ext(*(rf[:] for rf in u_refs))
    bx = _assemble_ext(*(rf[:] for rf in b_refs))
    row, col = _ext_coords(r, mc)
    x = _fused_rbgs_passes(x, bx, row, col, c, nl, ml, sweeps, mc + 2 * _LANE)
    out_ref[:] = x[_HALO:_HALO + r, _LANE:_LANE + mc]


def _jacobi_fused2d_kernel(*refs, c, r, mc, nl, ml, omega, sweeps):
    u_refs, b_refs, out_ref = refs[:9], refs[9:18], refs[18]
    x = _assemble_ext(*(rf[:] for rf in u_refs))
    bx = _assemble_ext(*(rf[:] for rf in b_refs))
    row, col = _ext_coords(r, mc)
    x = _fused_jacobi_passes(x, bx, row, col, c, nl, ml, sweeps,
                             mc + 2 * _LANE, omega)
    out_ref[:] = x[_HALO:_HALO + r, _LANE:_LANE + mc]


def _apply_fused2d_kernel(*refs, c, r, mc, nl, ml, applies):
    u_refs, out_ref = refs[:9], refs[9]
    x = _assemble_ext(*(rf[:] for rf in u_refs))
    row, col = _ext_coords(r, mc)
    x = _fused_apply_passes(x, row, col, c, nl, ml, applies, mc + 2 * _LANE)
    out_ref[:] = x[_HALO:_HALO + r, _LANE:_LANE + mc]


def _call_fused2d(kernel, operands, n, m, r, mc, dst=None, **kw):
    """Invoke a column-tiled fused kernel: each operand is passed through
    the 9 halo block specs of :func:`_edge_specs_2d`; optional ping-pong
    ``dst`` (same never-read-aliased-input trick as :func:`_call`)."""
    specs9 = _edge_specs_2d(n, m, r, mc)
    in_specs = specs9 * len(operands)
    inputs = tuple(op for op in operands for _ in range(9))
    out_spec = pl.BlockSpec((r, mc), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    body = _kp(kernel, r=r, mc=mc, **kw)
    alias = {}
    if dst is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        alias = {len(inputs): 0}
        inputs = inputs + (dst,)
        inner = body

        def body(*refs):  # drop the never-read dst ref
            return inner(*refs[:-2], refs[-1])

    sweeps = kw.get("sweeps", kw.get("applies", 1))
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, m), operands[0].dtype),
        grid=(n // r, m // mc),
        in_specs=in_specs,
        out_specs=out_spec,
        input_output_aliases=alias,
        cost_estimate=pl.CostEstimate(
            flops=2 * sweeps * 6 * n * m,
            bytes_accessed=(len(operands) + 1) * 4 * n * m,
            transcendentals=0,
        ),
    )(*inputs)


def _rbgs_fused_kernel(u_ref, un_ref, us_ref, b_ref, bn_ref, bs_ref, out_ref,
                       *, c, m, r, nl, ml, sweeps):
    """``sweeps`` full red-black sweeps in ONE memory pass (temporal blocking).

    The 8-row halo blocks provide the dependency ring: each color half-sweep
    corrupts one more ring row from the (unavailable) far neighbors, so up to
    4 fused sweeps leave the core rows bit-identical to 4 separate kernel
    launches while touching HBM once.  Cuts smoother traffic from
    24 B/point/sweep to 16 B/point per fused group.
    """
    i = pl.program_id(0)
    ext = r + 2 * _HALO
    x = jnp.concatenate([un_ref[:], u_ref[:], us_ref[:]], axis=0)
    bx = jnp.concatenate([bn_ref[:], b_ref[:], bs_ref[:]], axis=0)
    row = i * r - _HALO + jax.lax.broadcasted_iota(jnp.int32, (ext, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, m), 1)
    x = _fused_rbgs_passes(x, bx, row, col, c, nl, ml, sweeps, m)
    out_ref[:] = x[_HALO:_HALO + r, :]


def _rbgs_fused_offset_kernel(row0_ref, u_ref, un_ref, us_ref, b_ref, bn_ref,
                              bs_ref, out_ref, *, c, m, r, nl, ml, sweeps):
    """Fused RB-GS on a shard-local EXTENDED block: identical to
    :func:`_rbgs_fused_kernel` except the global row index is offset by the
    scalar-prefetched ``row0`` (the global row of array row 0) — boundary
    pinning and red/black parity must be computed in GLOBAL coordinates on
    a block-row-sharded grid (parallel/sharded_gmg.py)."""
    i = pl.program_id(0)
    ext = r + 2 * _HALO
    x = jnp.concatenate([un_ref[:], u_ref[:], us_ref[:]], axis=0)
    bx = jnp.concatenate([bn_ref[:], b_ref[:], bs_ref[:]], axis=0)
    row = row0_ref[0] + i * r - _HALO + jax.lax.broadcasted_iota(
        jnp.int32, (ext, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, m), 1)
    x = _fused_rbgs_passes(x, bx, row, col, c, nl, ml, sweeps, m)
    out_ref[:] = x[_HALO:_HALO + r, :]


_MAX_DOWNLEG_SWEEPS = 3  # ring: 2 rows/sweep + 1 (residual) + 1 (filter) <= 8


def _rbgs_resfilter_kernel(u_ref, un_ref, us_ref, b_ref, bn_ref, bs_ref,
                           u_out_ref, f_out_ref, *, c, m, r, nl, ml, sweeps):
    """V-cycle DOWN-LEG in one memory pass: ``sweeps`` fused RB-GS sweeps,
    the residual of the result, and the tensor-product full-weighting FILTER
    ([1/4,1/2,1/4] per axis) — everything the cycle does at a level before
    the coarse-grid sample.  The caller decimates the filtered output
    (every other row/column) and masks the coarse edge/dead entries, which
    are exactly 0 because the smoother pins boundary rows to b inside this
    very kernel (r = b - u = 0 there).

    Ring accounting on the 8-row halos: each color pass corrupts 2 rows,
    the residual 1, the filter 1 -> ``2*sweeps + 2 <= 8``; core rows are
    bit-identical to the separate smoother/residual/restrict launches.
    Replaces 3 kernel launches + a full HBM round-trip of the residual per
    level per cycle.
    """
    i = pl.program_id(0)
    ext = r + 2 * _HALO
    x = jnp.concatenate([un_ref[:], u_ref[:], us_ref[:]], axis=0)
    bx = jnp.concatenate([bn_ref[:], b_ref[:], bs_ref[:]], axis=0)
    row = i * r - _HALO + jax.lax.broadcasted_iota(jnp.int32, (ext, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, m), 1)
    x = _fused_rbgs_passes(x, bx, row, col, c, nl, ml, sweeps, m)
    u_out_ref[:] = x[_HALO:_HALO + r, :]
    # residual of the smoothed iterate (identical expression to
    # _residual_kernel, extended-block row indexing)
    boundary = (row <= 0) | (row >= nl - 1) | (col == 0) | (col >= ml - 1)
    north = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
    south = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
    west = pltpu.roll(x, 1, axis=1)
    east = pltpu.roll(x, m - 1, axis=1)
    stencil = c * (4.0 * x - north - south - east - west)
    res = bx - jnp.where(boundary, x, stencil)
    # full-weighting filter, rows then columns (restrict_fw_padded order);
    # out-of-array neighbors decimate only into masked coarse entries
    rn = jnp.concatenate([res[:1, :], res[:-1, :]], axis=0)
    rs = jnp.concatenate([res[1:, :], res[-1:, :]], axis=0)
    f1 = 0.25 * rn + 0.5 * res + 0.25 * rs
    fw_ = pltpu.roll(f1, 1, axis=1)
    fe = pltpu.roll(f1, m - 1, axis=1)
    f2 = 0.25 * fw_ + 0.5 * f1 + 0.25 * fe
    f_out_ref[:] = f2[_HALO:_HALO + r, :]


def _fw_filter2d_kernel(*refs, r, mc):
    """Tensor-product full-weighting FILTER ([1/4,1/2,1/4] per axis) in one
    pass over the column-tiled extended block; the caller decimates and
    fixes the injected edge rows/cols (see :func:`restrict_fw_padded_fast`).
    Halo garbage (clamped edge blocks) has 1-cell reach — masked by the
    caller's edge fix-up."""
    x = _assemble_ext(*(rf[:] for rf in refs[:9]))
    out_ref = refs[9]
    ext_c = mc + 2 * _LANE
    north = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
    south = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
    f1 = 0.25 * north + 0.5 * x + 0.25 * south
    west = pltpu.roll(f1, 1, axis=1)
    east = pltpu.roll(f1, ext_c - 1, axis=1)
    f2 = 0.25 * west + 0.5 * f1 + 0.25 * east
    out_ref[:] = f2[_HALO:_HALO + r, _LANE:_LANE + mc]


def _fw_axis_thin(a, axis, nc):
    """restrict_fw_padded's per-axis rule on a THIN slice (edge fix-ups)."""
    from multigrid_prj_tpu.ops.transfer import _shift_axis

    filtered = (0.25 * _shift_axis(a, axis, -1) + 0.5 * a
                + 0.25 * _shift_axis(a, axis, +1))
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(None, None, 2)
    samp_f, samp_i = filtered[tuple(sl)], a[tuple(sl)]
    k = jax.lax.broadcasted_iota(jnp.int32, samp_f.shape, axis)
    out = jnp.where((k == 0) | (k == nc - 1), samp_i, samp_f)
    return jnp.where(k >= nc, 0.0, out)


def restrict_fw_padded_fast(r_arr: jax.Array, logical_shape) -> jax.Array:
    """``transfer.restrict_fw_padded`` with the O(n^2) filter as ONE Pallas
    pass (the XLA shift/pad/stride lowering measured 10.2 ms at 8448^2 on
    v5e where the streamed bound is ~1.5 ms — the largest single term of
    the at-scale V-cycle after the kernel fixes).  Exact: the filtered
    interior comes from the kernel; the injected edge rows/cols (and the
    row-injected-then-col-filtered corners) are recomputed from thin raw
    slices with the reference per-axis rule."""
    from multigrid_prj_tpu.ops.transfer import restrict_fw_padded

    if not _is_supported(r_arr.shape, r_arr.dtype):  # 3D / unaligned: XLA
        return restrict_fw_padded(r_arr, logical_shape)
    n, m = r_arr.shape
    pick = _pick_blocks_fused_2d(n, m, n_temps=3, ring=16, n_in=1)
    if pick is None:
        return restrict_fw_padded(r_arr, logical_shape)
    r_blk, mc = pick
    specs9 = _edge_specs_2d(n, m, r_blk, mc)
    F = pl.pallas_call(
        _kp(_fw_filter2d_kernel, r=r_blk, mc=mc),
        out_shape=jax.ShapeDtypeStruct((n, m), r_arr.dtype),
        grid=(n // r_blk, m // mc),
        in_specs=specs9,
        out_specs=pl.BlockSpec((r_blk, mc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * m, bytes_accessed=2 * 4 * n * m,
            transcendentals=0,
        ),
    )(*([r_arr] * 9))
    nl, ml = int(logical_shape[0]), int(logical_shape[1])
    nc_r, nc_c = (nl + 1) // 2, (ml + 1) // 2
    out = F[::2][:, ::2]
    kr = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    kc = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    # dead zone zeros
    out = jnp.where((kr >= nc_r) | (kc >= nc_c), 0.0, out)
    # edge rows: axis-0 injection of the raw slice, then the axis-1 rule
    top = _fw_axis_thin(r_arr[0:1, :], 1, nc_c)
    bot = _fw_axis_thin(r_arr[2 * nc_r - 2:2 * nc_r - 1, :], 1, nc_c)
    out = jnp.where(kr == 0, top, out)
    out = jnp.where(kr == nc_r - 1, bot, out)
    # edge cols: axis-0 rule on the raw thin col, axis-1 injection
    lft = _fw_axis_thin(r_arr[:, 0:1], 0, nc_r)
    rgt = _fw_axis_thin(r_arr[:, 2 * nc_c - 2:2 * nc_c - 1], 0, nc_r)
    inner_row = (kr > 0) & (kr < nc_r - 1)
    out = jnp.where((kc == 0) & inner_row,
                    jnp.broadcast_to(lft, out.shape), out)
    out = jnp.where((kc == nc_c - 1) & inner_row,
                    jnp.broadcast_to(rgt, out.shape), out)
    # corners: raw injection both axes
    for kr0, rr0 in ((0, 0), (nc_r - 1, 2 * nc_r - 2)):
        for kc0, cc0 in ((0, 0), (nc_c - 1, 2 * nc_c - 2)):
            out = jnp.where((kr == kr0) & (kc == kc0),
                            r_arr[rr0, cc0], out)
    return jnp.where((kr >= nc_r) | (kc >= nc_c), 0.0, out)


def _prolong_add_kernel(e_ref, es_ref, u_ref, out_ref, *, r, m, pc_r, pc_c):
    """``u + prolong(e)`` for one full-width fine row block in one pass:
    bilinear upsampling of the coarse block with a +1-row lookahead from
    the 8-row south halo; halo rows beyond the coarse array (and the
    beyond-array column lookahead) are zeroed, matching
    ``transfer.prolong_padded``'s zero shift-in."""
    i = pl.program_id(0)
    rc = r // 2
    ex = jnp.concatenate([e_ref[:], es_ref[:]], axis=0)  # (rc + 8, pc_c)
    grow = i * rc + jax.lax.broadcasted_iota(jnp.int32, (rc + 8, pc_c), 0)
    ex = jnp.where(grow < pc_r, ex, 0.0)
    # rows: interleave [e_a, (e_a + e_{a+1})/2] (sublane stack+reshape)
    cur = ex[:rc]
    nxt = ex[1:rc + 1]
    mid = 0.5 * (cur + nxt)
    inter_r = jnp.stack([cur, mid], axis=1).reshape(r, pc_c)
    # cols: lane upsample out[:, 2q] = s[q], out[:, 2q+1] = avg(s[q], s[q+1])
    # via per-output-tile same-shape take_along_axis + tile select — the
    # only dynamic lane gather Mosaic lowers (the stack+reshape lane
    # interleave fails layout inference: "unsupported shape cast").
    # Zero-pad one lane tile so the q+1 lookahead of the last coarse column
    # reads 0 (prolong_padded's zero shift-in) and slices stay in bounds.
    inter_r = jnp.concatenate(
        [inter_r, jnp.zeros((r, _LANE), inter_r.dtype)], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, _LANE), 1)
    tiles = []
    for t in range(m // _LANE):
        base = (t * _LANE) >> 1        # first src col this tile reads (64t)
        tile0 = (base >> 7) * _LANE    # static src tile start
        src2 = inter_r[:, tile0:tile0 + 2 * _LANE]  # spans q and q+1 range

        def at(q_local):
            hi = jax.lax.shift_right_logical(q_local, jnp.int32(7))
            lo = jax.lax.bitwise_and(q_local, jnp.int32(127))
            a = jnp.take_along_axis(src2[:, :_LANE], lo, axis=1)
            bb = jnp.take_along_axis(src2[:, _LANE:], lo, axis=1)
            return jnp.where(hi == 0, a, bb)

        q = ((t * _LANE + col) >> 1) - tile0
        even = at(q)
        odd = 0.5 * (even + at(q + 1))
        tiles.append(jnp.where((col & 1) == 0, even, odd))
    inter_c = jnp.concatenate(tiles, axis=1)
    out_ref[:] = u_ref[:] + inter_c


def prolong_add_padded_fast(e: jax.Array, u: jax.Array) -> jax.Array:
    """``u + transfer.prolong_padded(e)`` in one Pallas pass (the XLA
    stack/reshape interleave measured 6.5 ms at 8448^2 on v5e vs a ~1.3 ms
    streamed bound).  Row-tiled with full-width blocks: the coarse operand
    is quarter-size, so even the 16640-wide level fits VMEM with no column
    tiling (and no redundant halo compute).  Falls back to the XLA
    composition when the shapes do not admit the scheme."""
    from multigrid_prj_tpu.ops.transfer import prolong_padded

    if not _is_supported(u.shape, u.dtype):  # 3D / unaligned: XLA
        return u + prolong_padded(e)
    n, m = u.shape
    if e.shape[0] * 2 != n or e.shape[1] * 2 != m:
        return u + prolong_padded(e)
    pc_r, pc_c = e.shape
    # VMEM model: double-buffered u in/out (r, m) + e (r/2 + 8, m/2) blocks
    # plus ~3 live (r, m)-ish temporaries (inter_r, gather temps, inter_c)
    r_blk = None
    for r_c in (128, 64, 32, 16):
        if n % r_c or (r_c // 2) % 8:
            continue
        words = (2 * (2 * r_c * m + (r_c // 2 + 8) * pc_c)
                 + 3 * r_c * (m + _LANE))
        if words * 4 <= _VMEM_BUDGET:
            r_blk = r_c
            break
    if r_blk is None or pc_c % _LANE:
        return u + prolong_padded(e)
    rc = r_blk // 2
    rcb = rc // 8
    nbr = pc_r // 8 - 1

    def bs(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kp(_prolong_add_kernel, r=r_blk, m=m, pc_r=pc_r, pc_c=pc_c),
        out_shape=jax.ShapeDtypeStruct((n, m), u.dtype),
        grid=(n // r_blk,),
        in_specs=[
            bs((rc, pc_c), lambda i: (i, 0)),
            bs((8, pc_c), lambda i: (jnp.minimum((i + 1) * rcb, nbr), 0)),
            bs((r_blk, m), lambda i: (i, 0)),
        ],
        out_specs=bs((r_blk, m), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * m,
            bytes_accessed=4 * (n * m * 2 + pc_r * pc_c),
            transcendentals=0,
        ),
    )(e, e, u)


def fw_decimate_padded(F, logical_shape):
    """Sample the filtered fine array at even indices and zero the coarse
    edge/dead entries (valid when the fine residual is 0 on the logical
    boundary — true post-smoothing; see ``_rbgs_resfilter_kernel``).

    Decimates one axis at a time (the lowering ``transfer.restrict_fw_padded``
    uses); a single fused ``F[::2, ::2]`` measured ~4 ms on 1280^2 v5e where
    the per-axis form is ~0.1 ms."""
    nl, ml = int(logical_shape[0]), int(logical_shape[1])
    nc_r, nc_c = (nl + 1) // 2, (ml + 1) // 2
    s = F[::2][:, ::2]
    kr = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    kc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    dead = (kr == 0) | (kr >= nc_r - 1) | (kc == 0) | (kc >= nc_c - 1)
    return jnp.where(dead, 0.0, s)


def rbgs_residual_restrict(u, b, alpha, h, sweeps, logical_shape):
    """Fused down-leg: ``sweeps`` RB-GS sweeps + residual + full-weighting
    restriction of the PADDED layout, in one kernel pass plus a cheap
    decimation.  Returns ``(u_smoothed, r_coarse)`` with
    ``r_coarse.shape = (n//2, m//2)``.

    Equals (f32-exactly) the composition ``red_black_gauss_seidel`` ->
    ``poisson_residual`` -> ``transfer.restrict_fw_padded``; requires
    ``sweeps <= 3`` and an aligned 2D f32 layout with a logical shape
    (falls back to the composition otherwise).
    """
    if logical_shape is None:
        raise ValueError("rbgs_residual_restrict needs a logical_shape")
    n, m = u.shape
    # _is_supported budgets 3 big operands; this kernel streams 5, so
    # _pick_block_rows(n, m, 5) can come back None on wide grids that
    # _is_supported admits — fall back to the composition then too
    r_blk = (_pick_block_rows(n, m, 5)
             if _is_supported(u.shape, u.dtype) else None)
    if sweeps > _MAX_DOWNLEG_SWEEPS or r_blk is None:
        from multigrid_prj_tpu.ops.transfer import restrict_fw_padded

        u2 = red_black_gauss_seidel(u, b, alpha, h, sweeps=sweeps,
                                    logical_shape=logical_shape)
        r = poisson_residual(u2, b, alpha, h, logical_shape)
        return u2, restrict_fw_padded(r, logical_shape)
    c = alpha / (h * h)
    nl, ml = int(logical_shape[0]), int(logical_shape[1])
    center, north, south = _edge_specs(n, m, r_blk)
    u2, F = pl.pallas_call(
        _kp(_rbgs_resfilter_kernel, c=c, m=m, r=r_blk, nl=nl,
                          ml=ml, sweeps=sweeps),
        out_shape=(jax.ShapeDtypeStruct((n, m), u.dtype),
                   jax.ShapeDtypeStruct((n, m), u.dtype)),
        grid=(n // r_blk,),
        in_specs=[center, north, south, center, north, south],
        out_specs=(center, center),
        cost_estimate=pl.CostEstimate(
            flops=(2 * sweeps + 2) * 6 * n * m,
            bytes_accessed=4 * 4 * n * m, transcendentals=0,
        ),
    )(u, u, u, b, b, b)
    return u2, fw_decimate_padded(F, logical_shape)


def _ff_residual_kernel(uh_ref, uhn_ref, uhs_ref, ul_ref, uln_ref, uls_ref,
                        dh_ref, dl_ref, b_ref, out_ref, *, c, m, r, nl, ml):
    """Extended-precision residual in ONE memory pass.

    Mirrors ``ops/extended.ff_poisson_residual`` op-for-op (same two-sum /
    fast-two-sum chains in the same order, so results are bit-identical to
    the XLA lowering) but reads the five operands (u pair, d pair, b)
    through VMEM once instead of XLA's ~20 unfused slice passes — measured
    0.98 ms -> ~0.1 ms per evaluation on 1280^2 v5e.  The refinement loop
    (gmg.GMGSolver.solve_refined) evaluates this once per cycle, so it is
    the second-hottest op of BASELINE's V-cycle wall-time metric.
    """
    i = pl.program_id(0)

    def two_sum(a, b):
        s = a + b
        bb = s - a
        return s, (a - (s - bb)) + (b - bb)

    def ff_add(xh, xl, yh, yl):
        s, e = two_sum(xh, yh)
        e = e + (xl + yl)
        # fast_two_sum normalization
        s2 = s + e
        return s2, e - (s2 - s)

    uh, ul = uh_ref[:], ul_ref[:]
    nh, sh, eh, wh = _neighbor_tiles(uh, uhn_ref[:], uhs_ref[:])
    nl_t, sl_t, el_t, wl_t = _neighbor_tiles(ul, uln_ref[:], uls_ref[:])
    acc_hi, acc_lo = 4.0 * uh, 4.0 * ul
    # ops/extended iterates axes (rows +1/-1, cols +1/-1); +1 is the shifted
    # -forward slice = SOUTH/EAST there, so match that order exactly
    for nb_hi, nb_lo in ((sh, sl_t), (nh, nl_t), (eh, el_t), (wh, wl_t)):
        acc_hi, acc_lo = ff_add(acc_hi, acc_lo, -nb_hi, -nb_lo)
    t_hi, t_lo = ff_add(dh_ref[:], dl_ref[:], -acc_hi, -acc_lo)
    r_interior = c * t_hi + c * t_lo
    r_boundary = (b_ref[:] - uh) - ul
    out_ref[:] = jnp.where(_masks(i, r, m, nl, ml), r_boundary, r_interior)


def ff_poisson_residual(u_hi, u_lo, d_hi, d_lo, b, alpha: float, h: float,
                        logical_shape=None):
    """Fused extended-precision ``r = b - A u`` (pair-carried ``u``).

    Bit-identical to ``ops/extended.ff_poisson_residual``; falls back to it
    for unsupported shapes.
    """
    from multigrid_prj_tpu.ops import extended as _ext

    if not _is_supported(u_hi.shape, u_hi.dtype):
        return _ext.ff_poisson_residual(u_hi, u_lo, d_hi, d_lo, b, alpha, h,
                                        logical_shape)
    n, m = u_hi.shape
    c = alpha / (h * h)
    # 6 operand blocks + ~10 live two-sum temporaries (measured 17.98 MB
    # at r=24, m=8448 under an operand-only model -> compile OOM)
    r = _pick_block_rows_fused(n, m, n_temps=12, ring=0)
    if r is None:
        return _ext.ff_poisson_residual(u_hi, u_lo, d_hi, d_lo, b, alpha, h,
                                        logical_shape)
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)
    center, north, south = _edge_specs(n, m, r)
    return pl.pallas_call(
        _kp(_ff_residual_kernel, c=c, m=m, r=r, nl=nl, ml=ml),
        out_shape=jax.ShapeDtypeStruct((n, m), u_hi.dtype),
        grid=(n // r,),
        in_specs=[center, north, south, center, north, south,
                  center, center, center],
        out_specs=center,
        cost_estimate=pl.CostEstimate(
            flops=60 * n * m, bytes_accessed=6 * 4 * n * m, transcendentals=0
        ),
    )(u_hi, u_hi, u_hi, u_lo, u_lo, u_lo, d_hi, d_lo, b)


_MAX_FUSED_APPLIES = 8  # A^s u: dependency ring grows 1 row/apply


def _apply_fused_kernel(u_ref, un_ref, us_ref, out_ref, *, c, m, r, nl, ml,
                        applies):
    """``y = A^applies u`` in ONE memory pass (temporal blocking).

    Chained operator applies (power iterations, smoother-free Richardson
    chains, throughput benchmarks) are dependent sweeps just like the fused
    smoothers: each apply corrupts one more ring row from the unavailable
    far neighbors, so up to 8 applies per 8-row halo block leave the core
    rows bit-identical to 8 separate kernel launches while reading ``u``
    from HBM once.  Boundary (Dirichlet identity) rows are replayed each
    apply, exactly as separate launches would.
    """
    i = pl.program_id(0)
    ext = r + 2 * _HALO
    x = jnp.concatenate([un_ref[:], u_ref[:], us_ref[:]], axis=0)
    row = i * r - _HALO + jax.lax.broadcasted_iota(jnp.int32, (ext, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, m), 1)
    x = _fused_apply_passes(x, row, col, c, nl, ml, applies, m)
    out_ref[:] = x[_HALO:_HALO + r, :]


def poisson_apply_chain(u: jax.Array, alpha: float, h: float, applies: int,
                        logical_shape=None, dst=None) -> jax.Array:
    """``A^applies u`` via temporally-fused kernels (up to 8 applies per HBM
    pass), ping-ponging two buffers between fused groups.  Bit-identical to
    ``applies`` separate :func:`poisson_apply` calls on the core rows.

    ``dst``: optional output buffer for a single fused group
    (``applies <= 8``) so callers can run their own ping-pong chains with
    zero loop-carry copies (see ``_call``)."""
    if not _is_supported(u.shape, u.dtype):
        x = u
        for _ in range(applies):
            # 3D inputs chain the single-pass 3D kernel (no temporal fusion
            # yet); other unsupported shapes chain the XLA apply
            x = poisson_apply(x, alpha, h, logical_shape)
        return x
    n, m = u.shape
    c = alpha / (h * h)
    # chain-kernel budget: ~2 live extended temps; 15 MB admits the
    # measured-fastest r=48 at m=8192 (r=64 measured 0.5 MB over the
    # 16 MB scoped limit and is correctly rejected)
    pick = _fused_1d_or_2d(n, m, n_temps=2, budget=15 * 1024 * 1024, n_in=1,
                           n_temps_2d=5)
    if pick is None:  # no fused tiling: chain single-pass applies instead
        x = u
        for _ in range(applies):
            x = poisson_apply(x, alpha, h, logical_shape)
        return x
    r, mc = pick
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)

    if mc is not None:
        def group(x, y, s):
            return _call_fused2d(_apply_fused2d_kernel, (x,), n, m, r, mc,
                                 dst=y, c=c, nl=nl, ml=ml, applies=s)
    else:
        def group(x, y, s):
            def body(*refs):  # (u, un, us, out)
                return _apply_fused_kernel(*refs, c=c, m=m, r=r, nl=nl,
                                           ml=ml, applies=s)

            center, north, south = _edge_specs(n, m, r)
            in_specs = [center, north, south,
                        pl.BlockSpec(memory_space=pl.ANY)]

            def wrapped(*refs):  # drop the never-read dst ref
                return body(*refs[:-2], refs[-1])

            return pl.pallas_call(
                wrapped,
                out_shape=jax.ShapeDtypeStruct((n, m), u.dtype),
                grid=(n // r,),
                in_specs=in_specs,
                out_specs=center,
                input_output_aliases={3: 0},
                cost_estimate=pl.CostEstimate(
                    flops=s * 6 * n * m, bytes_accessed=2 * 4 * n * m,
                    transcendentals=0,
                ),
            )(x, x, x, y)

    if dst is not None and applies <= _MAX_FUSED_APPLIES:
        return group(u, dst, applies)
    return _pingpong_groups(group, u, applies, _MAX_FUSED_APPLIES)


_MAX_FUSED_JACOBI = 8  # Jacobi's dependency ring grows 1 row/sweep


def _jacobi_fused_kernel(u_ref, un_ref, us_ref, b_ref, bn_ref, bs_ref,
                         out_ref, *, c, m, r, nl, ml, omega, sweeps):
    """``sweeps`` damped-Jacobi sweeps in one memory pass (temporal blocking,
    ring grows one row per sweep; bit-identical to separate launches)."""
    i = pl.program_id(0)
    ext = r + 2 * _HALO
    x = jnp.concatenate([un_ref[:], u_ref[:], us_ref[:]], axis=0)
    bx = jnp.concatenate([bn_ref[:], b_ref[:], bs_ref[:]], axis=0)
    row = i * r - _HALO + jax.lax.broadcasted_iota(jnp.int32, (ext, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, m), 1)
    x = _fused_jacobi_passes(x, bx, row, col, c, nl, ml, sweeps, m, omega)
    out_ref[:] = x[_HALO:_HALO + r, :]


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


def _call(kernel, u, extra_inputs, n, m, r, logical_shape=None, dst=None, **kw):
    """Invoke a stencil kernel over row blocks.

    ``dst``: optional array whose *buffer* receives the output
    (``input_output_aliases`` on a trailing never-read input in the ANY
    memory space, so no block DMA is issued for it).  Chained sweeps
    ping-pong between two buffers this way; without it, XLA must insert a
    full defensive device copy per ``fori_loop`` iteration to re-home the
    pallas output into the loop-carry buffer — measured 2x traffic on v5e.
    (True in-place aliasing of the *read* operand is slower: the revisited
    halo blocks force Mosaic to serialize the pipeline.)
    """
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)
    grid = (n // r,)
    center, north, south = _edge_specs(n, m, r)
    in_specs = [center, north, south] + [center] * len(extra_inputs)
    flops = 6 * n * m
    bytes_accessed = (2 + len(extra_inputs)) * 4 * n * m
    body = _kp(kernel, m=m, r=r, nl=nl, ml=ml, **kw)
    inputs = (u, u, u, *extra_inputs)
    alias = {}
    if dst is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        alias = {len(inputs): 0}
        inputs = inputs + (dst,)
        inner = body

        def body(*refs):  # drop the never-read dst ref
            return inner(*refs[:-2], refs[-1])

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, m), u.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=center,
        input_output_aliases=alias,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
    )(*inputs)


# ---------------------------------------------------------------------------
# Public wrappers (fall back to the XLA path for unsupported shapes)
# ---------------------------------------------------------------------------


def _call_carry(kernel, u, n, m, r, logical_shape=None, dst=None, **kw):
    """Invoke a read-once streaming kernel (one-block-delayed output with
    prev/tail VMEM scratch carry) with optional ping-pong ``dst``."""
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)
    nb = n // r
    in_specs = [pl.BlockSpec((r, m), lambda i: (jnp.minimum(i, nb - 1), 0),
                             memory_space=pltpu.VMEM)]
    out_spec = pl.BlockSpec((r, m), lambda i: (jnp.maximum(i - 1, 0), 0),
                            memory_space=pltpu.VMEM)
    body = _kp(kernel, m=m, r=r, nl=nl, ml=ml, nb=nb, **kw)
    inputs = (u,)
    alias = {}
    if dst is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        alias = {len(inputs): 0}
        inputs = inputs + (dst,)
        inner = body

        def body(*refs):  # drop the never-read dst ref (before scratch refs)
            return inner(refs[0], *refs[2:])

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, m), u.dtype),
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=out_spec,
        input_output_aliases=alias,
        scratch_shapes=[
            pltpu.VMEM((r, m), u.dtype),
            pltpu.VMEM((8, m), u.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * m, bytes_accessed=2 * 4 * n * m, transcendentals=0
        ),
    )(*inputs)


def poisson_apply(u: jax.Array, alpha: float, h: float,
                  logical_shape=None, dst=None) -> jax.Array:
    """Fused ``y = A u`` (identity at Dirichlet rows).

    ``dst``: optional buffer to write into (ping-pong chains, see ``_call``).
    """
    if u.ndim == 3:
        from multigrid_prj_tpu.ops import pallas_stencil_3d as _p3

        return _p3.poisson_apply_3d(u, alpha, h, logical_shape)
    if not _is_supported(u.shape, u.dtype):
        return _xla.poisson_apply(u, alpha, h, logical_shape)
    n, m = u.shape
    c = alpha / (h * h)
    r = _pick_block_rows(n, m, 2)
    if n // r >= 2:
        return _call_carry(_apply_carry_kernel, u, n, m, r,
                           logical_shape=logical_shape, dst=dst, c=c)
    return _call(_apply_kernel, u, (), n, m, r,
                 logical_shape=logical_shape, dst=dst, c=c)


def poisson_residual(u: jax.Array, b: jax.Array, alpha: float, h: float,
                     logical_shape=None) -> jax.Array:
    """Fused ``r = b - A u``."""
    if u.ndim == 3:
        from multigrid_prj_tpu.ops import pallas_stencil_3d as _p3

        return _p3.poisson_residual_3d(u, b, alpha, h, logical_shape)
    if not _is_supported(u.shape, u.dtype):
        return _xla.poisson_residual(u, b, alpha, h, logical_shape)
    n, m = u.shape
    c = alpha / (h * h)
    return _call(_residual_kernel, u, (b,), n, m, _pick_block_rows(n, m),
                 logical_shape=logical_shape, c=c)


def _call_fused(kernel, u, b, n, m, r, sweeps, logical_shape=None, dst=None,
                **kw):
    """Invoke a temporally-fused (u, b) -> u kernel (both operands need halo
    blocks) with optional ping-pong ``dst``."""
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)
    center, north, south = _edge_specs(n, m, r)
    in_specs = [center, north, south, center, north, south]
    body = _kp(kernel, m=m, r=r, nl=nl, ml=ml, sweeps=sweeps,
                             **kw)
    inputs = (u, u, u, b, b, b)
    alias = {}
    if dst is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        alias = {len(inputs): 0}
        inputs = inputs + (dst,)
        inner = body

        def body(*refs):  # drop the never-read dst ref
            return inner(*refs[:-2], refs[-1])

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, m), u.dtype),
        grid=(n // r,),
        in_specs=in_specs,
        out_specs=center,
        input_output_aliases=alias,
        cost_estimate=pl.CostEstimate(
            flops=2 * sweeps * 6 * n * m,
            bytes_accessed=3 * 4 * n * m,
            transcendentals=0,
        ),
    )(*inputs)


def fused_extended_supported(local_shape, dtype) -> bool:
    """Can :func:`rbgs_fused_extended` run on this shard-local block?"""
    if len(local_shape) != 2:
        return False
    n, m = local_shape
    return (n % 8 == 0 and m % _LANE == 0
            and _pick_block_rows_fused(-(-(n + 16) // 64) * 64, m) is not None
            and dtype in (jnp.float32, jnp.dtype("float32")))


def rbgs_fused_extended(ue: jax.Array, be: jax.Array, row0, logical_shape,
                        alpha: float, h: float, sweeps: int) -> jax.Array:
    """``sweeps`` (<= 4) fused RB-GS sweeps on an 8-row-extended local block.

    ``ue``/``be`` are a shard's local rows WITH 8-row neighbor halos above
    and below (delivered by the caller's ppermute — parallel/sharded_gmg.py);
    ``row0`` is the traced GLOBAL row index of ``ue[0]`` (shard_start - 8),
    so the Dirichlet pinning and the red/black parity are computed in global
    coordinates.  Returns the updated CORE rows ``ue[8:-8]``.

    Correctness is the same temporal-blocking ring argument as
    :func:`red_black_gauss_seidel`: the kernel replays the halo rows'
    updates exactly as the neighbor shard computes them, and corruption from
    beyond the 8-row halo travels one row per color pass, so
    ``2 * sweeps <= 8`` leaves the core rows equal to the
    exchange-per-color schedule of ``rbgs_local`` (up to f32 association
    order).  One neighbor exchange per fused group instead of two per sweep.
    """
    if sweeps > _MAX_FUSED_SWEEPS:
        raise ValueError(f"at most {_MAX_FUSED_SWEEPS} fused sweeps")
    ne, m = ue.shape
    c = alpha / (h * h)
    nl, ml = (int(logical_shape[0]), int(logical_shape[1]))
    # pad to a 64-row multiple; pad rows sit >= 8 ring-rows below the core
    ne_pad = -(-ne // 64) * 64
    if ne_pad != ne:
        ue = jnp.pad(ue, ((0, ne_pad - ne), (0, 0)))
        be = jnp.pad(be, ((0, ne_pad - ne), (0, 0)))
    r = _pick_block_rows_fused(ne_pad, m)
    center, north, south = _edge_specs(ne_pad, m, r)

    def shift1(spec):
        # PrefetchScalarGridSpec index maps receive the prefetch ref too
        return pl.BlockSpec(spec.block_shape,
                            lambda i, r0, _m=spec.index_map: _m(i))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ne_pad // r,),
        in_specs=[shift1(center), shift1(north), shift1(south),
                  shift1(center), shift1(north), shift1(south)],
        out_specs=shift1(center),
    )
    # inside shard_map the output varies over the mesh axes the inputs do
    # (check_vma requires it to be spelled out on the out_shape)
    vma = getattr(jax.typeof(ue), "vma", frozenset())
    out = pl.pallas_call(
        _kp(_rbgs_fused_offset_kernel, c=c, m=m, r=r, nl=nl,
                          ml=ml, sweeps=sweeps),
        out_shape=jax.ShapeDtypeStruct((ne_pad, m), ue.dtype, vma=vma),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * sweeps * 6 * ne_pad * m,
            bytes_accessed=3 * 4 * ne_pad * m,
            transcendentals=0,
        ),
    )(jnp.reshape(jnp.asarray(row0, jnp.int32), (1,)), ue, ue, ue, be, be, be)
    return out[_HALO:ne - _HALO, :]


def rbgs_color_sweep(u, b, alpha, h, color: int, logical_shape=None, dst=None):
    """One red or black half-sweep of Gauss-Seidel."""
    if not _is_supported(u.shape, u.dtype):
        raise ValueError(f"unsupported shape {u.shape} for pallas RB-GS")
    n, m = u.shape
    c = alpha / (h * h)
    return _call(_rbgs_color_kernel, u, (b,), n, m, _pick_block_rows(n, m),
                 logical_shape=logical_shape, dst=dst, c=c, color=color)


def red_black_gauss_seidel(u, b, alpha, h, sweeps: int = 1, omega: float = 1.0,
                           logical_shape=None):
    """RB-GS sweeps: temporally-fused kernels (up to 4 sweeps per HBM pass)
    that ping-pong between the ``u`` buffer and one scratch buffer via
    ``dst``, so chained groups incur zero loop-carry copies.

    Bit-identical to launching the color half-sweeps separately (the fused
    kernel replays the same update+boundary-pin sequence inside VMEM).

    ``omega`` is accepted for API parity with the XLA smoother but only
    ``omega == 1`` is implemented in the kernel (SOR falls back to XLA).
    """
    if u.ndim == 3:
        from multigrid_prj_tpu.ops import pallas_stencil_3d as _p3

        return _p3.red_black_gauss_seidel_3d(u, b, alpha, h, sweeps=sweeps,
                                             omega=omega,
                                             logical_shape=logical_shape)
    if omega != 1.0 or not _is_supported(u.shape, u.dtype):
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.red_black_gauss_seidel(u, b, alpha, h, sweeps=sweeps,
                                          omega=omega,
                                          logical_shape=logical_shape)
    n, m = u.shape
    c = alpha / (h * h)
    pick = _fused_1d_or_2d(n, m)
    if pick is None:  # no fused tiling fits VMEM at all
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.red_black_gauss_seidel(u, b, alpha, h, sweeps=sweeps,
                                          omega=omega,
                                          logical_shape=logical_shape)
    r, mc = pick
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)

    if mc is None:
        def group(x, y, s):
            """s fused sweeps: x -> y's buffer."""
            return _call_fused(_rbgs_fused_kernel, x, b, n, m, r, s,
                               logical_shape=logical_shape, dst=y, c=c)
    else:
        def group(x, y, s):
            return _call_fused2d(_rbgs_fused2d_kernel, (x, b), n, m, r, mc,
                                 dst=y, c=c, nl=nl, ml=ml, sweeps=s)

    return _pingpong_groups(group, u, sweeps, _MAX_FUSED_SWEEPS)


def _pingpong_groups(group, u, sweeps, max_fused):
    """Run ``sweeps`` total sweeps as fused groups of ``max_fused``,
    ping-ponging between ``u``'s buffer and one scratch buffer."""
    full, rem = divmod(sweeps, max_fused)
    x, y = u, jnp.zeros_like(u)
    if full <= 4:
        for _ in range(full):
            x, y = group(x, y, max_fused), x
    else:
        def two_groups(_, xy):
            a, bb = xy
            y2 = group(a, bb, max_fused)
            return group(y2, a, max_fused), y2

        x, y = jax.lax.fori_loop(0, full // 2, two_groups, (x, y))
        if full % 2:
            x, y = group(x, y, max_fused), x
    if rem:
        x = group(x, y, rem)
    return x


def jacobi(u, b, alpha, h, omega: float = 1.0, sweeps: int = 1,
           logical_shape=None):
    """Damped-Jacobi sweeps: temporally-fused kernels (up to 8 sweeps per
    HBM pass) ping-ponging two buffers — the TPU-native form of the
    reference's ``temp`` + ``swap`` double buffer (``solvers.hpp:58-83``)."""
    if u.ndim == 3:
        from multigrid_prj_tpu.ops import pallas_stencil_3d as _p3

        return _p3.jacobi_3d(u, b, alpha, h, omega=omega, sweeps=sweeps,
                             logical_shape=logical_shape)
    if not _is_supported(u.shape, u.dtype):
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.jacobi(u, b, alpha, h, omega=omega, sweeps=sweeps,
                          logical_shape=logical_shape)
    n, m = u.shape
    c = alpha / (h * h)
    pick = _fused_1d_or_2d(n, m)
    if pick is None:  # no fused tiling fits VMEM at all
        from multigrid_prj_tpu.ops import smoothers as _sm

        return _sm.jacobi(u, b, alpha, h, omega=omega, sweeps=sweeps,
                          logical_shape=logical_shape)
    r, mc = pick
    nl, ml = (int(logical_shape[0]), int(logical_shape[1])) \
        if logical_shape is not None else (n, m)

    if mc is None:
        def group(x, y, s):
            return _call_fused(_jacobi_fused_kernel, x, b, n, m, r, s,
                               logical_shape=logical_shape, dst=y, c=c,
                               omega=omega)
    else:
        def group(x, y, s):
            return _call_fused2d(_jacobi_fused2d_kernel, (x, b), n, m, r, mc,
                                 dst=y, c=c, nl=nl, ml=ml, omega=omega,
                                 sweeps=s)

    return _pingpong_groups(group, u, sweeps, _MAX_FUSED_JACOBI)
