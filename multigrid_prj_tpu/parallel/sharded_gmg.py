"""Multi-chip geometric multigrid: block-row sharding + ICI halo exchange.

This is the distribution layer the reference never had (its only parallelism
was OpenMP loop pragmas, SURVEY.md §2.4).  TPU-native design, following the
standard JAX recipe:

* the fine grid ``(n, n)`` is block-row sharded over a 1D
  ``jax.sharding.Mesh`` axis ``"x"`` — each device owns ``R = n / P`` rows;
* every stencil/smoother sweep exchanges ONE halo row with each neighbor
  via ``jax.lax.ppermute`` (a fixed-neighbor ICI transfer XLA can overlap
  with the interior compute);
* norms and convergence checks are ``lax.psum`` reductions, so all shards
  agree on loop control inside a single ``shard_map``-ped solve;
* grid transfer stays local: row coarsening by 2 aligns with the block
  boundary as long as ``R`` is even, so a level keeps its sharding until the
  per-shard row count gets small, at which point the residual is
  ``all_gather``-ed and the remaining coarse levels run replicated (every
  device redundantly — standard practice, they are tiny);
* the edge shards receive zero halos from ``ppermute``; those rows are
  exactly the global Dirichlet rows, which every kernel masks to identity —
  the same trick the single-chip Pallas kernels use.

The whole outer solve (pre-smooths + V-cycle + residual history +
``while_loop`` control) is ONE jitted ``shard_map`` program: zero host
round-trips, collectives riding ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multigrid_prj_tpu.gmg import SolveResult, v_cycle as replicated_v_cycle
from multigrid_prj_tpu.grids import GridLevel, build_hierarchy
from multigrid_prj_tpu.ops.smoothers import make_smoother

AXIS = "x"


# ---------------------------------------------------------------------------
# Local (per-shard) building blocks.  All take/return the shard's row block.
# ---------------------------------------------------------------------------


def _halo_rows(u: jax.Array, axis_name: str = AXIS):
    """(top, bottom) halo rows from the neighbors; zeros at the ends."""
    p = lax.axis_size(axis_name)
    top = lax.ppermute(u[-1:, :], axis_name, [(i, i + 1) for i in range(p - 1)])
    bot = lax.ppermute(u[:1, :], axis_name, [(i, i - 1) for i in range(1, p)])
    return top, bot


def _global_row_col(shape_local, n_global):
    i = lax.axis_index(AXIS)
    r_local = shape_local[0]
    row = i * r_local + jax.lax.broadcasted_iota(jnp.int32, shape_local, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape_local, 1)
    return row, col


def _boundary_mask_local(shape_local, n_global, m_global):
    row, col = _global_row_col(shape_local, n_global)
    return (row == 0) | (row == n_global - 1) | (col == 0) | (col == m_global - 1)


def _neighbor_sum_local(u, top, bot):
    north = jnp.concatenate([top, u[:-1, :]], axis=0)
    south = jnp.concatenate([u[1:, :], bot], axis=0)
    west = jnp.pad(u[:, :-1], ((0, 0), (1, 0)))
    east = jnp.pad(u[:, 1:], ((0, 0), (0, 1)))
    return north + south + east + west


def poisson_apply_local(u, alpha, h, n_global, m_global):
    c = alpha / (h * h)
    top, bot = _halo_rows(u)
    bmask = _boundary_mask_local(u.shape, n_global, m_global)
    interior = c * (4.0 * u - _neighbor_sum_local(u, top, bot))
    return jnp.where(bmask, u, interior)


def residual_local(u, b, alpha, h, n_global, m_global):
    return b - poisson_apply_local(u, alpha, h, n_global, m_global)


def rbgs_local(u, b, alpha, h, n_global, m_global, sweeps: int = 1):
    """Red-black GS with one halo exchange per color pass."""
    c = alpha / (h * h)
    bmask = _boundary_mask_local(u.shape, n_global, m_global)
    row, col = _global_row_col(u.shape, n_global)
    parity = (row + col) % 2
    b_over_c = b / c

    def one_color(u, color):
        top, bot = _halo_rows(u)
        gs = (b_over_c + _neighbor_sum_local(u, top, bot)) * 0.25
        u = jnp.where((parity == color) & ~bmask, gs, u)
        return jnp.where(bmask, b, u)

    def one_sweep(u):
        u = one_color(u, 0)
        return one_color(u, 1)

    if sweeps <= 8:
        for _ in range(sweeps):
            u = one_sweep(u)
        return u
    return lax.fori_loop(0, sweeps, lambda _, v: one_sweep(v), u)


def norm2_psum(x):
    return lax.psum(jnp.sum(x * x), AXIS)


def restrict_fw_local(r, n_global, m_global):
    """Full-weighting restriction of a block-row shard (R rows -> R/2).

    Row filter uses the halo rows; global edge rows are injected (they carry
    the Dirichlet residual, which the coarse smoother re-pins anyway).
    """
    top, bot = _halo_rows(r)
    rp = jnp.concatenate([top, r, bot], axis=0)  # (R+2, m)
    R = r.shape[0]
    # coarse local row k <- fine rows 2k-1, 2k, 2k+1 == rp[2k], rp[2k+1], rp[2k+2]
    rows = 0.25 * rp[0:R:2] + 0.5 * rp[1: R + 1: 2] + 0.25 * rp[2: R + 2: 2]
    # Global low edge: inject (true Dirichlet row, residual ~0).  Global high
    # edge: inject for odd n; ZERO for even n — the fake coarse boundary must
    # not carry residual (see ops/transfer._fw_axis).
    i = lax.axis_index(AXIS)
    Rc = R // 2
    nc = (n_global + 1) // 2
    grow = i * Rc + jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    rows = jnp.where(grow == 0, rp[1: R + 1: 2], rows)
    if n_global % 2 == 0:
        rows = jnp.where(grow == nc - 1, 0.0, rows)
    else:
        rows = jnp.where(grow == nc - 1, rp[1: R + 1: 2], rows)
    # column filter (columns are fully local; same edge rules)
    m = m_global
    if m % 2 == 0:
        interior = (
            0.25 * rows[:, 1: m - 3: 2]
            + 0.5 * rows[:, 2: m - 2: 2]
            + 0.25 * rows[:, 3: m - 1: 2]
        )
        zero = jnp.zeros_like(rows[:, :1])
        return jnp.concatenate([rows[:, :1], interior, zero], axis=1)
    interior = (
        0.25 * rows[:, 1: m - 2: 2] + 0.5 * rows[:, 2: m - 1: 2] + 0.25 * rows[:, 3: m: 2]
    )
    return jnp.concatenate([rows[:, :1], interior, rows[:, m - 1:]], axis=1)


def prolong_local(e, fine_rows: int, m_fine: int):
    """Bilinear prolongation of a coarse shard (Rc rows) to its fine shard
    (R = 2 Rc rows), pulling one coarse halo row from the next shard."""
    p = lax.axis_size(AXIS)
    i = lax.axis_index(AXIS)
    _, bot = _halo_rows(e)
    # last shard clamps to its own last row (general-n edge handling)
    bot = jnp.where(i == p - 1, e[-1:, :], bot)
    nxt = jnp.concatenate([e[1:, :], bot], axis=0)
    mid = 0.5 * (e + nxt)
    Rc, m = e.shape
    inter = jnp.stack([e, mid], axis=1).reshape(2 * Rc, m)  # rows 2k, 2k+1
    # columns: refine m -> m_fine (fully local)
    ncol = m
    head = inter[:, : ncol - 1]
    cmid = 0.5 * (head + inter[:, 1:])
    stacked = jnp.stack([head, cmid], axis=2).reshape(2 * Rc, 2 * (ncol - 1))
    out = jnp.concatenate([stacked, inter[:, ncol - 1:]], axis=1)  # 2 nc - 1
    if m_fine == 2 * ncol:
        out = jnp.concatenate([out, inter[:, ncol - 1:]], axis=1)
    elif m_fine != 2 * ncol - 1:
        raise ValueError(f"cannot refine {ncol} columns to {m_fine}")
    return out[:fine_rows]


# ---------------------------------------------------------------------------
# The sharded solver
# ---------------------------------------------------------------------------


class ShardedGMGSolver:
    """Block-row-sharded GMG V-cycle solver over a 1D device mesh.

    ``num_sharded_levels`` levels run distributed with ppermute halo
    exchange; deeper levels are gathered and run replicated.  Requires the
    fine ``n`` divisible by ``2^(num_sharded_levels - 1) * n_devices``.
    """

    def __init__(
        self,
        shape: Sequence[int],
        mesh: Mesh,
        length: float = 10.0,
        alpha: float = 10.0,
        num_levels: int = 4,
        nu1: int = 2,
        nu2: int = 2,
        coarse_sweeps: int = 100,
        tol: float = 1e-6,
        maxit: int = 100,
        min_rows_per_shard: int = 8,
    ):
        if len(shape) != 2:
            raise ValueError("sharded solver is 2D (3D: roadmap)")
        self.mesh = mesh
        self.p = mesh.devices.size
        self.levels = build_hierarchy(shape, length, num_levels)
        self.alpha = float(alpha)
        self.nu1, self.nu2 = nu1, nu2
        self.coarse_sweeps = coarse_sweeps
        self.tol, self.maxit = float(tol), int(maxit)

        # How many levels can stay sharded: a sharded level restricts R ->
        # R/2 rows locally, so it needs n divisible by 2*P (even local row
        # count) and enough rows per shard to be worth distributing.
        ls = 0
        for lev in self.levels[:-1]:
            n = lev.shape[0]
            if n % (2 * self.p) == 0 and n // self.p >= min_rows_per_shard:
                ls += 1
            else:
                break
        if ls == 0:
            raise ValueError(
                f"rows {shape[0]} not shardable over {self.p} devices "
                f"(need divisibility and >= {min_rows_per_shard} rows/shard)"
            )
        self.num_sharded = min(ls, len(self.levels))
        self.smoother = make_smoother("gs")
        self.sharding = NamedSharding(mesh, P(AXIS, None))
        self._jit_solve = jax.jit(
            jax.shard_map(
                self._solve_local,
                mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS, None)),
                out_specs=(P(AXIS, None), P(), P()),
            )
        )
        self._jit_step = jax.jit(
            jax.shard_map(
                lambda u, b: self._v_local(u, b, 0),
                mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS, None)),
                out_specs=P(AXIS, None),
            )
        )

    # -- sharded V-cycle -----------------------------------------------------

    def _v_local(self, u, b, level: int):
        lev = self.levels[level]
        n, m = lev.shape
        h = lev.h
        a = self.alpha
        u = rbgs_local(u, b, a, h, n, m, self.nu1)
        r = residual_local(u, b, a, h, n, m)
        rc = restrict_fw_local(r, n, m)
        nlev = self.levels[level + 1]
        if level + 1 < self.num_sharded:
            ec = self._v_local(jnp.zeros_like(rc), rc, level + 1)
        else:
            # gather the coarse residual, run the remaining levels replicated
            r_full = lax.all_gather(rc, AXIS, axis=0, tiled=True)
            e_full = replicated_v_cycle(
                jnp.zeros_like(r_full), r_full, self.levels[level + 1:],
                a, self.smoother, nu1=self.nu1, nu2=self.nu2,
                coarse_sweeps=self.coarse_sweeps,
            )
            rc_rows = nlev.shape[0] // self.p
            i = lax.axis_index(AXIS)
            ec = lax.dynamic_slice_in_dim(e_full, i * rc_rows, rc_rows, axis=0)
        u = u + prolong_local(ec, u.shape[0], m)
        return rbgs_local(u, b, a, h, n, m, self.nu2)

    def _solve_local(self, u, b):
        lev0 = self.levels[0]
        n, m = lev0.shape
        a, h = self.alpha, lev0.h
        b2 = norm2_psum(b)

        def rel(u):
            r = residual_local(u, b, a, h, n, m)
            return jnp.sqrt(norm2_psum(r) / b2)

        hist = jnp.full((self.maxit + 1,), jnp.nan, dtype=b.dtype)
        hist = hist.at[0].set(rel(u))

        def cond(st):
            _, k, hist = st
            return (k < self.maxit) & (hist[k] > self.tol)

        def body(st):
            u, k, hist = st
            u = self._v_local(u, b, 0)
            hist = hist.at[k + 1].set(rel(u))
            return u, k + 1, hist

        u, k, hist = lax.while_loop(cond, body, (u, jnp.int32(0), hist))
        return u, k, hist

    # -- public API ----------------------------------------------------------

    def solve(self, b: jax.Array, u0: jax.Array | None = None) -> SolveResult:
        b = jax.device_put(b, self.sharding)
        if u0 is None:
            u0 = jnp.zeros_like(b)
        u, k, hist = self._jit_solve(u0, b)
        k = int(k)
        return SolveResult(
            u=u, history=hist[: k + 1], iterations=k,
            converged=bool(hist[k] <= self.tol),
        )

    def step(self, u: jax.Array, b: jax.Array) -> jax.Array:
        """One sharded V-cycle (for benchmarking / the multi-chip dryrun)."""
        return self._jit_step(u, b)
