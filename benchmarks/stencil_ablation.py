"""Ablation microbench for the Pallas stencil kernel: isolates which piece
(pipeline, halo inputs, lane rolls, boundary masking) costs bandwidth.

Run on the real chip: ``python benchmarks/stencil_ablation.py``.
Prints GB/s of *effective* traffic (read u once + write y once = 8 B/point)
for each variant, so numbers are directly comparable.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192
M = 8192


ITERS = 24


def timeit(mk_chain, u, iters=ITERS):
    """Overhead-corrected: time a (5+iters)-chain minus a 5-chain so tunnel
    dispatch / fence latency cancels (same method as bench.py)."""
    few, many = mk_chain(5), mk_chain(5 + iters)

    def run(f):
        r = f(u)
        _ = float(r[0, 0])

    run(few)
    run(many)
    best = float("inf")
    for _i in range(4):
        t0 = time.perf_counter()
        run(few)
        t1 = time.perf_counter()
        run(many)
        t2 = time.perf_counter()
        d = (t2 - t1) - (t1 - t0)
        if d > 0:
            best = min(best, d)
    return best / iters


def chain(apply_fn):
    def mk(iters):
        @jax.jit
        def f(u):
            return jax.lax.fori_loop(0, iters, lambda _, v: apply_fn(v), u)

        return f

    return mk


def make_u():
    i = jax.lax.broadcasted_iota(jnp.float32, (N, M), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (N, M), 1)
    return jnp.sin(0.01 * i) * jnp.cos(0.013 * j)


def report(name, dt):
    eff = 8.0 * N * M / dt / 1e9
    print(f"{name:30s} {dt*1e3:8.3f} ms   {eff:7.1f} GB/s effective")


# -- variants -----------------------------------------------------------------


def v_copy(r):
    def kern(u_ref, out_ref):
        out_ref[:] = u_ref[:] + 1.0

    spec = pl.BlockSpec((r, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return lambda u: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        grid=(N // r,),
        in_specs=[spec],
        out_specs=spec,
    )(u)


def v_rolls(r):
    def kern(u_ref, out_ref):
        cur = u_ref[:]
        west = pltpu.roll(cur, 1, axis=1)
        east = pltpu.roll(cur, M - 1, axis=1)
        out_ref[:] = 4.0 * cur - east - west

    spec = pl.BlockSpec((r, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return lambda u: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        grid=(N // r,),
        in_specs=[spec],
        out_specs=spec,
    )(u)


def v_shifts(r):
    """East/west via static slicing + concat instead of pltpu.roll."""

    def kern(u_ref, out_ref):
        cur = u_ref[:]
        west = jnp.concatenate([cur[:, :1], cur[:, :-1]], axis=1)
        east = jnp.concatenate([cur[:, 1:], cur[:, -1:]], axis=1)
        out_ref[:] = 4.0 * cur - east - west

    spec = pl.BlockSpec((r, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return lambda u: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        grid=(N // r,),
        in_specs=[spec],
        out_specs=spec,
    )(u)


def v_halo(r):
    """center + 2 halo inputs, vertical neighbors only."""

    def kern(u_ref, un_ref, us_ref, out_ref):
        cur = u_ref[:]
        north = jnp.concatenate([un_ref[-1:, :], cur[:-1, :]], axis=0)
        south = jnp.concatenate([cur[1:, :], us_ref[:1, :]], axis=0)
        out_ref[:] = 4.0 * cur - north - south

    center = pl.BlockSpec((r, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rb = r // 8
    north = pl.BlockSpec((8, M), lambda i: (jnp.maximum(i * rb - 1, 0), 0),
                         memory_space=pltpu.VMEM)
    south = pl.BlockSpec((8, M), lambda i: (jnp.minimum((i + 1) * rb, N // 8 - 1), 0),
                         memory_space=pltpu.VMEM)
    return lambda u: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        grid=(N // r,),
        in_specs=[center, north, south],
        out_specs=center,
    )(u, u, u)


def v_full(r):
    """the current production structure: halos + rolls + mask."""

    def kern(u_ref, un_ref, us_ref, out_ref):
        i = pl.program_id(0)
        cur = u_ref[:]
        north = jnp.concatenate([un_ref[-1:, :], cur[:-1, :]], axis=0)
        south = jnp.concatenate([cur[1:, :], us_ref[:1, :]], axis=0)
        west = pltpu.roll(cur, 1, axis=1)
        east = pltpu.roll(cur, M - 1, axis=1)
        stencil = 0.1 * (4.0 * cur - north - south - east - west)
        row = i * r + jax.lax.broadcasted_iota(jnp.int32, (r, M), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r, M), 1)
        boundary = (row == 0) | (row >= N - 1) | (col == 0) | (col >= M - 1)
        out_ref[:] = jnp.where(boundary, cur, stencil)

    center = pl.BlockSpec((r, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rb = r // 8
    north = pl.BlockSpec((8, M), lambda i: (jnp.maximum(i * rb - 1, 0), 0),
                         memory_space=pltpu.VMEM)
    south = pl.BlockSpec((8, M), lambda i: (jnp.minimum((i + 1) * rb, N // 8 - 1), 0),
                         memory_space=pltpu.VMEM)
    return lambda u: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        grid=(N // r,),
        in_specs=[center, north, south],
        out_specs=center,
    )(u, u, u)


def v_carry(r):
    """scratch-carry: read u exactly once, output delayed by one block."""

    nb = N // r

    def kern(u_ref, out_ref, prev_ref, tail_ref, *, r=r):
        i = pl.program_id(0)

        @pl.when(i > 0)
        def _():
            prev = prev_ref[:]
            north = jnp.concatenate([tail_ref[-1:, :], prev[:-1, :]], axis=0)
            south = jnp.concatenate([prev[1:, :], u_ref[:1, :]], axis=0)
            west = pltpu.roll(prev, 1, axis=1)
            east = pltpu.roll(prev, M - 1, axis=1)
            stencil = 0.1 * (4.0 * prev - north - south - east - west)
            row = (i - 1) * r + jax.lax.broadcasted_iota(jnp.int32, (r, M), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (r, M), 1)
            boundary = (row == 0) | (row >= N - 1) | (col == 0) | (col >= M - 1)
            out_ref[:] = jnp.where(boundary, prev, stencil)

        tail_ref[:] = prev_ref[-8:, :]
        prev_ref[:] = u_ref[:]

    center_in = pl.BlockSpec((r, M), lambda i: (jnp.minimum(i, nb - 1), 0),
                             memory_space=pltpu.VMEM)
    center_out = pl.BlockSpec((r, M), lambda i: (jnp.maximum(i - 1, 0), 0),
                              memory_space=pltpu.VMEM)
    return lambda u: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        grid=(nb + 1,),
        in_specs=[center_in],
        out_specs=center_out,
        scratch_shapes=[
            pltpu.VMEM((r, M), jnp.float32),
            pltpu.VMEM((8, M), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(u)


def main():
    u = make_u()
    for name, mk, rs in [
        ("copy+1", v_copy, (64, 128, 256)),
        ("rolls(E/W)", v_rolls, (64, 128, 256)),
        ("shifts(E/W concat)", v_shifts, (64, 128, 256)),
        ("halo(N/S)", v_halo, (32, 64)),
        ("full current", v_full, (32, 64)),
        ("carry full", v_carry, (32, 64)),
    ]:
        for r in rs:
            try:
                dt = timeit(chain(mk(r)), u)
                report(f"{name} R={r}", dt)
            except Exception as e:  # noqa: BLE001
                print(f"{name:30s} R={r}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
