"""Ablation harness for the Pallas ELL SpMV kernel (ops/pallas_spmv).

Times kernel variants on the real chip to locate the bottleneck between
grid-step overhead (block_rows), lane-shuffle count (take_along_axis per
window tile), and the per-lane-tile dynamic window slice.  Variants tagged
``probe_`` intentionally compute WRONG results (they skip part of the work
to isolate its cost) and are excluded from the correctness check.

    python -m benchmarks.spmv_ablation [n_rows] [iters]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.spmv_bench import banded_csr
from multigrid_prj_tpu.ops.pallas_spmv import PallasELL, _LANE, _spmv_kernel


def _kernel_probe_noshuffle(base2_ref, cols_ref, vals_ref, x_ref, o_ref, *,
                            k, r, t_win):
    """PROBE: replaces the lane gather with a plain select of the window
    rows (no take_along_axis) — isolates the shuffle cost."""
    i = pl.program_id(0)
    nlt = r // _LANE
    for j in range(nlt):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        idx = cols_ref[:, sl].astype(jnp.int32)
        hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
        base = base2_ref[i * nlt + j]
        win = x_ref[pl.ds(base, 8), :]
        g = jnp.zeros((k, _LANE), x_ref.dtype)
        for t in range(t_win):
            src = jnp.broadcast_to(win[t, :][None, :], (k, _LANE))
            g = jnp.where(hi == t, src, g)
        o_ref[j, :] = jnp.sum(vals_ref[:, sl] * g, axis=0)


def _kernel_probe_staticwin(base2_ref, cols_ref, vals_ref, x_ref, o_ref, *,
                            k, r, t_win):
    """PROBE: static window slice (base=0) — isolates the dynamic-slice
    cost."""
    nlt = r // _LANE
    for j in range(nlt):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        idx = cols_ref[:, sl].astype(jnp.int32)
        hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
        lo = jax.lax.bitwise_and(idx, jnp.int32(127))
        win = x_ref[pl.ds(0, 8), :]
        g = jnp.zeros((k, _LANE), x_ref.dtype)
        for t in range(t_win):
            src = jnp.broadcast_to(win[t, :][None, :], (k, _LANE))
            g = jnp.where(hi == t, jnp.take_along_axis(src, lo, axis=1), g)
        o_ref[j, :] = jnp.sum(vals_ref[:, sl] * g, axis=0)


def _kernel_probe_stream(base2_ref, cols_ref, vals_ref, x_ref, o_ref, *,
                         k, r, t_win):
    """PROBE: pure streaming floor — reads cols+vals, no gather at all."""
    nlt = r // _LANE
    for j in range(nlt):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        o_ref[j, :] = jnp.sum(
            vals_ref[:, sl] * cols_ref[:, sl].astype(x_ref.dtype), axis=0)


def spmv_variant(pA: PallasELL, x2d, kernel_fn, block_rows: int):
    k_pad, n_pad = pA.colsT_rel.shape
    r = block_rows
    nb = n_pad // r
    nlt = r // _LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k_pad, r), lambda i, b2: (0, i)),
            pl.BlockSpec((k_pad, r), lambda i, b2: (0, i)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nlt, _LANE), lambda i, b2: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(kernel_fn, k=k_pad, r=r, t_win=pA.t_win),
        out_shape=jax.ShapeDtypeStruct((nb * nlt, _LANE), pA.valsT.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * k_pad * n_pad,
            bytes_accessed=8 * k_pad * n_pad + 4 * (pA.m_pad + n_pad),
            transcendentals=0,
        ),
    )(pA.base2, pA.colsT_rel, pA.valsT, x2d)


def time_fn(fn, x2d, iters, tag, slots):
    @jax.jit
    def chain(x2d):
        def body(_, x2d):
            y2d = fn(x2d)
            return jax.lax.dynamic_update_slice(x2d, y2d, (0, 0))
        return jax.lax.fori_loop(0, iters, body, x2d)

    r = chain(x2d)
    _ = float(r[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chain(x2d)[0, 0])
        best = min(best, time.perf_counter() - t0)
    out = {"variant": tag, "nnz_per_s": slots * iters / best,
           "gb_s": slots * iters / best * 8e-9,
           "us_per_spmv": best * 1e6 / iters}
    print(json.dumps(out))
    return out


VARIANTS = (
    ("orig", _spmv_kernel, True),
    ("probe_noshuffle", _kernel_probe_noshuffle, False),
    ("probe_staticwin", _kernel_probe_staticwin, False),
    ("probe_stream", _kernel_probe_stream, False),
)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    n = int(argv[0]) if argv else 1 << 20
    iters = int(argv[1]) if len(argv) > 1 else 50
    A = banded_csr(n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    y_ref = None
    for br in (1024, 8192, 32768):
        pA = PallasELL.build(A, dtype=jnp.float32, block_rows=br)
        if pA is None:
            print(json.dumps({"variant": f"br{br}", "skipped": "build"}))
            continue
        x2d = jax.jit(pA.pad_x)(x)
        for tag, kern, check in VARIANTS:
            y = np.asarray(spmv_variant(pA, x2d, kern, br)).reshape(-1)[:n]
            if check:
                if y_ref is None:
                    y_ref = y
                else:
                    err = np.abs(y - y_ref).max()
                    assert err < 1e-5, (tag, br, err)
            time_fn(lambda x2d, k=kern, p=pA, b=br: spmv_variant(p, x2d, k, b),
                    x2d, iters, f"{tag}_br{br}", pA.nnz_dense)


if __name__ == "__main__":
    main()
