"""ELL SpMV microbenchmark on the real chip: Pallas kernel vs XLA gather.

Prints one JSON line per variant with nnz/s (padded ELL slots — the actual
streamed footprint) and effective GB/s.  BASELINE.json's named metric is
"SpMV nnz/s per chip"; the roofline for the 8 B/slot cols+vals stream on
v5e (819 GB/s) is ~102 G slots/s.

Usage: python -m benchmarks.spmv_bench [n_rows] [iters]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multigrid_prj_tpu.ops.pallas_spmv import PallasELL
from multigrid_prj_tpu.ops.sparse import ELLMatrix, HostCSR


def banded_csr(n: int, half_band: int = 3, extra: int = 2) -> HostCSR:
    """A banded SPD-ish test matrix: tridiagonal-plus-wings, K = 4 + extra."""
    offs = [0, -1, 1, -half_band * 17] + [half_band * (i + 2) for i in range(extra)]
    rows_l, cols_l, vals_l = [], [], []
    for o in offs:
        r = np.arange(max(0, -o), min(n, n - o), dtype=np.int64)
        rows_l.append(r)
        cols_l.append(r + o)
        vals_l.append(np.full(r.size, 8.0 if o == 0 else -1.0))
    rows = np.concatenate(rows_l)
    return HostCSR.from_coo(
        rows, np.concatenate(cols_l), np.concatenate(vals_l), (n, n)
    )


def bench(fn, x, iters: int, tag: str, slots: int) -> dict:
    """Differential timing: chain of ``iters`` vs ``4*iters`` dependent
    SpMVs, subtract — cancels the ~30-40 ms tunnel dispatch latency that
    would otherwise dominate (each SpMV is only ~0.1-1 ms)."""

    def make_chain(k):
        @jax.jit
        def chain(x):
            def body(_, xc):
                y = fn(xc)
                # feed the output back so iterations are dependent and
                # cannot be hoisted (same shape: y = A x, square A)
                return y

            return jax.lax.fori_loop(0, k, body, x)

        return chain

    few, many = make_chain(iters), make_chain(4 * iters)
    _ = float(few(x)[0])
    _ = float(many(x)[0])
    delta = 3 * iters
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(few(x)[0])
        t1 = time.perf_counter()
        _ = float(many(x)[0])
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    diffs.sort()
    best = diffs[len(diffs) // 2] / delta
    nnz_s = slots / best
    out = {
        "metric": f"ell_spmv_{tag}_nnz_per_s",
        "value": nnz_s,
        "unit": "slots/s",
        "gb_s": nnz_s * 8e-9,
        "ms_per_spmv": best * 1e3 / iters,
    }
    print(json.dumps(out))
    return out


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    n = int(argv[0]) if argv else 1 << 20
    iters = int(argv[1]) if len(argv) > 1 else 50
    A = banded_csr(n)
    pA = PallasELL.build(A, dtype=jnp.float32)
    assert pA is not None, "banded build must succeed"
    ell = ELLMatrix.from_host_csr(A, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    # correctness cross-check on device before timing
    y_pallas = np.asarray(pA.spmv(x), np.float64)
    y_xla = np.asarray(ell.spmv(x), np.float64)
    err = np.abs(y_pallas - y_xla).max() / max(1.0, np.abs(y_xla).max())
    assert err < 1e-5, err
    print(json.dumps({"check": "pallas-vs-xla", "rel_err": float(err),
                      "t_win": pA.t_win, "k_pad": pA.colsT_rel.shape[0]}))

    res_p = bench(pA.spmv, x, iters, "pallas", pA.nnz_dense)
    res_x = bench(ell.spmv, x, iters, "xla_gather", ell.nnz_dense)
    print(json.dumps({
        "speedup": res_p["value"] / res_x["value"],
        "roofline_frac": res_p["gb_s"] / 819.0,
    }))


if __name__ == "__main__":
    main()
