"""Per-op differential breakdown of the 1024^2 FD AMG V-cycle (VERDICT r4
item 2: the solve phase ran ~10x below its own SpMV kernel with no
attribution — this is the AMG analog of benchmarks/vcycle_ablation.py).

Phases measured (interleaved few/many differential chains, so the ~40 ms
tunnel dispatch latency cancels):

* full V(1,1) cycle;
* fine-level A SpMV: Pallas kernel vs XLA gather (and which one the solver
  actually dispatches — ``A_fast`` present or not, per level);
* fine-level Chebyshev(3) smooth application;
* P / Pt applies at the fine level: ``P_fast``/``Pt_fast`` vs gather;
* per-level single smooth+residual cost (attributes coarser levels);
* coarse dense-inverse bottom solve;
* solve-loop per-iteration overhead (history/norm ops) = solve(k) - k*cycle.

Writes ``benchmarks/AMG_ABLATION_r05_<n>.json``.

Usage: python -m benchmarks.amg_ablation [n_grid]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _fence(r):
    import jax

    leaf = jax.tree_util.tree_leaves(r)[0]
    if getattr(leaf, "ndim", 0):
        # index ON DEVICE first: device_get of the full leaf ships the
        # whole array through the tunnel (268 MB ~ 9.5 s at 8193^2 —
        # measured masquerading as solve wall time, r5)
        leaf = leaf.ravel()[0]
    return float(np.asarray(jax.device_get(leaf)))



def timed_chain(make_chain, args, few: int, many: int, reps: int = 9):
    import time

    f, g = make_chain(few), make_chain(many)
    for attempt in range(4):
        try:
            _fence(f(*args)); _fence(g(*args))
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(10)
    ds = []
    for _ in range(reps):
        t0 = time.perf_counter(); _fence(f(*args))
        t1 = time.perf_counter(); _fence(g(*args))
        t2 = time.perf_counter()
        ds.append((t2 - t1) - (t1 - t0))
    ds.sort()
    return ds[len(ds) // 2] / (many - few)


def main(argv=None) -> None:
    from benchmarks import _cache

    _cache.enable()
    argv = sys.argv[1:] if argv is None else argv
    n_grid = int(argv[0]) if argv else 1024

    import jax
    import jax.numpy as jnp

    from multigrid_prj_tpu.amg import AMGSolver, apply_A, apply_P, apply_Pt
    from multigrid_prj_tpu.models.poisson import poisson_fd_csr

    out = {"n_grid": n_grid, "backend": jax.default_backend()}

    A = poisson_fd_csr(n_grid)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0]).astype(np.float32)
    t0 = time.perf_counter()
    solver = AMGSolver(A, num_levels=12, min_coarse=2000)
    out["setup_s"] = time.perf_counter() - t0
    out["levels"] = solver.level_sizes
    out["smoother"] = solver.smoother_name
    # which ops actually ride the Pallas kernels (the VERDICT question)
    out["fast_paths"] = [
        {"level": i, "A_fast": l.A_fast is not None,
         "A_fast_mode": (None if l.A_fast is None else
                         ("compact" if l.A_fast.compact else
                          "windowed" if l.A_fast.windowed else "vmem")),
         "P_fast": l.P_fast is not None, "Pt_fast": l.Pt_fast is not None}
        for i, l in enumerate(solver.levels)
    ]

    def _rec(key, val_ms):
        if val_ms < 0:
            out[key] = 0.0
            out[key + "_note"] = (f"below differential noise floor "
                                  f"(measured {val_ms:.5f} ms)")
        else:
            out[key] = val_ms
        print(json.dumps({key: out.get(key)}), flush=True)

    levels, cdense = solver._args()
    bd = jnp.asarray(solver._perm_in(b), jnp.float32)

    # full V(1,1) cycle
    def vchain(k):
        @jax.jit
        def f(levels, cdense, x, bb):
            def body(_, xx):
                return solver._vcycle_args(levels, cdense, xx, bb)
            return jax.lax.fori_loop(0, k, body, x)
        return f

    _rec("vcycle_ms", timed_chain(
        vchain, (levels, cdense, jnp.zeros_like(bd), bd), 5, 45) * 1e3)

    # full solve (wall, includes per-iteration history/norm + dispatch);
    # b lives on device — a numpy b re-uploads 4 MB through the tunnel
    # every call (~0.7 s of the previous 0.95 s wall)
    b_dev = jnp.asarray(b)
    sol = solver.solve(b_dev, tol=1e-5, maxit=50)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sol = solver.solve(b_dev, tol=1e-5, maxit=50)
        _fence(sol.x)
        best = min(best, time.perf_counter() - t0)
    out["solve_f32_wall_ms"] = best * 1e3
    out["solve_f32_iters"] = int(sol.iterations)
    print(json.dumps({"solve_f32_wall_ms": best * 1e3,
                      "iters": int(sol.iterations)}), flush=True)

    # in-jit solve-loop body (cycle + residual norm + history) per iteration
    def schain(k):
        @jax.jit
        def f(levels, cdense, x, bb):
            xx, _, _, _ = solver._solve_impl(levels, cdense, x, bb,
                                             jnp.asarray(0.0, jnp.float32),
                                             jnp.asarray(k, jnp.int32))
            return xx
        return f

    _rec("solve_loop_iter_ms", timed_chain(
        schain, (levels, cdense, jnp.zeros_like(bd), bd), 5, 45) * 1e3)

    # fine-level ops: SpMV pallas vs gather, Chebyshev smooth, P/Pt applies
    lvl0 = levels[0]
    x0 = jnp.asarray(rng.standard_normal(solver.level_sizes[0]), jnp.float32)

    def op_chain(op, x_like):
        def mk(k):
            @jax.jit
            def f(levels, x):
                def body(_, xx):
                    y = op(levels, xx)
                    # renormalize so chained applies neither overflow nor
                    # denormalize; one rsqrt per step is negligible vs SpMV
                    return y * jax.lax.rsqrt(jnp.sum(y * y) + 1e-30)
                return jax.lax.fori_loop(0, k, body, x)
            return f
        return mk

    _rec("spmv_L0_dispatch_ms", timed_chain(
        op_chain(lambda lv, x: apply_A(lv[0], x), x0), (levels, x0),
        20, 320) * 1e3)
    if solver.levels[0].A_fast is not None:
        _rec("spmv_L0_gather_ms", timed_chain(
            op_chain(lambda lv, x: lv[0].A.spmv(x), x0), (levels, x0),
            10, 90) * 1e3)
    _rec("cheb3_L0_ms", timed_chain(
        op_chain(lambda lv, x: solver._smooth(lv[0], x, x, 1), x0),
        (levels, x0), 10, 130) * 1e3)

    if solver.levels[0].P is not None:
        nc = solver.level_sizes[1]
        xc = jnp.asarray(rng.standard_normal(nc), jnp.float32)

        def pt_op(lv, x):
            return apply_P(lv[0], apply_Pt(lv[0], x) * jax.lax.rsqrt(
                jnp.sum(x * x) + 1e-30))

        _rec("PtP_L0_dispatch_ms", timed_chain(
            op_chain(lambda lv, x: pt_op(lv, x), x0), (levels, x0),
            10, 170) * 1e3)

        def pt_gather(lv, x):
            return lv[0].P.spmv(lv[0].Pt.spmv(x) * jax.lax.rsqrt(
                jnp.sum(x * x) + 1e-30))

        _rec("PtP_L0_gather_ms", timed_chain(
            op_chain(pt_gather, x0), (levels, x0), 5, 55) * 1e3)

    # per-level one smooth+residual (attributes the coarse-level share)
    for li in range(len(solver.levels) - 1):
        nl_rows = solver.level_sizes[li]
        xl = jnp.asarray(rng.standard_normal(nl_rows), jnp.float32)
        sz = max(1.0, nl_rows / solver.level_sizes[0])
        many = max(23, int(round(130 / sz)))

        def lchain(k, li=li):
            @jax.jit
            def f(levels, x):
                def body(_, xx):
                    lv = levels[li]
                    y = solver._smooth(lv, xx, xx, 1)
                    r = xx - apply_A(lv, y)
                    return r * jax.lax.rsqrt(jnp.sum(r * r) + 1e-30)
                return jax.lax.fori_loop(0, k, body, x)
            return f

        _rec(f"smooth_res_L{li}_{nl_rows}_ms", timed_chain(
            lchain, (levels, xl), min(10, many // 3), many) * 1e3)

    # coarse dense-inverse bottom
    nb = solver.level_sizes[-1]
    xb = jnp.asarray(rng.standard_normal(nb), jnp.float32)

    def cchain(k):
        @jax.jit
        def f(cdense, x):
            def body(_, xx):
                y = cdense @ xx
                return y * jax.lax.rsqrt(jnp.sum(y * y) + 1e-30)
            return jax.lax.fori_loop(0, k, body, x)
        return f

    _rec("coarse_dense_ms", timed_chain(cchain, (cdense, xb), 20, 1020) * 1e3)

    out["note"] = ("differential chains cancel tunnel dispatch; "
                   "solve_f32_wall_ms includes ~30-40 ms/dispatch tunnel "
                   "round trips")
    print(json.dumps(out, indent=2))
    art = os.path.join(os.path.dirname(__file__),
                       f"AMG_ABLATION_r05_{n_grid}.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
