"""Headline benchmark: matrix-free 5-point Poisson operator-chain throughput
per chip, plus secondary hardware metrics in the same JSON line's ``extra``
field: single-apply stream + measured-SoL accounting, Pallas ELL SpMV
(1M and 16M rows — the lifted-size-cap check), SpMM, 3D 256^3 apply,
ff32 V-cycle wall time, sharded-on-1-device vs unsharded V-cycle ratio,
and end-to-end AMG FD solve times (f32/ff32/PCG).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Workload (unchanged since round 1): a DEPENDENT CHAIN of stencil operator
applies ``u <- A u`` — the reference's hot loop shape (smoother/operator
sweeps, ``GeometricMultigrid/include/solvers.hpp:33-48``).  ``value`` is
effective sparse nonzeros processed per second using the reference's nnz
accounting (``linear_system.hpp:53-55``: ``nnz = N + 4 * interior``).

Baseline: 80% of the HBM roofline for an UNFUSED apply's streamed bytes
(read u + write y = 8 B/point f32) — the BASELINE.json target.  Round 1
implemented each apply as its own speed-of-light memory pass and measured
vs_baseline 0.998 (the practical ceiling of that implementation: ~654 GB/s
streaming on this v5e).  Round 2 executes the SAME chain with temporal
blocking (``ops/pallas_stencil.poisson_apply_chain``: 8 dependent applies
per HBM pass, bit-identical results, verified in tests), so the chain beats
the single-pass roofline — the baseline is kept FIXED so vs_baseline shows
the genuine speedup on the same workload.  ``extra.single_apply_nnz_per_s``
still reports the unfused per-apply stream for roofline accounting.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import time

import jax
import jax.numpy as jnp

# Per-chip HBM bandwidth (bytes/s) by platform; v5e (lite) = 819 GB/s.
HBM_BW = {
    "tpu v5 lite": 819e9,
    "tpu v5e": 819e9,
    "tpu v5": 819e9,
    "tpu v4": 1228e9,
    "tpu v6 lite": 1640e9,
    "cpu": 50e9,
}

FUSE = 8  # applies per HBM pass (ops/pallas_stencil._MAX_FUSED_APPLIES)


def device_bandwidth() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return HBM_BW["tpu v5e"] if d.platform != "cpu" else HBM_BW["cpu"]


def _fence(r) -> float:
    # Fetch a scalar to guarantee completion (block_until_ready alone is
    # not a reliable fence through the remote-dispatch tunnel).
    return float(r[(0,) * getattr(r, "ndim", 1)]) if hasattr(r, "ndim") else float(r)


def _is_transient(e: Exception) -> bool:
    """Transient tunnel/transport failures worth retrying; deterministic
    errors (shape/compile/type) re-raise immediately instead of burning
    ~30 s of retry sleeps per metric."""
    if isinstance(e, (TypeError, ValueError, AttributeError, KeyError,
                      IndexError, NotImplementedError)):
        return False
    msg = str(e).lower()
    return any(s in msg for s in (
        "response body", "closed before", "deadline", "unavailable",
        "connection", "socket", "timeout", "transport", "stream",
        "internal", "aborted", "reset",
    ))


def _retry(fn, attempts: int = 4, sleep_s: float = 10.0):
    """Re-run ``fn`` on transient failures (the remote AOT compile tunnel
    occasionally drops a response mid-body; jit caches persist across
    attempts, so a retry resumes where the compile left off)."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            if attempt == attempts - 1 or not _is_transient(e):
                raise
            time.sleep(sleep_s)


def _timed_pair(few, many, u, n_applies_delta: int, reps: int = 5) -> float:
    """Median overhead-corrected time for ``n_applies_delta`` extra applies.

    Both chains must be LONG relative to the ~40 ms tunnel dispatch jitter
    or the subtraction amplifies noise.
    """
    for attempt in range(4):  # remote AOT compile service is flaky
        try:
            _fence(few(u))
            _fence(many(u))
            break
        except Exception as e:
            if attempt == 3 or not _is_transient(e):
                raise
            time.sleep(10)
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(few(u))
        t1 = time.perf_counter()
        _fence(many(u))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    diffs.sort()
    return diffs[len(diffs) // 2]


def measure_stencil_chains(n: int, iters: int):
    """(fused_chain_nnz_per_s, single_apply_nnz_per_s)."""
    from multigrid_prj_tpu.ops.pallas_stencil import (
        poisson_apply,
        poisson_apply_chain,
    )

    alpha, h = 10.0, 10.0 / (n - 1)

    def chain_fused(k):
        @jax.jit
        def f(u):
            def body(_, xy):
                x, y = xy
                x2 = poisson_apply_chain(x, alpha, h, FUSE, dst=y)
                return x2, x

            x, _ = jax.lax.fori_loop(0, k, body, (u, jnp.zeros_like(u)))
            return x

        return f

    def chain_single(k):
        @jax.jit
        def f(u):
            def body(_, xy):
                x, y = xy
                y2 = poisson_apply(x, alpha, h, dst=y)
                return poisson_apply(y2, alpha, h, dst=x), y2

            x, _ = jax.lax.fori_loop(0, k, body, (u, jnp.zeros_like(u)))
            return x

        return f

    @jax.jit
    def make_u():
        i = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0)
        j = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1)
        return 1e-3 * jnp.sin(0.01 * i) * jnp.cos(0.013 * j)

    u = make_u()
    interior = (n - 2) ** 2
    nnz = n * n + 4 * interior

    dt_f = _timed_pair(chain_fused(12), chain_fused(12 + iters), u,
                       iters * FUSE)
    fused = nnz * (iters * FUSE) / dt_f
    dt_s = _timed_pair(chain_single(40), chain_single(40 + iters), u,
                       2 * iters)
    single = nnz * (2 * iters) / dt_s
    return fused, single, nnz


def measure_ell_spmv(n: int = 1 << 20, delta: int = 600):
    """Pallas ELL SpMV nnz/s on an n-row banded system (ops/pallas_spmv).

    Differential timing (chain of K vs K+D dependent SpMVs, subtract) so
    the ~30-40 ms tunnel dispatch latency cancels — round 1's absolute
    chain timing under-reported the kernel by including it.
    """
    import numpy as np

    from benchmarks.spmv_bench import banded_csr
    from multigrid_prj_tpu.ops.pallas_spmv import PallasELL

    A = banded_csr(n)
    interpret = jax.default_backend() == "cpu"
    pA = PallasELL.build(A, dtype=jnp.float32, interpret=interpret)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

    def chain(iters):
        # pA rides as a pytree ARGUMENT: closure capture would embed the
        # slot arrays as compile-time constants and ship them inside every
        # remote-compile request (HTTP 413 at 16M rows)
        @jax.jit
        def f(pA, x):
            # dependent chain in the padded 2D layout (how a solver inner
            # loop holds its vectors); the in-place prefix update keeps the
            # loop carry alias-friendly
            x2d = pA.pad_x(x)

            def body(_, x2d):
                y2d = pA.spmv2d(x2d)
                return jax.lax.dynamic_update_slice(x2d, y2d, (0, 0))

            return jax.lax.fori_loop(0, iters, body, x2d)

        return lambda x: f(pA, x)

    # delta=600 (~65 ms of kernel time): shorter chains measured 40-125 G
    # across runs purely from tunnel jitter
    dt = _timed_pair(chain(delta // 4), chain(delta // 4 + delta), x, delta)
    return pA.nnz_dense * delta / dt


def measure_ell_spmm(n: int = 1 << 20, nvec: int = 4, delta: int = 100):
    """Pallas ELL SpMM effective nnz/s (A streamed once per ``nvec``-vector
    block — the SpMM bandwidth win over repeated SpMV).  Dependent chain
    ``X <- unpad(A X)`` in the padded 3D layout, differential-timed."""
    import numpy as np

    from benchmarks.spmv_bench import banded_csr
    from multigrid_prj_tpu.ops.pallas_spmv import PallasELL

    A = banded_csr(n)
    interpret = jax.default_backend() == "cpu"
    pA = PallasELL.build(A, dtype=jnp.float32, interpret=interpret)
    X = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, nvec)), jnp.float32
    )

    def chain(iters):
        @jax.jit
        def f(pA, X):
            x3d = pA.pad_X(X)

            def body(_, x3d):
                y3d = pA.spmm2d(x3d)
                return jax.lax.dynamic_update_slice(x3d, y3d, (0, 0, 0))

            return jax.lax.fori_loop(0, iters, body, x3d)

        return lambda X: f(pA, X)

    dt = _timed_pair(chain(delta // 4), chain(delta // 4 + delta), X, delta)
    return pA.nnz_dense * nvec * delta / dt


def measure_stream_ceiling(n: int = 8192):
    """Measured achievable HBM stream rate (read+write GB/s) via a chained
    saxpy — the empirical speed-of-light the stencil kernels are judged
    against (the nominal 819 GB/s is not reachable by any streaming op on
    this part; round-1 measured ~650 GB/s)."""
    x = jnp.ones((n, n), jnp.float32)

    def chain(iters):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(0, iters, lambda _, v: 1.0000001 * v, x)

        return f

    dt = _timed_pair(chain(10), chain(110), x, 100)
    return 2 * 4 * n * n * 100 / dt / 1e9


def measure_spmv_16m(n: int = 16 * (1 << 20), delta: int = 30):
    """The lifted-size-cap check: a 16M-row banded SpMV must stay on the
    Pallas kernel (windowed/compact x modes) instead of the gather path."""
    from benchmarks.spmv_bench import banded_csr
    from multigrid_prj_tpu.ops.pallas_spmv import PallasELL

    A = banded_csr(n)
    pA = PallasELL.build(A, dtype=jnp.float32,
                         interpret=jax.default_backend() == "cpu",
                         nlt_step=16)
    if pA is None:
        raise ValueError("PallasELL.build returned None at 16M rows")
    import dataclasses as _dc

    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

    # schedule ladder (VERDICT r4 item 6): the full-unroll windowed kernel
    # ran 62-78 G slots/s at 1M rows but its compile request exceeded the
    # remote-compile tunnel's body limit (HTTP 413) at 16M; probe larger
    # unroll steps first and keep the biggest one that compiles — this is
    # ONE call site, so the per-site Mosaic lowering cost that forces
    # nlt_step=16 inside deep AMG cycles does not apply
    chosen = pA
    for step in (0, 64, 32, 16):
        cand = _dc.replace(pA, nlt_step=step)
        try:
            y = jax.jit(lambda p, v: p.spmv2d(v))(cand, cand.pad_x(x))
            jax.block_until_ready(y)
            chosen = cand
            break
        except Exception:
            continue
    pA = chosen

    def chain(iters):
        @jax.jit
        def f(pA, x):
            x2d = pA.pad_x(x)

            def body(_, x2d):
                y2d = pA.spmv2d(x2d)
                return jax.lax.dynamic_update_slice(x2d, y2d, (0, 0))

            return jax.lax.fori_loop(0, iters, body, x2d)

        return lambda x: f(pA, x)

    dt = _timed_pair(chain(delta // 3), chain(delta // 3 + delta), x, delta)
    return pA.nnz_dense * delta / dt, pA.nlt_step


def measure_stencil3d(n: int = 256, iters: int = 20):
    """3D 7-point Pallas apply chain nnz/s (BASELINE config 4 kernel)."""
    from multigrid_prj_tpu.ops.pallas_stencil_3d import poisson_apply_3d

    shape = (n, n, n)
    alpha, h = 1.0, 1.0 / (n - 1)

    def chain(k):
        @jax.jit
        def f(u):
            def body(_, uu):
                return poisson_apply_3d(uu, alpha, h)

            return jax.lax.fori_loop(0, k, body, u)

        return f

    @jax.jit
    def mk():
        i = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        j = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
        return 1e-3 * jnp.sin(0.01 * i) * jnp.cos(0.013 * j)

    u = mk()
    interior = (n - 2) ** 3
    nnz = n ** 3 + 6 * interior
    dt = _timed_pair(chain(8), chain(8 + iters), u, iters)
    return nnz * iters / dt


def measure_sharded_on_one(n: int = 2048):
    """Sharded GMG step on a 1-device mesh vs the unsharded padded step —
    the 'multi-chip execution keeps single-chip throughput' check (the
    sharded smoother runs the same fused Pallas kernels on its local
    shard).  Returns (sharded_ms, unsharded_ms)."""
    import numpy as np
    from jax.sharding import Mesh

    from multigrid_prj_tpu.gmg import GMGSolver
    from multigrid_prj_tpu.models.poisson import assemble_rhs
    from multigrid_prj_tpu.parallel.sharded_gmg import ShardedGMGSolver

    shape = (n, n)  # even grid: shardable AND Pallas-supported unpadded
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    sh = ShardedGMGSolver(shape=shape, mesh=mesh, num_levels=5, nu1=2, nu2=2,
                          maxit=2, tol=0.0)
    b = assemble_rhs(sh.levels[0], 10.0, test=1, dtype=jnp.float32)
    bs = jax.device_put(b, sh.sharding)
    u0 = jax.device_put(jnp.zeros_like(b), sh.sharding)

    def sh_chain(k):
        @jax.jit
        def f(u):
            def body(_, uu):
                return sh._jit_step(uu, bs)

            return jax.lax.fori_loop(0, k, body, u)

        return f

    un = GMGSolver(shape=shape, num_levels=5, cycle="v", nu=2, pre_sweeps=2,
                   tol=0.0, maxit=2)
    bu = assemble_rhs(un.levels[0], 10.0, test=1, dtype=jnp.float32)

    def un_chain(k):
        @jax.jit
        def f(u):
            def body(_, uu):
                return un.step(uu, bu)

            return jax.lax.fori_loop(0, k, body, u)

        return f

    d_sh = _timed_pair(sh_chain(5), sh_chain(25), u0, 20)
    d_un = _timed_pair(un_chain(5), un_chain(25), jnp.zeros_like(bu), 20)
    return d_sh / 20 * 1e3, d_un / 20 * 1e3


def measure_amg_fd(n_grid: int = 1024):
    """End-to-end AMG on an FD system: returns a dict of solve wall-times
    (f32 V-cycle, ff32 refined), iteration counts, and setup time.

    Tolerances are bench_fd's defaults: 1e-5 for the plain-f32 paths (the
    f32 residual floor sits near ~1e-6 at this condition number — round 3
    passed 1e-8 here, which just burned maxit) and 1e-8 for ff32."""
    from benchmarks.amg_bench import bench_fd

    rec = bench_fd(n_grid)
    # .get: one failed sub-phase (e.g. a SIGALRM cap mid-solve) must not
    # discard the phases that DID measure
    out = {"amg_fd_" + k: rec.get(src) for k, src in (
        ("rows", "rows"), ("nnz", "nnz"), ("setup_s", "setup_s"),
        ("solve_f32_ms", "solve_f32_ms"),
        ("solve_f32_iters", "solve_f32_iters"),
        ("solve_ff32_ms", "solve_ff32_ms"),
        ("solve_ff32_iters", "solve_ff32_iters"),
        ("pcg_ms", "pcg_ms"), ("smoother", "smoother"),
        ("pallas_levels", "pallas_spmv_levels"),
    ) if rec.get(src) is not None}
    for k in ("solve_f32_error", "pcg_error", "solve_ff32_error"):
        if k in rec:
            out["amg_fd_" + k] = rec[k]
    return out


class _ExtraDeadline(Exception):
    pass


@contextlib.contextmanager
def _deadline(seconds: float):
    """SIGALRM-based wall cap for one extra.  Best-effort: a signal cannot
    interrupt a single blocking C call (e.g. one long tunnel compile), but
    every measurement loop returns to Python between dispatches, so the
    common overrun (too many reps / retries) is caught.  The incremental
    ``emit`` after each extra is the hard safety net either way."""
    def handler(signum, frame):
        raise _ExtraDeadline(f"extra exceeded {seconds:.0f}s wall cap")

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, max(seconds, 1.0))
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, old)


def measure_vcycle3d(n: int = 257, tol: float = 1e-8):
    """BASELINE config 4: 257^3 7-point Poisson, mixed-precision smoothing
    (bf16 sweeps + f32 residuals/corrections), ff32 outer refinement to
    1e-8.  Returns (best_ms, iters, rel_residual)."""
    from multigrid_prj_tpu.gmg import GMGSolver
    from multigrid_prj_tpu.models.poisson import assemble_rhs

    solver = GMGSolver(shape=(n, n, n), length=1.0, alpha=1.0, num_levels=5,
                       cycle="v", nu=2, pre_sweeps=2, tol=tol, maxit=60,
                       smoother_dtype=jnp.bfloat16)
    # the registry test functions are 2D; supply a smooth 3D (f, g) pair
    b = assemble_rhs(
        solver.levels[0], 1.0, dtype=jnp.float32,
        f=lambda x, y, z: jnp.sin(3.0 * x) * jnp.cos(2.0 * y) + z,
        g=lambda x, y, z: jnp.exp(x) * jnp.exp(-2.0 * y) * z)
    out = solver.solve_refined(b)  # warmup (compile)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = solver.solve_refined(b)
        _fence(out.u)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, int(out.iterations), float(out.history[-1])


def measure_amg_mesh():
    """The reference's own FEM problem end-to-end (mesh1.msh, 6561 nodes:
    ``/root/reference/AMG/src/main.cpp:21-23``): P1 assembly + AMG-PCG."""
    from benchmarks.amg_bench import bench_mesh

    path = "/root/reference/AMG/mesh/mesh1.msh"
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    rec = bench_mesh(path)
    return {
        "amg_mesh1_rows": rec["rows"],
        "amg_mesh1_nnz": rec["nnz"],
        "amg_mesh1_setup_s": rec["setup_s"],
        "amg_mesh1_pcg_ms": rec["pcg_ms"],
        "amg_mesh1_pcg_iters": rec["pcg_iters"],
        "amg_mesh1_pcg_rel": rec["pcg_rel"],
    }


def measure_vcycle_ff32(n: int = 1025, tol: float = 1e-8):
    """Wall-clock of a full ff32-refined GMG solve to ``tol`` (BASELINE's
    second metric: V-cycle wall-time to 1e-8 on 1025^2, f32 + ff32)."""
    from multigrid_prj_tpu.gmg import GMGSolver
    from multigrid_prj_tpu.models.poisson import assemble_rhs

    solver = GMGSolver(shape=(n, n), length=10.0, alpha=10.0, num_levels=6,
                       cycle="v", nu=2, pre_sweeps=2, tol=tol, maxit=60,
                       pad_align=256)
    b = assemble_rhs(solver.levels[0], 10.0, test=1, dtype=jnp.float32)
    out = solver.solve_refined(b)  # warmup (compile)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = solver.solve_refined(b)
        _fence(out.u)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, int(out.iterations), float(out.history[-1])


def measure_dispatch_ms(reps: int = 5) -> float:
    """Null-dispatch round-trip through the backend (one jitted scale +
    scalar fetch).  On the tunnel backend this is ~40 ms — a fixed floor
    under every single-dispatch wall-clock number; reported so the
    artifact separates on-chip compute from transport latency."""
    f = jax.jit(lambda x: x * 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    _fence(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> None:
    from benchmarks import _cache

    _cache.enable()
    n = int(os.environ.get("BENCH_N", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))

    fused, single, nnz = _retry(lambda: measure_stencil_chains(n, iters))

    bytes_per_point = 8.0  # unfused f32 read + write per node per apply
    roofline_nnz_s = device_bandwidth() / bytes_per_point * (nnz / (n * n))
    baseline = 0.8 * roofline_nnz_s

    extra = {
        "single_apply_nnz_per_s": single,
        "single_apply_vs_baseline": single / baseline,
        "fused_group": FUSE,
    }

    # Regression pin (VERDICT r4 item 8): diff every numeric extra against
    # the newest committed BENCH_r*.json so a future round cannot silently
    # lose a rate this round captured.  >20% in the bad direction flags.
    prev_extra, prev_name = {}, None
    try:
        import glob

        benches = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        if benches:
            prev_name = os.path.basename(benches[-1])
            with open(benches[-1]) as fh:
                prev = json.load(fh)
            prev_extra = (prev.get("parsed") or {}).get("extra") or \
                prev.get("extra") or {}
    except Exception:
        prev_extra = {}

    def _regressions():
        regs = {}
        for k, old in prev_extra.items():
            new = extra.get(k)
            if k.startswith("t_"):  # harness wall bookkeeping, not a metric
                continue
            if not (isinstance(old, (int, float))
                    and isinstance(new, (int, float)) and old > 0):
                continue
            # direction: throughputs (per_s) regress when lower; times
            # (_ms/_s) regress when higher; other fields are not judged
            if "per_s" in k:
                if new < 0.8 * old:
                    regs[k] = {"prev": old, "now": new}
            elif k.endswith("_ms") or k.endswith("_s"):
                if new > 1.2 * old:
                    regs[k] = {"prev": old, "now": new}
        return regs

    def emit():
        # The driver parses the LAST complete JSON line: print + flush the
        # headline the moment it exists, then re-emit (enriched) after every
        # extra, so a driver kill mid-extra can never zero the artifact
        # (round 3's failure mode: one line printed only at the very end,
        # rc=124 → parsed=null).
        extra["regressions"] = _regressions()
        extra["regressions_base"] = prev_name
        print(json.dumps({
            "metric": "stencil_spmv_nnz_per_s",
            "value": fused,
            "unit": "nnz/s",
            "vs_baseline": fused / baseline,
            "extra": extra,
        }), flush=True)

    emit()

    # Secondary metrics never kill the bench (per-metric try + SIGALRM wall
    # cap) and respect a global wall budget: an overrun degrades to
    # "skipped" entries in the last emitted line, not a missing artifact.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    extra_cap_s = float(os.environ.get("BENCH_EXTRA_CAP_S", "300"))

    def run_extra(label, fn, cap=None):
        left = budget_s - (time.perf_counter() - t_start)
        if left <= 10.0:
            extra[label + "_skipped"] = "wall budget exhausted"
            emit()
            return None
        t0 = time.perf_counter()
        try:
            with _deadline(min(cap or extra_cap_s, left)):
                out = _retry(fn)
        except (KeyboardInterrupt, SystemExit):
            raise
        except BaseException as e:  # _ExtraDeadline included
            extra[label + "_error"] = str(e)[:200]
            out = None
        extra["t_" + label + "_s"] = round(time.perf_counter() - t0, 1)
        return out

    # Ordered by evidentiary value: the BASELINE wall-time metrics first,
    # raw-throughput accounting after.
    v = run_extra("dispatch", measure_dispatch_ms)
    if v is not None:
        extra["dispatch_roundtrip_ms"] = v
    v = run_extra("vcycle", measure_vcycle_ff32)
    if v is not None:
        ms, iters_v, rel = v
        extra["vcycle_1025_ff32_to_1e8_ms"] = ms
        extra["vcycle_1025_ff32_iters"] = iters_v
        extra["vcycle_1025_ff32_rel_residual"] = rel
        if "dispatch_roundtrip_ms" in extra:
            extra["vcycle_1025_ff32_compute_ms"] = (
                ms - extra["dispatch_roundtrip_ms"])
    emit()
    # ~320 s measured (host FD build + setup + 3 solve phases at 1M rows)
    v = run_extra("amg_fd", lambda: measure_amg_fd(1024), cap=420.0)
    if v is not None:
        extra.update(v)
    emit()
    v = run_extra("amg_mesh", measure_amg_mesh)
    if v is not None:
        extra.update(v)
    emit()
    v = run_extra("vcycle3d", measure_vcycle3d)
    if v is not None:
        ms, iters_v, rel = v
        extra["vcycle3d_257_bf16_ff32_to_1e8_ms"] = ms
        extra["vcycle3d_257_iters"] = iters_v
        extra["vcycle3d_257_rel_residual"] = rel
        if "dispatch_roundtrip_ms" in extra:
            extra["vcycle3d_257_compute_ms"] = (
                ms - extra["dispatch_roundtrip_ms"])
    emit()
    v = run_extra("ell_spmv", measure_ell_spmv)
    if v is not None:
        extra["ell_spmv_pallas_nnz_per_s"] = v
    emit()
    v = run_extra("stencil3d", measure_stencil3d)
    if v is not None:
        extra["stencil3d_256_apply_nnz_per_s"] = v
    emit()
    v = run_extra("stream_ceiling", measure_stream_ceiling)
    if v is not None:
        extra["measured_stream_gbs"] = v
        # the honest per-apply bar: streamed bytes at the MEASURED ceiling
        # (the nominal-bandwidth bar is not achievable by any streaming op)
        extra["single_apply_vs_measured_sol"] = (
            single / (v * 1e9 / bytes_per_point * (nnz / (n * n))))
    emit()
    v = run_extra("sharded1", measure_sharded_on_one)
    if v is not None:
        sh_ms, un_ms = v
        extra["sharded1_vcycle_2048_ms"] = sh_ms
        extra["unsharded_vcycle_2048_ms"] = un_ms
        extra["sharded1_overhead_ratio"] = sh_ms / un_ms
        # 1-device mesh: this measures shard_map dispatch overhead, not
        # halo-exchange cost (no second chip exists in this sandbox).
        extra["sharded1_note"] = "overhead-only (1-device mesh)"
    emit()
    v = run_extra("ell_spmm", measure_ell_spmm)
    if v is not None:
        extra["ell_spmm_nvec4_effective_nnz_per_s"] = v
    emit()
    v = run_extra("spmv_16m", measure_spmv_16m)
    if v is not None:
        rate, step = v
        extra["ell_spmv_16m_rows_nnz_per_s"] = rate
        extra["ell_spmv_16m_nlt_step"] = step  # 0 = full unroll
    emit()


if __name__ == "__main__":
    main()
