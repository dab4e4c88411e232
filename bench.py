"""Headline benchmark: matrix-free 5-point Poisson SpMV throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: effective sparse nonzeros processed per second by the stencil
operator apply (the reference's nnz accounting, ``linear_system.hpp:53-55``:
``nnz = N + 4 * interior``).  Baseline = 80% of the HBM roofline for the
op's streamed bytes (read u + write y, 8 B/point in f32), the target set in
BASELINE.json.
"""

from __future__ import annotations

import json
import os
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


def device_bandwidth() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return HBM_BW["tpu v5e"] if d.platform != "cpu" else HBM_BW["cpu"]


def main() -> None:
    # Pallas fused stencil kernel on aligned shapes; falls back to the XLA
    # path automatically elsewhere (ops/pallas_stencil.py).
    from multigrid_prj_tpu.ops.pallas_stencil import poisson_apply

    n = int(os.environ.get("BENCH_N", "8192"))  # 8192 x 8192 f32 (aligned)
    iters = int(os.environ.get("BENCH_ITERS", "100"))  # pairs of applies
    alpha, h = 10.0, 10.0 / (n - 1)

    def chain(k):
        """k pairs of applies, ping-ponging two buffers (dst=) so the loop
        carry needs no defensive copies — measured 2x on v5e."""

        @jax.jit
        def f(u):
            def body(_, xy):
                x, y = xy
                y2 = poisson_apply(x, alpha, h, dst=y)
                return poisson_apply(y2, alpha, h, dst=x), y2

            x, _ = jax.lax.fori_loop(0, k, body, (u, jnp.zeros_like(u)))
            return x

        return f

    # Both chains must be LONG relative to the ~40 ms tunnel dispatch jitter
    # or the subtraction amplifies noise (a short few-chain once produced an
    # above-HBM-peak reading).  40 vs 40+iters pairs, median of the diffs.
    few, many = chain(40), chain(40 + iters)  # iters pairs = 2*iters applies

    @jax.jit
    def make_u():
        # Generate on device: pushing 256 MB through the remote-dispatch
        # tunnel is slow and flaky.
        i = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0)
        j = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1)
        return jnp.sin(0.01 * i) * jnp.cos(0.013 * j)

    u = make_u()

    def run(f):
        # Fetch a scalar to guarantee completion (block_until_ready alone is
        # not a reliable fence through the remote-dispatch tunnel).
        r = f(u)
        _ = float(r[0, 0])

    # The remote AOT compile service is occasionally flaky; retry warmup.
    for attempt in range(4):
        try:
            run(few)
            run(many)
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(10)

    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        run(few)
        t1 = time.perf_counter()
        run(many)
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))  # overhead-corrected
    diffs.sort()
    dt = diffs[len(diffs) // 2]  # median: robust to dispatch jitter

    interior = (n - 2) ** 2
    nnz = n * n + 4 * interior  # reference nnz accounting
    value = nnz * (2 * iters) / dt  # chain(k) runs 2k applies

    bytes_per_point = 8.0  # f32 read + write per node per apply
    roofline_nnz_s = device_bandwidth() / bytes_per_point * (nnz / (n * n))
    baseline = 0.8 * roofline_nnz_s

    print(
        json.dumps(
            {
                "metric": "stencil_spmv_nnz_per_s",
                "value": value,
                "unit": "nnz/s",
                "vs_baseline": value / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
