"""int16 relative-column ablation for the ELL SpMV kernel."""
import functools, json, time, sys
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from benchmarks.spmv_bench import banded_csr
from multigrid_prj_tpu.ops.pallas_spmv import PallasELL, _LANE

def _kern_i16(base2_ref, cols_ref, vals_ref, x_ref, o_ref, *, k, r, t_win):
    i = pl.program_id(0)
    nlt = r // _LANE
    for j in range(nlt):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        idx = cols_ref[:, sl].astype(jnp.int32)
        hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
        lo = jax.lax.bitwise_and(idx, jnp.int32(127))
        base = base2_ref[i * nlt + j]
        win = x_ref[pl.ds(base, 8), :]
        g = jnp.zeros((k, _LANE), x_ref.dtype)
        for t in range(t_win):
            src = jnp.broadcast_to(win[t, :][None, :], (k, _LANE))
            g = jnp.where(hi == t, jnp.take_along_axis(src, lo, axis=1), g)
        o_ref[j, :] = jnp.sum(vals_ref[:, sl] * g, axis=0)

def spmv16(pA, cols16, x2d):
    k_pad, n_pad = cols16.shape
    r = pA.block_rows
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
        functools.partial(_kern_i16, k=k_pad, r=r, t_win=pA.t_win),
        out_shape=jax.ShapeDtypeStruct((nb * nlt, _LANE), pA.valsT.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * k_pad * n_pad,
            bytes_accessed=6 * k_pad * n_pad + 4 * (pA.m_pad + n_pad),
            transcendentals=0),
    )(pA.base2, cols16, pA.valsT, x2d)

n = 1 << 20
A = banded_csr(n)
x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
br = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
pA = PallasELL.build(A, dtype=jnp.float32, block_rows=br)
cols16 = jnp.asarray(np.asarray(pA.colsT_rel).astype(np.int16))

# correctness
y16 = np.asarray(spmv16(pA, cols16, jax.jit(pA.pad_x)(x))).reshape(-1)[:n]
y32 = np.asarray(pA.spmv(x))
err = np.abs(y16 - y32).max()
print(json.dumps({"check_i16_vs_i32_max_diff": float(err)}), flush=True)
assert err == 0.0

def make_chain(iters):
    @jax.jit
    def chain(x):
        x2d = pA.pad_x(x)
        def body(_, x2d):
            y2d = spmv16(pA, cols16, x2d)
            return jax.lax.dynamic_update_slice(x2d, y2d, (0, 0))
        return jax.lax.fori_loop(0, iters, body, x2d)
    return chain

few, many = make_chain(50), make_chain(300)
print('compiling', flush=True)
_ = float(few(x)[0,0]); _ = float(many(x)[0,0])
diffs = []
for _ in range(5):
    t0 = time.perf_counter(); _ = float(few(x)[0,0])
    t1 = time.perf_counter(); _ = float(many(x)[0,0])
    t2 = time.perf_counter()
    diffs.append((t2-t1)-(t1-t0))
diffs.sort()
dt = diffs[2] / 250
gbs = (6*pA.nnz_dense + 4*(pA.m_pad + pA.colsT_rel.shape[1])) / dt * 1e-9
print(json.dumps({"variant": "i16cols", "br": br, "us_per_spmv": round(dt*1e6,1),
                  "nnz_per_s": pA.nnz_dense/dt, "gb_s_effective": round(gbs,1)}), flush=True)
