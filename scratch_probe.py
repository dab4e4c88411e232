import json, time, sys
import numpy as np, jax, jax.numpy as jnp
from benchmarks.spmv_bench import banded_csr
from multigrid_prj_tpu.ops.pallas_spmv import PallasELL

n = 1 << 20
A = banded_csr(n)
x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

def make_chain(pA, iters):
    @jax.jit
    def chain(x):
        x2d = pA.pad_x(x)
        def body(_, x2d):
            y2d = pA.spmv2d(x2d)
            return jax.lax.dynamic_update_slice(x2d, y2d, (0, 0))
        return jax.lax.fori_loop(0, iters, body, x2d)
    return chain

br = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
pA = PallasELL.build(A, dtype=jnp.float32, block_rows=br)
few, many = make_chain(pA, 50), make_chain(pA, 300)
print('compiling few', flush=True)
_ = float(few(x)[0,0])
print('compiling many', flush=True)
_ = float(many(x)[0,0])
diffs = []
for _ in range(5):
    t0 = time.perf_counter(); _ = float(few(x)[0,0])
    t1 = time.perf_counter(); _ = float(many(x)[0,0])
    t2 = time.perf_counter()
    diffs.append((t2-t1)-(t1-t0))
diffs.sort()
dt = diffs[2] / 250
gbs = (8*pA.nnz_dense + 4*(pA.m_pad + pA.colsT_rel.shape[1])) / dt * 1e-9
print(json.dumps({"br": br, "us_per_spmv": round(dt*1e6,1),
                  "nnz_per_s": pA.nnz_dense/dt, "gb_s": round(gbs,1)}), flush=True)
