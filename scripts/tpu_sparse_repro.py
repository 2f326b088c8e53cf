"""Reproduce/bound the r03 TPU worker crash in the block-panel banded
Cholesky (VERDICT r05 item 5).  Escalates size and precision one step
at a time with a value fetch + print after each, so the last printed
line identifies the killing op.  Run in a SUBPROCESS under timeout.

Usage: python scripts/tpu_sparse_repro.py [stage]
  stages: f32small f64small f64mid f64large solve lp
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

from cvxopt_tpu.ops.banded import pbtrf_blocked, pbtrs_blocked

stage = sys.argv[1] if len(sys.argv) > 1 else "f64small"


def band(n, kd, dtype, seed=0):
    rng = np.random.default_rng(seed)
    AB = np.zeros((kd + 1, n))
    AB[0] = 4.0 + rng.uniform(0, 1, n)
    for d in range(1, kd + 1):
        AB[d, :n - d] = rng.uniform(-0.5, 0.5, n - d)
    return jnp.asarray(AB, dtype)


def run(n, kd, dtype, cb=128):
    AB = band(n, kd, dtype)
    t0 = time.time()
    Ls, Cs = pbtrf_blocked(AB, cb=cb)
    v = float(np.asarray(Ls[0, 0, 0]))
    t1 = time.time()
    b = jnp.ones((n,), dtype)
    x = pbtrs_blocked((Ls, Cs), b)
    s = float(np.asarray(jnp.sum(x)))
    t2 = time.time()
    # residual check through dense reconstruction on a small window
    print(f"n={n} kd={kd} {dtype.__name__ if hasattr(dtype,'__name__') else dtype} cb={cb}: "
          f"factor {t1-t0:.1f}s solve {t2-t1:.1f}s L00={v:.4f} "
          f"sum={s:.4f}", flush=True)


if stage == "f32small":
    run(16384, 4, jnp.float32)
elif stage == "f64small":
    run(16384, 4, jnp.float64)
elif stage == "f64mid":
    run(65536, 4, jnp.float64)
elif stage == "f64large":
    run(131072, 4, jnp.float64)
elif stage == "solve":
    run(100352, 3, jnp.float64)
elif stage == "lp":
    # the exact bench_sparse problem through lp_sparse(method='blocked')
    import scipy.sparse as sp
    from cvxopt_tpu.ops.sparse_kkt import lp_sparse
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rng = np.random.default_rng(0)
    c = rng.standard_normal(n) * 0.1
    rows, cols, vals, h = [], [], [], []
    r = 0
    for i in range(n):
        rows += [r, r + 1]; cols += [i, i]
        vals += [-1.0, 1.0]; h += [0.0, 1.0]; r += 2
    for i in range(n - 1):
        rows += [r, r, r + 1, r + 1]
        cols += [i, i + 1, i, i + 1]
        vals += [1.0, -1.0, -1.0, 1.0]
        h += [0.5, 0.5]; r += 2
    G = sp.coo_matrix((vals, (rows, cols)), shape=(r, n)).tocsr()
    t0 = time.time()
    sol = lp_sparse(c, G, np.asarray(h), options={"maxiters": 30},
                    method="blocked")
    print(f"lp n={n}: status={sol['status']} iters={sol['iterations']} "
          f"{time.time()-t0:.1f}s gap={sol['gap']:.2e}", flush=True)
else:
    raise SystemExit(f"unknown stage {stage}")
