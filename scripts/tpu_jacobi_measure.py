"""Measure batched Jacobi eigh (ops/jacobi.py) vs XLA eigh on TPU at
the SDP bench shapes (VERDICT r3 item 4).  Shapes: (count, m, m)
stacks, m in {4..64}, the 16x m=50 batched-SDP config, and the m=200
mcsdp per-iteration eigh.  Run on TPU, one process:
    python scripts/tpu_jacobi_measure.py
"""
import sys, time
import numpy as np

sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)

from cvxopt_tpu.ops import jacobi


def t_of(f, reps=5):
    float(jnp.sum(f(0)))
    t0 = time.time()
    for r in range(reps):
        float(jnp.sum(f(r + 1)))
    return (time.time() - t0) / reps * 1e3


def bench_shape(count, m, dtype=jnp.float64, sweeps=8):
    def gen(seed):
        k = jax.random.PRNGKey(seed)
        X = jax.random.normal(k, (count, m, m), dtype)
        return (X + jnp.swapaxes(X, -1, -2)) / 2 + m * jnp.eye(m, dtype=dtype)

    @jax.jit
    def xla_eigh(seed):
        w, V = jnp.linalg.eigh(gen(seed))
        return jnp.sum(w) + jnp.sum(V)

    @jax.jit
    def jac_eigh(seed):
        w, V = jacobi.eigh_jacobi(gen(seed), sweeps=sweeps)
        return jnp.sum(w) + jnp.sum(V)

    tx = t_of(xla_eigh)
    tj = t_of(jac_eigh)
    # accuracy probe
    A = gen(123)
    w1, V1 = jnp.linalg.eigh(A)
    w2, V2 = jacobi.eigh_jacobi(A, sweeps=sweeps)
    werr = float(jnp.max(jnp.abs(jnp.sort(w1, -1) - jnp.sort(w2, -1))) /
                 jnp.max(jnp.abs(w1)))
    print(f"count={count:5d} m={m:3d}: xla {tx:8.1f} ms  jacobi {tj:8.1f} ms "
          f"(x{tx/tj:4.1f})  max-rel-eig-err {werr:.2e}", flush=True)


if __name__ == '__main__':
    for count, m in [(100, 4), (1024, 4), (16, 50), (256, 16),
                     (64, 32), (16, 64), (1, 200)]:
        bench_shape(count, m)
