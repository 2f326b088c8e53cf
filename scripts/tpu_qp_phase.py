"""Phase split of the QP HEADLINE config (1024 x n=256, l=2n) —
post-r05 check that the 'l'-cone cascade has no fixed-cost anomaly of
the kind that held the SOCP path at 2.4x."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.coneqp import make_coneqp_cascade

nb, n = (int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         int(sys.argv[2]) if len(sys.argv) > 2 else 256)
dims = ConeDims(l=2 * n)
solve = make_coneqp_cascade(dims, kktsolver="chol2_inv",
                            maxiters=50, abstol=1e-7, reltol=1e-7,
                            feastol=1e-7, instrument=True)
I = jnp.eye(n, dtype=jnp.float64)
G1 = jnp.concatenate([-I, I], axis=0)
h1 = jnp.concatenate([jnp.zeros(n), jnp.ones(n)])
A1 = jnp.ones((1, n), jnp.float64)
b1 = jnp.ones((1,), jnp.float64)


@jax.jit
def gen(seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), nb)

    def one(k):
        kF, kq = jax.random.split(k)
        F = jax.random.normal(kF, (n, n // 4), jnp.float64) / np.sqrt(n)
        return F @ F.T + 0.1 * I, \
            -jax.random.uniform(kq, (n,), jnp.float64, 0., .1)

    return jax.vmap(one)(keys)


def run(seed):
    P, q = gen(seed)
    out = solve(P, q, G1, h1, A1, b1)
    solved = int((np.asarray(out["status"]) == 0).sum())
    ti = int(np.asarray(out["iterations"]).sum())
    a_it = np.asarray(out["phase1_iterations"])
    b_it = np.asarray(out["iterations"]) - a_it \
        - np.asarray(out["rescue_iterations"])
    return out["profile"], solved, ti, a_it, b_it


t0 = time.time()
prof, solved, ti, a_it, b_it = run(0)
print(f"compile+first: {time.time()-t0:.1f}s {prof}", flush=True)
for r in range(2):
    t0 = time.time()
    prof, solved, ti, a_it, b_it = run(r + 1)
    dt = time.time() - t0
    print(f"chunk {r}: {dt:.2f}s solved {solved}/{nb} iters {ti} "
          f"-> {ti/dt:.0f} it/s", flush=True)
    print(f"  A: {prof['a_s']:.2f}s/{prof['a_iters']} "
          f"({a_it.mean():.1f}/inst max {a_it.max()}) "
          f"B: {prof['b_s']:.2f}s/{prof['b_iters']} "
          f"({b_it.mean():.1f}/inst max {b_it.max()}) "
          f"C: {prof['c_s']:.2f}s/{prof['c_iters']}", flush=True)
