"""Is chol(10240) on the bench matrix 1599 ms of COMPUTE or of
per-request overhead?  Chain it K times in one jit (input ships once,
compute repeats K times): compute scales with K, overhead doesn't."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from functools import partial

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

n = 10240


@jax.jit
def gen(seed):
    key = jax.random.PRNGKey(seed)
    kF, kG = jax.random.split(key)
    F = jax.random.normal(kF, (n, 256), jnp.float32)
    Gt = jax.random.normal(kG, (n, n), jnp.float32) / np.float32(np.sqrt(n))
    d = jax.random.uniform(key, (n,), jnp.float32, 0.5, 2.0)
    with jax.default_matmul_precision("high"):
        return F @ F.T + jnp.eye(n) + (Gt * d) @ Gt.T


S = gen(0)
jax.block_until_ready(S)


def chain_chol(k):
    @jax.jit
    def f(seed, Sm):
        s32 = jnp.asarray(seed, jnp.float32)

        def body(i, x):
            L = jnp.linalg.cholesky(
                Sm + (jnp.float32(1e-6) * s32
                      + jnp.float32(1e-9) * x) * jnp.eye(n))
            return (x + L[0, 0] * jnp.float32(1e-12)).astype(
                jnp.float32)
        return lax.fori_loop(0, k, body, jnp.float32(0.0))
    return f


for k in (1, 4):
    f = chain_chol(k)
    float(np.asarray(f(0, S)))
    t0 = time.time()
    for r in range(2):
        float(np.asarray(f(r + 1, S)))
    print(f"chained chol x{k}: {(time.time()-t0)/2*1e3:.0f} ms",
          flush=True)

# single direct call for reference
@jax.jit
def one(seed, Sm):
    return jnp.sum(jnp.linalg.cholesky(Sm.at[0, 0].add(1e-6 * seed)))

float(np.asarray(one(0, S)))
t0 = time.time()
for r in range(2):
    float(np.asarray(one(r + 1, S)))
print(f"direct chol: {(time.time()-t0)/2*1e3:.0f} ms", flush=True)

# in-jit generation: gen + chol in ONE request (no big arg shipped)
@jax.jit
def gen_chol(seed):
    Sm = gen(seed)
    return jnp.sum(jnp.linalg.cholesky(Sm))

float(np.asarray(gen_chol(0)))
t0 = time.time()
for r in range(2):
    float(np.asarray(gen_chol(r + 1)))
print(f"gen+chol one request: {(time.time()-t0)/2*1e3:.0f} ms",
      flush=True)
