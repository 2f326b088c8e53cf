"""Novel-seed discriminator: are the 'fast' 45 ms chol(10240) numbers
server-request-cache artifacts?  Use seeds never issued before."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

n = 10240
NOV = int(time.time()) % 100000    # novel seed base per invocation
print("novel base:", NOV, flush=True)


@jax.jit
def gen_bench(seed):
    key = jax.random.PRNGKey(seed)
    kF, kG = jax.random.split(key)
    F = jax.random.normal(kF, (n, 256), jnp.float32)
    Gt = jax.random.normal(kG, (n, n), jnp.float32) / np.float32(np.sqrt(n))
    d = jax.random.uniform(key, (n,), jnp.float32, 0.5, 2.0)
    with jax.default_matmul_precision("high"):
        return F @ F.T + jnp.eye(n) + (Gt * d) @ Gt.T


@jax.jit
def gen_probe(seed):
    key = jax.random.PRNGKey(seed)
    F2 = jax.random.normal(key, (n, 256), jnp.float32)
    return F2 @ F2.T + n * jnp.eye(n, dtype=jnp.float32)


@jax.jit
def fchol(seed, Sm):
    return jnp.sum(jnp.linalg.cholesky(Sm.at[0, 0].add(1e-6 * seed)))


for tag, g in (("bench-mat", gen_bench), ("probe-mat", gen_probe)):
    S = g(NOV)
    jax.block_until_ready(S)
    float(np.asarray(fchol(NOV + 1, S)))          # warm/compile
    t0 = time.time()
    for r in range(3):
        float(np.asarray(fchol(NOV + 2 + r, S)))
    print(f"{tag} novel: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)
    # repeat the SAME requests (cache probe)
    t0 = time.time()
    for r in range(3):
        float(np.asarray(fchol(NOV + 2 + r, S)))
    print(f"{tag} repeat: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)
