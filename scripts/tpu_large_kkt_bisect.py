"""Why does bench_large_kkt measure chol(10240) at 1600 ms while a
standalone probe measures 46 ms?  Replicates the stage's exact op
sequence, timing factor_xla after EVERY preceding step."""
import os
os.environ.setdefault("OMP_NUM_THREADS", "1")
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import jax.scipy.linalg as jsl

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
    Gt = jax.random.normal(kG, (n, n), jnp.float32) / np.float32(
        np.sqrt(n))
    return F, Gt


from functools import partial


@partial(jax.jit, static_argnames="prec")
def assemble(seed, F, Gt, prec="high"):
    key = jax.random.PRNGKey(seed)
    d = jax.random.uniform(key, (n,), jnp.float32, 0.5, 2.0)
    with jax.default_matmul_precision(prec):
        S = F @ F.T + jnp.eye(n) + (Gt * d) @ Gt.T
    return S


@jax.jit
def factor_xla(seed, S):
    Sp = S.at[0, 0].add(1e-6 * seed)
    return jnp.sum(jnp.linalg.cholesky(Sp))


def t_of(f, *args):
    float(jnp.sum(f(0, *args)))
    t0 = time.time()
    for r in range(3):
        float(jnp.sum(f(r + 1, *args)))
    return (time.time() - t0) / 3


F, Gt = gen(0)
jax.block_until_ready(Gt)

S = assemble(0, F, Gt, prec="high")
print(f"[1] after assemble:  chol = {t_of(factor_xla, S)*1e3:.0f} ms",
      flush=True)

t_asm = t_of(lambda s, F, Gt: assemble(s, F, Gt, prec="high"), F, Gt)
print(f"[2] assemble itself: {t_asm*1e3:.0f} ms", flush=True)
print(f"[3] chol again:      {t_of(factor_xla, S)*1e3:.0f} ms",
      flush=True)

L = jnp.linalg.cholesky(S)          # the stage's EAGER chol
_ = float(L[0, 0])
print(f"[4] after eager chol: {t_of(factor_xla, S)*1e3:.0f} ms",
      flush=True)

# fresh well-conditioned matrix like the standalone probe
@jax.jit
def gen2(seed):
    key = jax.random.PRNGKey(seed)
    F2 = jax.random.normal(key, (n, 256), jnp.float32)
    return F2 @ F2.T + n * jnp.eye(n, dtype=jnp.float32)


S2 = gen2(0)
jax.block_until_ready(S2)
print(f"[5] probe-style S2:  {t_of(factor_xla, S2)*1e3:.0f} ms",
      flush=True)
print(f"[6] bench S again:   {t_of(factor_xla, S)*1e3:.0f} ms",
      flush=True)
