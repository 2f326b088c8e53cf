"""Pallas whole-factor measure-or-reject (VERDICT r2 item 4): the
vmapped fused single-instance kernel and the batch-tiled variant vs
blockinv.spd_inverse at B=1024/n=256, on device."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
sys.path.insert(0, '/root/repo')

B, n, mm = 1024, 256, 512


@jax.jit
def gen(seed):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    P = jnp.eye(n, dtype=jnp.float32) * 0.1
    Gt = jax.random.normal(k2, (B, n, mm), jnp.float32) / np.sqrt(mm)
    d = jax.random.uniform(k3, (B, mm), jnp.float32, 0.5, 2.0)
    return P, Gt, d


def timeit(f, reps=3):
    float(jnp.sum(f(0)))
    t0 = time.time()
    for r in range(reps):
        float(jnp.sum(f(r + 1)))
    return (time.time() - t0) / reps * 1e3


def main():
    from cvxopt_tpu.ops.blockinv import spd_inverse

    @jax.jit
    def via_blockinv(seed):
        P, Gt, d = gen(seed)
        S = P + jnp.einsum('bnm,bm,bkm->bnk', Gt, d, Gt)
        return spd_inverse(S)

    print('blockinv spd_inverse:', timeit(via_blockinv), 'ms',
          flush=True)

    @jax.jit
    def via_xla(seed):
        P, Gt, d = gen(seed)
        S = P + jnp.einsum('bnm,bm,bkm->bnk', Gt, d, Gt)
        L = jnp.linalg.cholesky(S)
        import jax.scipy.linalg as jsl
        Li = jsl.solve_triangular(
            L, jnp.broadcast_to(jnp.eye(n, dtype=L.dtype),
                                L.shape), lower=True)
        return jnp.einsum('bki,bkj->bij', Li, Li)

    print('xla chol+inv:', timeit(via_xla), 'ms', flush=True)

    from cvxopt_tpu.ops import pallas_chol as pc

    @jax.jit
    def via_pallas(seed):
        P, Gt, d = gen(seed)
        L, Dinv = jax.vmap(lambda g, dd: pc.fused_schur_cholesky(
            jnp.eye(n, dtype=jnp.float32) * 0.1, g, dd))(Gt, d)
        return jnp.sum(L) + jnp.sum(Dinv)

    try:
        print('pallas vmapped fused factor:', timeit(via_pallas),
              'ms', flush=True)
    except Exception as e:
        print('pallas vmapped fused factor FAILED:', repr(e)[:300],
              flush=True)

    @jax.jit
    def via_pallas_tiled(seed):
        P, Gt, d = gen(seed)
        L, Dinv = pc.fused_schur_cholesky_batched(
            jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32) * 0.1,
                             (B, n, n)), Gt[0], d, tb=8)
        return jnp.sum(L) + jnp.sum(Dinv)

    try:
        print('pallas batch-tiled factor:', timeit(via_pallas_tiled),
              'ms', flush=True)
    except Exception as e:
        print('pallas batch-tiled FAILED:', repr(e)[:300], flush=True)


if __name__ == '__main__':
    main()
