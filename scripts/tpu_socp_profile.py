"""Component-level timing of the SOCP cascade's per-iteration work at
the bench shape (nb x n=64 QP with 100 SOC(4) blocks): which op sets
the ~3000 aggregate it/s ceiling?

All big arrays are passed as jit ARGUMENTS (a closed-over device array
becomes a jaxpr constant and ships in the remote-compile request body —
HTTP 413 above ~100 MB).
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import jax.scipy.linalg as jsl

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import cones, scaling as nt

nb = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
n, nq, mq = 64, 100, 4
dims = ConeDims(q=(mq,) * nq)
m = dims.cdim


def _fetch(out):
    # block_until_ready does NOT sync the remote backend — fetch values
    return sum(float(np.asarray(u).ravel()[0])
               for u in jax.tree_util.tree_leaves(out)
               if np.asarray(u).size)


def timeit(f, *args, reps=5):
    _fetch(f(0, *args))
    t0 = time.time()
    for r in range(reps):
        _fetch(f(r + 1, *args))
    return (time.time() - t0) / reps * 1e3


@jax.jit
def gen(seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), nb)

    def one(k):
        kF, kq_, kG, kf, ks = jax.random.split(k, 5)
        F = jax.random.normal(kF, (n, n // 4), jnp.float64) / np.sqrt(n)
        P = F @ F.T + 0.1 * jnp.eye(n)
        G = 0.3 * jax.random.normal(kG, (m, n), jnp.float64)
        s = 0.1 * jax.random.normal(ks, (m,), jnp.float64)
        s = s.reshape(nq, mq).at[:, 0].set(1.0).reshape(-1)
        return P, G, s, s

    return jax.vmap(one)(keys)


def main():
    P, G, s, z = gen(0)
    jax.block_until_ready(P)
    fdt = jnp.float32

    @jax.jit
    def nt_update(seed, s, z):
        sp = s * (1.0 + 1e-6 * seed)
        W, lam = jax.vmap(lambda a, b: nt.compute_scaling(a, b, dims))(
            sp, z)
        return jax.tree_util.tree_map(
            lambda u: jnp.sum(u) if u.size else 0.0, (W, lam))

    print(f'nb={nb}  nt_update: {timeit(nt_update, s, z):.1f} ms',
          flush=True)

    W, lam = jax.vmap(lambda a, b: nt.compute_scaling(a, b, dims))(s, z)
    jax.block_until_ready(lam)

    @jax.jit
    def qr_f32(seed, G):
        M = (G.astype(fdt) + 1e-6 * seed)
        M2 = jnp.concatenate(
            [M, jnp.broadcast_to(jnp.eye(n, dtype=fdt), (nb, n, n))],
            axis=1)
        R = jnp.linalg.qr(M2, mode='r')
        return jnp.sum(R)

    print(f'qr_f32 (batched {m + n}x{n}): {timeit(qr_f32, G):.1f} ms',
          flush=True)

    @jax.jit
    def rinv(seed, G):
        M2 = jnp.concatenate(
            [G.astype(fdt) + 1e-6 * seed,
             jnp.broadcast_to(jnp.eye(n, dtype=fdt), (nb, n, n))],
            axis=1)
        R = jnp.linalg.qr(M2, mode='r')
        Ri = jsl.solve_triangular(
            R, jnp.broadcast_to(jnp.eye(n, dtype=fdt), R.shape[:-2]
                                + (n, n)), lower=False)
        return jnp.sum(Ri)

    print(f'qr+rinv: {timeit(rinv, G):.1f} ms', flush=True)

    # --- full cholqr factor (P eigh hoisted, as in the solver loop) --
    from cvxopt_tpu.kkt import get_kktsolver, psqrt_factor, PFactor

    Rt = jax.jit(jax.vmap(lambda Pk: psqrt_factor(Pk).Rt))(P)
    jax.block_until_ready(Rt)

    def one_factor_solve(Gk, Wk, Rtk, bx, bz):
        f = get_kktsolver('cholqr_inv', Gk, dims, jnp.zeros((0, n)),
                          factor_dtype='float32')
        sol = f(Wk, PFactor(Rtk))
        ux, uy, Wuz = sol(bx, jnp.zeros((0,)), bz)
        return jnp.sum(ux) + jnp.sum(Wuz)

    @jax.jit
    def cholqr_factor_solve(seed, G, W, Rt):
        bx = jnp.ones((nb, n)) * (1.0 + 1e-6 * seed)
        bz = jnp.ones((nb, m))
        return jnp.sum(jax.vmap(one_factor_solve)(G, W, Rt, bx, bz))

    print(f'cholqr factor+1 solve: '
          f'{timeit(cholqr_factor_solve, G, W, Rt):.1f} ms', flush=True)

    @jax.jit
    def resid_f64(seed, P, G):
        x = jnp.ones((nb, n)) * (1.0 + 1e-6 * seed)
        zq = jnp.ones((nb, m))
        rx = jnp.einsum('bij,bj->bi', P, x) \
            + jnp.einsum('bji,bj->bi', G, zq)
        rz = jnp.einsum('bij,bj->bi', G, x) - zq
        return jnp.sum(rx) + jnp.sum(rz)

    print(f"resid_f64 (P@x + G'z + G@x): "
          f"{timeit(resid_f64, P, G):.1f} ms", flush=True)

    @jax.jit
    def mstep(seed, s):
        v = s * (1.0 + 1e-6 * seed)
        return jnp.sum(jax.vmap(lambda a: cones.max_step(a, dims))(v))

    print(f'max_step: {timeit(mstep, s):.1f} ms', flush=True)

    @jax.jit
    def scale_apply(seed, s, W):
        v = s * (1.0 + 1e-6 * seed)
        a = jax.vmap(lambda u, Wk: nt.scale(u, Wk, dims, trans='T'))(
            v, W)
        b = jax.vmap(lambda u, Wk: nt.scale(u, Wk, dims,
                                            inverse='I'))(v, W)
        return jnp.sum(a) + jnp.sum(b)

    print(f'scale x2: {timeit(scale_apply, s, W):.1f} ms', flush=True)


if __name__ == '__main__':
    main()
