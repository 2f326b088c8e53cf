"""TRUE per-op costs on the remote TPU: run each op K times inside
one jit via lax.fori_loop (data-dependent chaining), fetch ONE scalar,
subtract the K=1 time and divide.  The naive one-call timing measures
the ~25 ms request round trip, not the op (r05 finding).

Usage: python scripts/tpu_op_chain.py [nb]
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import cones, scaling as nt

nb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
n, nq, mq = 64, 100, 4
dims = ConeDims(q=(mq,) * nq)
m = dims.cdim
K = 16


def timeit_chain(make_step, init_args, reps=3, tag=""):
    """make_step(x, aux) -> x' ; returns per-op ms via (T(K)-T(1))/(K-1)."""
    def runner(k):
        @jax.jit
        def f(seed, *args):
            x0 = jnp.asarray(1.0 + 1e-9 * seed, args[1].dtype)
            xk = lax.fori_loop(
                0, k, lambda i, x: make_step(x, args, i), x0)
            return xk
        return f

    fs = {k: runner(k) for k in (1, K)}
    out = {}
    for k, f in fs.items():
        float(np.asarray(f(0, *init_args)))          # compile+warm
        t0 = time.time()
        for r in range(reps):
            float(np.asarray(f(r + 1, *init_args)))
        out[k] = (time.time() - t0) / reps
    per = (out[K] - out[1]) / (K - 1) * 1e3
    print(f"{tag}: {per:.2f} ms/op   (T1={out[1]*1e3:.1f} ms)",
          flush=True)
    return per


@jax.jit
def gen(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    s = 0.1 * jax.random.normal(k[0], (nb, m), jnp.float64)
    s = s.reshape(nb, nq, mq).at[:, :, 0].set(1.0).reshape(nb, m)
    z = 0.1 * jax.random.normal(k[1], (nb, m), jnp.float64)
    z = z.reshape(nb, nq, mq).at[:, :, 0].set(1.0).reshape(nb, m)
    G = 0.3 * jax.random.normal(k[2], (nb, m, n), jnp.float64)
    return s, z, G


s64, z64, G64 = gen(0)
s32, z32, G32 = (u.astype(jnp.float32) for u in (s64, z64, G64))
jax.block_until_ready(G64)

for tag, s_, z_, G_ in (("f64", s64, z64, G64), ("f32", s32, z32, G32)):
    # NT compute_scaling: s',z' -> W,lam ; chain via lam-dependent bump
    def cs_step(x, args, i):
        s_a, z_a = args[1], args[2]
        W, lam = jax.vmap(
            lambda a, b: nt.compute_scaling(a, b, dims))(
            s_a * (1.0 + 1e-12 * x), z_a)
        return x + jnp.mean(lam) * 1e-9

    timeit_chain(cs_step, (None, jnp.abs(s_) + .5, jnp.abs(z_) + .5),
                 tag=f"compute_scaling {tag}")

    # scale2 pair
    def s2_step(x, args, i):
        lam, u = args[1], args[2]
        a = jax.vmap(lambda l, v: nt.scale2(l, v, dims))(
            lam * (1.0 + 1e-12 * x), u)
        b = jax.vmap(lambda l, v: nt.scale2(l, v, dims,
                                            inverse="I"))(lam, a)
        return x + jnp.mean(b) * 1e-9

    timeit_chain(s2_step, (None, jnp.abs(s_) + .5, z_),
                 tag=f"scale2 x2 {tag}")

    # max_step (stacked pair, as the solver calls it)
    def ms_step(x, args, i):
        u = args[1]
        t = jax.vmap(lambda v: cones.max_step(v, dims))(
            u * (1.0 + 1e-12 * x))
        return x + jnp.mean(t) * 1e-9

    timeit_chain(ms_step, (None, jnp.concatenate([s_, z_], 0)),
                 tag=f"max_step(2nb) {tag}")

    # residual pair via mv/mvt fast path
    from cvxopt_tpu.ops.matvec import mv, mvt

    def rs_step(x, args, i):
        G_a, z_a = args[1], args[2]
        gz = mvt(G_a, z_a * (1.0 + 1e-12 * x))
        gx = mv(G_a, jnp.pad(gz, ((0, 0), (0, m - n)))[:, :n])
        return x + jnp.mean(gx) * 1e-9

    timeit_chain(rs_step, (None, G_, z_),
                 tag=f"G'z+Gx mv-path {tag}")

    # norms: snrm2 + 2x jnp.linalg.norm
    def nm_step(x, args, i):
        u = args[1]
        a = jax.vmap(lambda v: cones.snrm2(v, dims))(
            u * (1.0 + 1e-12 * x))
        c = jnp.linalg.norm(u, axis=-1)
        return x + (jnp.mean(a) + jnp.mean(c)) * 1e-9

    timeit_chain(nm_step, (None, z_),
                 tag=f"snrm2+norm {tag}")

# factor kernels f32
def qr_step(x, args, i):
    G_a = args[1]
    M = jnp.concatenate(
        [G_a * (1.0 + 1e-12 * x),
         jnp.broadcast_to(jnp.eye(n, dtype=G_a.dtype), (nb, n, n))], 1)
    R = jnp.linalg.qr(M, mode="r")
    return x + jnp.mean(R[:, 0]) * 1e-9


timeit_chain(qr_step, (None, G32),
             tag="qr(464x64) f32")


def chol_step(x, args, i):
    G_a = args[1]
    S = jnp.einsum("bij,bkj->bik", G_a + 1e-12 * jnp.mean(x), G_a) \
        + 10.0 * jnp.eye(n, dtype=G_a.dtype)
    L = jnp.linalg.cholesky(S[:, :n, :n] if S.shape[1] >= n else S)
    return x + jnp.mean(L[:, 0]) * 1e-9


def chol_step2(x, args, i):
    G_a = args[1]                                    # (nb, m, n)
    S = jnp.einsum("bji,bjk->bik", G_a * (1.0 + 1e-12 * x), G_a) \
        + 10.0 * jnp.eye(n, dtype=G_a.dtype)
    L = jnp.linalg.cholesky(S)
    return x + jnp.mean(L[:, 0]) * 1e-9


timeit_chain(chol_step2, (None, G32),
             tag="syrk+chol(64) f32")
