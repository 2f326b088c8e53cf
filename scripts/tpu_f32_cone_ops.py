"""Size the win of running the SOCP phase-B cone algebra in f32:
time compute_scaling / update-path ops in f32 vs emulated f64 at the
bench shape.  (VERDICT r05 item 1 evidence.)"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

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


def _fetch(out):
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
    k = jax.random.split(jax.random.PRNGKey(seed), 2)
    s = 0.1 * jax.random.normal(k[0], (nb, m), jnp.float64)
    s = s.reshape(nb, nq, mq).at[:, :, 0].set(1.0).reshape(nb, m)
    z = 0.1 * jax.random.normal(k[1], (nb, m), jnp.float64)
    z = z.reshape(nb, nq, mq).at[:, :, 0].set(1.0).reshape(nb, m)
    return s, z


s64, z64 = gen(0)
jax.block_until_ready(s64)

for dt, tag in ((jnp.float64, 'f64'), (jnp.float32, 'f32')):
    @jax.jit
    def cs(seed, s, z):
        sp = (s * (1.0 + 1e-6 * seed)).astype(dt)
        zp = z.astype(dt)
        W, lam = jax.vmap(
            lambda a, b: nt.compute_scaling(a, b, dims))(sp, zp)
        return jax.tree_util.tree_map(
            lambda u: jnp.sum(u) if u.size else 0.0, (W, lam))

    print(f'compute_scaling {tag}: {timeit(cs, s64, z64):.1f} ms',
          flush=True)

    @jax.jit
    def chain(seed, s, z):
        # scale2 x2 + max_step x2 + sinv + sprod: the per-iteration
        # direction-algebra chain
        sp = (s * (1.0 + 1e-6 * seed)).astype(dt)
        zp = z.astype(dt)
        lam = jnp.abs(sp) + 1.0
        a = jax.vmap(lambda l, u: nt.scale2(l, u, dims))(lam, zp)
        b = jax.vmap(lambda l, u: nt.scale2(l, u, dims,
                                            inverse="I"))(lam, a)
        t = jax.vmap(lambda u: cones.max_step(u, dims))(
            jnp.stack([a, b], 1).reshape(nb * 2, m)).reshape(nb, 2)
        c = jax.vmap(lambda u, l: cones.sinv(u, l, dims))(b, lam)
        d = jax.vmap(lambda u, v: cones.sprod(u, v, dims))(c, a)
        return jnp.sum(t) + jnp.sum(d)

    print(f'direction chain {tag}: {timeit(chain, s64, z64):.1f} ms',
          flush=True)

    @jax.jit
    def upd(seed, s, z):
        sp = (s * (1.0 + 1e-6 * seed)).astype(dt)
        zp = z.astype(dt)
        W, lam = jax.vmap(
            lambda a, b: nt.compute_scaling(a, b, dims))(sp, zp)
        W2, lam2 = jax.vmap(
            lambda Wk, lk, a, b: nt.update_scaling(Wk, lk, a, b, dims)
        )(W, lam, jnp.abs(sp) + .5, jnp.abs(zp) + .5)
        return jax.tree_util.tree_map(
            lambda u: jnp.sum(u) if u.size else 0.0, (W2, lam2))

    print(f'update_scaling {tag}: {timeit(upd, s64, z64):.1f} ms',
          flush=True)
