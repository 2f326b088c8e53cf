"""How to compute the phase-B f64 batched residual matvecs fast on a
TPU whose f64 is emulated.  Shapes from the SOCP bench family:
P (nb,64,64), G (nb,400,64), vectors f64.

Variants:
  f64_einsum     the current path (XLA-emulated f64 dot_general)
  f64_mulsum     elementwise f64 multiply + reduce
  f32_highest    plain f32 'highest' matvec (accuracy floor reference)
  ff_split       float-float: A = Ahi+Alo, x split likewise; the 3
                 cross products as f32 'highest' matvecs accumulated
                 in f64 (error ~ eps_f32^2 * n + eps_f32 * |Alo x| —
                 i.e. f64-class for the residual's purpose)
Accuracy is reported vs a numpy f64 reference.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)

nb, m, n = 2048, 400, 64


def fetch(x):
    if isinstance(x, tuple):
        x = x[0]
    return float(np.asarray(x).ravel()[0])


def timeit(f, *args, reps=5):
    fetch(f(0, *args))
    t0 = time.time()
    for r in range(reps):
        fetch(f(r + 1, *args))
    return (time.time() - t0) / reps * 1e3


@jax.jit
def gen(seed):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    G = jax.random.normal(k1, (nb, m, n), jnp.float64)
    x = jax.random.normal(k2, (nb, n), jnp.float64)
    z = jax.random.normal(k3, (nb, m), jnp.float64)
    return G, x, z


def split_ff(a):
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def main():
    G, x, z = gen(0)
    jax.block_until_ready(G)

    @jax.jit
    def f64_einsum(seed, G, x, z):
        xp = x * (1.0 + 1e-9 * seed)
        a = jnp.einsum('bij,bj->bi', G, xp)
        b = jnp.einsum('bji,bj->bi', G, z)
        return jnp.sum(a) + jnp.sum(b), a, b

    @jax.jit
    def f64_mulsum(seed, G, x, z):
        xp = x * (1.0 + 1e-9 * seed)
        a = jnp.sum(G * xp[:, None, :], axis=2)
        b = jnp.sum(G * z[:, :, None], axis=1)
        return jnp.sum(a) + jnp.sum(b), a, b

    @jax.jit
    def f32_highest(seed, G, x, z):
        xp = (x * (1.0 + 1e-9 * seed)).astype(jnp.float32)
        G32 = G.astype(jnp.float32)
        a = jnp.einsum('bij,bj->bi', G32, xp)
        b = jnp.einsum('bji,bj->bi', G32, z.astype(jnp.float32))
        return jnp.sum(a) + jnp.sum(b), a, b

    @jax.jit
    def ff_split(seed, G, x, z):
        xp = x * (1.0 + 1e-9 * seed)
        Gh, Gl = split_ff(G)
        xh, xl = split_ff(xp)
        zh, zl = split_ff(z)

        def mv(e, Ah, Al, vh, vl):
            t0 = jnp.einsum(e, Ah, vh).astype(jnp.float64)
            t1 = jnp.einsum(e, Ah, vl).astype(jnp.float64)
            t2 = jnp.einsum(e, Al, vh).astype(jnp.float64)
            return t0 + (t1 + t2)

        a = mv('bij,bj->bi', Gh, Gl, xh, xl)
        b = mv('bji,bj->bi', Gh, Gl, zh, zl)
        return jnp.sum(a) + jnp.sum(b), a, b

    Gn, xn, zn = (np.asarray(u) for u in (G, x, z))
    ra = np.einsum('bij,bj->bi', Gn, xn * (1.0 + 1e-9))
    rb = np.einsum('bji,bj->bi', Gn, zn)

    for name, f in [('f64_einsum', f64_einsum),
                    ('f64_mulsum', f64_mulsum),
                    ('f32_highest', f32_highest),
                    ('ff_split', ff_split)]:
        try:
            t = timeit(f, G, x, z)
            _, a, b = f(1, G, x, z)
            ea = float(np.max(np.abs(np.asarray(a) - ra))
                       / np.max(np.abs(ra)))
            eb = float(np.max(np.abs(np.asarray(b) - rb))
                       / np.max(np.abs(rb)))
            print(f'{name:12s}: {t:8.1f} ms   relerr {ea:.1e} / {eb:.1e}',
                  flush=True)
        except Exception as e:
            print(f'{name:12s}: FAILED {repr(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
