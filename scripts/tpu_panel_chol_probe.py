"""Where does panel_cholesky's time go at n=10240 f32?  Chained
timings of its pieces + panel-size scan (VERDICT r05 item 3)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

from cvxopt_tpu.ops.blockinv import panel_cholesky, tri_inverse_lower

n = 10240
which = sys.argv[1] if len(sys.argv) > 1 else "pieces"


@jax.jit
def gen(seed):
    key = jax.random.PRNGKey(seed)
    F = jax.random.normal(key, (n, 256), jnp.float32)
    return F @ F.T + n * jnp.eye(n, dtype=jnp.float32)


S = gen(0)
jax.block_until_ready(S)


def chain(step, tag, K=8, reps=2):
    def runner(k):
        @jax.jit
        def f(seed, Sm):
            x0 = jnp.asarray(1.0 + 1e-9 * seed, jnp.float32)
            return lax.fori_loop(0, k, lambda i, x: step(x, Sm), x0)
        return f

    out = {}
    for k, f in ((1, runner(1)), (K, runner(K))):
        float(np.asarray(f(0, S)))
        t0 = time.time()
        for r in range(reps):
            float(np.asarray(f(r + 1, S)))
        out[k] = (time.time() - t0) / reps
    per = (out[K] - out[1]) / (K - 1) * 1e3
    print(f"{tag}: {per:.1f} ms  (T1={out[1]*1e3:.0f})", flush=True)


if which == "pieces":
    t = 512

    def chol_p(x, Sm):
        L = jnp.linalg.cholesky(Sm[:t, :t] * (1.0 + 1e-12 * x))
        return x + L[0, 0] * 1e-12

    chain(chol_p, f"chol({t})")

    def tri_p(x, Sm):
        L = jnp.linalg.cholesky(Sm[:t, :t])
        Li = tri_inverse_lower(L * (1.0 + 1e-12 * x))
        return x + Li[0, 0] * 1e-12

    chain(tri_p, f"chol+tri_inverse({t})")

    def trs_p(x, Sm):
        L = jnp.linalg.cholesky(Sm[:t, :t])
        X = jsl.solve_triangular(L * (1.0 + 1e-12 * x),
                                 Sm[:t, t:2 * t], lower=True)
        return x + X[0, 0] * 1e-12

    chain(trs_p, f"chol+solve_tri({t},{t}rhs)")

    def gemm_p(x, Sm):
        A21 = Sm[t:, :t] * (1.0 + 1e-12 * x)
        U = A21 @ A21.T                      # (n-t, n-t) syrk
        return x + U[0, 0] * 1e-12

    chain(gemm_p, f"syrk (n-{t})x{t}", K=4)

    def upd_p(x, Sm):
        A21 = Sm[t:, :t]
        Sm2 = Sm.at[t:, t:].add(-(A21 @ A21.T) * (1e-12 * x))
        return x + Sm2[0, 0] * 1e-12

    chain(upd_p, "syrk+scatter-add", K=4)
else:
    for t in (1024, 2048):
        @jax.jit
        def f(seed, Sm, t=t):
            L = panel_cholesky(Sm * (1.0 + 1e-9 * seed), panel=t)
            return L[0, 0]
        float(np.asarray(f(0, S)))
        t0 = time.time()
        for r in range(2):
            float(np.asarray(f(r + 1, S)))
        print(f"panel_cholesky(panel={t}): "
              f"{(time.time()-t0)/2*1e3:.0f} ms", flush=True)

if which == "cholscan":
    for t in (512, 1024, 2048, 2560, 5120):
        def chol_t(x, Sm, t=t):
            L = jnp.linalg.cholesky(Sm[:t, :t] * (1.0 + 1e-12 * x))
            return x + L[0, 0] * 1e-12
        chain(chol_t, f"chol({t})", K=4)

if which == "real":
    from cvxopt_tpu.ops.blockinv import blocked_cholesky
    for tag, fn in (
        ("panel512", lambda Sp: panel_cholesky(Sp, panel=512)),
        ("panel1024", lambda Sp: panel_cholesky(Sp, panel=1024)),
        ("panel2048", lambda Sp: panel_cholesky(Sp, panel=2048)),
        ("xla", jnp.linalg.cholesky),
        ("blocked2560", lambda Sp: blocked_cholesky(Sp, block=2560)),
    ):
        @jax.jit
        def f(seed, Sm, fn=fn):
            Sp = Sm.at[0, 0].add(1e-6 * seed)
            return jnp.sum(fn(Sp))          # full-output dependence
        float(np.asarray(f(0, S)))
        t0 = time.time()
        for r in range(3):
            float(np.asarray(f(r + 1, S)))
        print(f"{tag}: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)

if which == "benchmat":
    # the EXACT bench_large_kkt matrix: is the 1603-vs-52 ms gap
    # matrix-dependent?
    @jax.jit
    def genb(seed):
        key = jax.random.PRNGKey(seed)
        kF, kG = jax.random.split(key)
        F = jax.random.normal(kF, (n, 256), jnp.float32)
        Gt = jax.random.normal(kG, (n, n), jnp.float32) / np.float32(
            np.sqrt(n))
        d = jax.random.uniform(key, (n,), jnp.float32, 0.5, 2.0)
        with jax.default_matmul_precision("high"):
            return F @ F.T + jnp.eye(n, dtype=jnp.float32) \
                + (Gt * d) @ Gt.T

    Sb = genb(0)
    jax.block_until_ready(Sb)
    from cvxopt_tpu.ops.blockinv import blocked_cholesky
    for tag, fn in (
        ("xla(benchS)", jnp.linalg.cholesky),
        ("panel1024(benchS)",
         lambda Sp: panel_cholesky(Sp, panel=1024)),
        ("blocked2560(benchS)",
         lambda Sp: blocked_cholesky(Sp, block=2560)),
    ):
        @jax.jit
        def f(seed, Sm, fn=fn):
            Sp = Sm.at[0, 0].add(1e-6 * seed)
            return jnp.sum(fn(Sp))
        float(np.asarray(f(0, Sb)))
        t0 = time.time()
        for r in range(3):
            float(np.asarray(f(r + 1, Sb)))
        print(f"{tag}: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)
