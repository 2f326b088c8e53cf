"""SDP per-iteration accounting (VERDICT r05 item 2): attribute the
mcsdp m=200 iter_ms >= 90% by chained in-jit timing of every component
the conelp 's' iteration calls (naive one-shot timing measures the
~25 ms tunnel round trip instead — r05 finding).

Components per conelp 's' iteration (conelp._iteration):
  1x compute/update_scaling  (gram_eigh_accurate of 200x200)
  1x max_step (predictor, stacked pair -> one eigh_accurate)
  1x max_step_eig (corrector, stacked pair -> one eigh_accurate)
  1x kkt factor (chol2 adaptive: f32 probe + f64 accurate-eigh branch)
  4x kkt solve (predictor + corrector, refinement=1 -> 2 each)
  ~8x scale ('s': r'Xr matmuls), sprod, sinv etc. in f64
  outer residuals (mv path)
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
from cvxopt_tpu.ops.jacobi import eigh_accurate, gram_eigh_accurate

m = int(sys.argv[1]) if len(sys.argv) > 1 else 200
which = sys.argv[2] if len(sys.argv) > 2 else "all"
dims = ConeDims(s=(m,))
K = 8


def timeit_chain(make_step, init_args, tag, reps=3, k=K):
    def runner(kk):
        @jax.jit
        def f(seed, *args):
            x0 = jnp.asarray(1.0 + 1e-9 * seed, jnp.float64)
            return lax.fori_loop(
                0, kk, lambda i, x: make_step(x, args, i), x0)
        return f

    fs = {kk: runner(kk) for kk in (1, k)}
    out = {}
    for kk, f in fs.items():
        float(np.asarray(f(0, *init_args)))
        t0 = time.time()
        for r in range(reps):
            float(np.asarray(f(r + 1, *init_args)))
        out[kk] = (time.time() - t0) / reps
    per = (out[k] - out[1]) / (k - 1) * 1e3
    print(f"{tag}: {per:.1f} ms/op  (T1={out[1]*1e3:.0f} ms)",
          flush=True)
    return per


@jax.jit
def gen(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    A = jax.random.normal(k1, (m, m), jnp.float64) / np.sqrt(m)
    S = A @ A.T + jnp.eye(m)
    Z = jnp.eye(m) * 2.0 + 0.1 * (A + A.T)
    return S.reshape(-1), Z.reshape(-1)


s0, z0 = gen(0)
jax.block_until_ready(s0)

if which in ("all", "eigh"):
    # eigh_accurate on the stacked pair (as max_step_eig calls it)
    def eig_step(x, args, i):
        S = args[0].reshape(m, m) * (1.0 + 1e-12 * x)
        w, V = eigh_accurate(jnp.stack([S, S + 0.01 * jnp.eye(m)]))
        return x + jnp.mean(w) * 1e-9

    timeit_chain(eig_step, (s0,), "eigh_accurate f64 (2,200,200)")

    def eig32_step(x, args, i):
        S = (args[0].reshape(m, m) * (1.0 + 1e-12 * x)).astype(
            jnp.float32)
        w, V = jnp.linalg.eigh(jnp.stack([S, S + 0.01 * jnp.eye(
            m, dtype=jnp.float32)]))
        return x + jnp.mean(w.astype(jnp.float64)) * 1e-9

    timeit_chain(eig32_step, (s0,), "xla eigh f32 (2,200,200)")

    def eig64_step(x, args, i):
        S = args[0].reshape(m, m) * (1.0 + 1e-12 * x)
        w, V = jnp.linalg.eigh(jnp.stack([S, S + 0.01 * jnp.eye(m)]))
        return x + jnp.mean(w) * 1e-9

    timeit_chain(eig64_step, (s0,), "xla eigh f64 (2,200,200)")

if which in ("all", "nt"):
    def nt_step(x, args, i):
        s_, z_ = args
        W, lam = nt.compute_scaling(s_ * (1.0 + 1e-12 * x), z_, dims)
        return x + jnp.mean(lam) * 1e-9

    timeit_chain(nt_step, (s0, z0), "compute_scaling 's' f64")

    def sc_step(x, args, i):
        s_, z_ = args
        W, lam = nt.compute_scaling(s_, z_, dims)
        a = nt.scale(s_ * (1.0 + 1e-12 * x), W, dims, trans="T")
        b_ = nt.scale(a, W, dims, inverse="I")
        c_ = cones.sprod(b_, a, dims)
        return x + jnp.mean(c_) * 1e-9
    # NOTE: compute_scaling recomputed inside — subtract nt_step
    timeit_chain(sc_step, (s0, z0), "scale x2 + sprod 's' (+1x cs)")

if which in ("all", "kkt"):
    from cvxopt_tpu import kkt as kktmod
    G = np.zeros((m * m, m))
    for j in range(m):
        G[j * m + j, j] = -1.0
    Gj = jnp.asarray(G)
    A0 = jnp.zeros((0, m), jnp.float64)
    c = jnp.ones((m,), jnp.float64)
    fac_ad = kktmod.get_kktsolver("chol2", Gj, dims, A0,
                                  factor_dtype="adaptive")
    fac_32 = kktmod.get_kktsolver("chol2", Gj, dims, A0,
                                  factor_dtype="float32")

    import jax.scipy.linalg as jsl

    def mkW(s_):
        S = s_.reshape(m, m)
        L = jnp.linalg.cholesky(S)
        Li = jsl.solve_triangular(L, jnp.eye(m, dtype=L.dtype),
                                  lower=True)
        return {"d": jnp.zeros((0,)), "di": jnp.zeros((0,)),
                "beta": [], "v": [], "r": [L[None]],
                "rti": [Li.T[None]]}

    def fs_step_of(fac):
        def fs_step(x, args, i):
            W = mkW(args[0] * (1.0 + 1e-12 * x))
            sol = fac(W)
            ux, uy, Wuz = sol(c, jnp.zeros((0,)), args[1])
            return x + jnp.mean(ux) * 1e-9
        return fs_step

    timeit_chain(fs_step_of(fac_ad), (s0, z0),
                 "kkt chol2 adaptive factor+1solve")
    timeit_chain(fs_step_of(fac_32), (s0, z0),
                 "kkt chol2 f32 factor+1solve")
