"""SOC cascade batch-width scaling + 10k-scenario measurement (run on
TPU, one process at a time).  Usage: python scripts/tpu_socp_scale.py
[nb ...]; default sweeps 256 1024 2048 then a chunked 10240."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.coneqp import make_coneqp_cascade

n, nq, mq = 64, 100, 4
dims = ConeDims(q=(mq,) * nq)
m = dims.cdim


def run_width(nb, chunks=1):
    solve = make_coneqp_cascade(dims, kktsolver='chol2_inv',
                                maxiters=50, abstol=1e-7, reltol=1e-7,
                                feastol=1e-7, shared_GhAb=False)

    @jax.jit
    def gen(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nb)

        def one(k):
            kF, kq_, kG, kf = jax.random.split(k, 4)
            F = jax.random.normal(kF, (n, n // 4), jnp.float64) / np.sqrt(n)
            P = F @ F.T + 0.1 * jnp.eye(n)
            q = -jax.random.uniform(kq_, (n,), jnp.float64, 0., .1)
            G = 0.3 * jax.random.normal(kG, (m, n), jnp.float64)
            f = 0.1 * jax.random.normal(kf, (m,), jnp.float64)
            h = f.reshape(nq, mq).at[:, 0].set(1.0).reshape(-1)
            return P, q, G, h

        return jax.vmap(one)(keys)

    A = jnp.zeros((nb, 0, n))
    b = jnp.zeros((nb, 0))
    P, q, G, h = gen(1)
    _ = float(jnp.sum(h))
    t0 = time.time()
    out = solve(P, q, G, h, A, b)
    _ = np.asarray(out['status'])
    compile_s = time.time() - t0
    ti = solved = resc = 0
    mx = 0
    t0 = time.time()
    for r in range(chunks):
        tc = time.time()
        P, q, G, h = gen(r + 2)
        out = solve(P, q, G, h, A, b)
        st = np.asarray(out['status'])
        it = np.asarray(out['iterations'])
        rc = int(np.asarray(out['rescue_iterations']).sum())
        resc += rc
        solved += int((st == 0).sum())
        ti += int(it.sum())
        mx = max(mx, int(it.max()))
        if chunks > 1:
            print(f'  chunk {r}: {time.time()-tc:.2f}s rescue={rc}',
                  flush=True)
    dt = time.time() - t0
    print(f'nb={nb} chunks={chunks}: {dt:.2f}s total, iters {ti} '
          f'(max/inst {mx}), rescue {resc}, solved {solved}/{nb*chunks}, '
          f'aggregate {ti/dt:.0f} it/s, compile {compile_s:.0f}s',
          flush=True)
    return ti / dt


if __name__ == '__main__':
    widths = [int(a) for a in sys.argv[1:]] or [256, 1024, 2048]
    for nb_ in widths:
        run_width(nb_)
    # the 10k-scenario configuration: 5 chunks of 2048
    run_width(2048, chunks=5)
