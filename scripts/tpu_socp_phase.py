"""Phase-level wall-time split of the SOCP bench config (VERDICT r04
item 1): where do the 2.2 s/batch-iteration go — phase A (pure f32),
phase B (f64 residuals + f32 cholqr factor), or phase C rescue?

Runs the EXACT bench_socp problem family through
make_coneqp_cascade(instrument=True).  Usage:
    python scripts/tpu_socp_phase.py [nb] [chunks]
"""
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

nb = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 2
p1tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
n, nq, mq = 64, 100, 4
dims = ConeDims(q=(mq,) * nq)
m = dims.cdim

solve = make_coneqp_cascade(dims, kktsolver="chol2_inv",
                            maxiters=50, abstol=1e-7,
                            reltol=1e-7, feastol=1e-7,
                            phase1_tol=p1tol,
                            shared_GhAb=False, instrument=True)


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


A0 = jnp.zeros((nb, 0, n), jnp.float64)
b0 = jnp.zeros((nb, 0), jnp.float64)


def run(seed):
    P, q, G, h = gen(seed)
    out = solve(P, q, G, h, A0, b0)
    solved = int((np.asarray(out["status"]) == 0).sum())
    ti = int(np.asarray(out["iterations"]).sum())
    # straggler distribution: the vmapped while_loop bills the WHOLE
    # batch for max(iters), not the mean
    a_it = np.asarray(out["phase1_iterations"])
    b_it = np.asarray(out["iterations"]) - a_it \
        - np.asarray(out["rescue_iterations"])
    print(f"  A iters mean/p95/max: {a_it.mean():.1f}/"
          f"{np.percentile(a_it, 95):.0f}/{a_it.max()}", flush=True)
    print(f"  B iters mean/p95/max: {b_it.mean():.1f}/"
          f"{np.percentile(b_it, 95):.0f}/{b_it.max()}  "
          f"(#>=8: {(b_it >= 8).sum()}, #>=15: {(b_it >= 15).sum()})",
          flush=True)
    return out["profile"], solved, ti


t0 = time.time()
prof, solved, ti = run(0)
print(f"compile+first run: {time.time()-t0:.1f} s  profile={prof}",
      flush=True)

for r in range(chunks):
    t0 = time.time()
    prof, solved, ti = run(r + 1)
    dt = time.time() - t0
    a_ms = prof["a_s"] * 1e3 / max(prof["a_iters"] / nb, 1e-9)
    b_ms = prof["b_s"] * 1e3 / max(prof["b_iters"] / nb, 1e-9)
    print(f"chunk {r}: {dt:.2f} s total, solved {solved}/{nb}, "
          f"iters {ti} -> {ti/dt:.0f} it/s", flush=True)
    print(f"  A: {prof['a_s']:.2f} s / {prof['a_iters']} iters "
          f"({prof['a_iters']/nb:.1f}/inst) = {a_ms:.0f} ms/batch-iter",
          flush=True)
    print(f"  B: {prof['b_s']:.2f} s / {prof['b_iters']} iters "
          f"({prof['b_iters']/nb:.1f}/inst) = {b_ms:.0f} ms/batch-iter",
          flush=True)
    print(f"  C: {prof['c_s']:.2f} s / {prof['c_iters']} iters on "
          f"{prof['c_instances']} instances", flush=True)
