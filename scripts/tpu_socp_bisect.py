"""Bisect the SOCP phase-B per-step cost: run the phase-B
configuration (f64 io, cholqr_inv f32 factor) as a fixed-length
iteration via maxiters bounds and impossible tolerances, and vary one
knob at a time.  Per-step cost = (T(hi) - T(lo)) / (hi - lo).

Usage: python scripts/tpu_socp_bisect.py [nb]
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
from cvxopt_tpu.coneqp import make_coneqp

nb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
n, nq, mq = 64, 100, 4
dims = ConeDims(q=(mq,) * nq)
m = dims.cdim
LO, HI = 4, 12


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


P0, q0, G0, h0 = gen(0)
A0 = jnp.zeros((nb, 0, n), jnp.float64)
b0 = jnp.zeros((nb, 0), jnp.float64)
jax.block_until_ready(P0)


def per_step(tag, dtype=jnp.float64, **kw):
    cores = {}
    for it in (LO, HI):
        core = make_coneqp(dims, maxiters=it, abstol=1e-30,
                           reltol=1e-30, feastol=1e-30, **kw)
        cores[it] = jax.jit(jax.vmap(core))
    out = {}
    for it, f in cores.items():
        args = (P0.astype(dtype), q0.astype(dtype), G0.astype(dtype),
                h0.astype(dtype), A0.astype(dtype), b0.astype(dtype))
        r = f(*args)
        _ = int(np.asarray(r["iterations"]).sum())  # compile+warm
        t0 = time.time()
        for rep in range(2):
            r = f(*args)
            _ = int(np.asarray(r["iterations"]).sum())
        out[it] = (time.time() - t0) / 2
    ms = (out[HI] - out[LO]) / (HI - LO) * 1e3
    print(f"{tag}: {ms:.1f} ms/step  (T{LO}={out[LO]:.2f}s "
          f"T{HI}={out[HI]:.2f}s)", flush=True)


CONFIGS = {
    "bfull": ("B full (cholqr_inv f32, ref=2, f64 io)", {},
              dict(kktsolver="cholqr_inv", factor_dtype="float32",
                   refinement=2)),
    "bref0": ("B ref=0", {},
              dict(kktsolver="cholqr_inv", factor_dtype="float32",
                   refinement=0)),
    "bref1": ("B ref=1", {},
              dict(kktsolver="cholqr_inv", factor_dtype="float32",
                   refinement=1)),
    "bf32": ("B-shape f32 io", dict(dtype=jnp.float32),
             dict(kktsolver="cholqr_inv", factor_dtype=None,
                  refinement=2)),
    "af64": ("A-shape f64 io (chol2_inv, ref=0)", {},
             dict(kktsolver="chol2_inv", factor_dtype="float32",
                  refinement=0)),
    "af32": ("A f32 (chol2_inv, ref=0)", dict(dtype=jnp.float32),
             dict(kktsolver="chol2_inv", factor_dtype=None,
                  refinement=0)),
}
which = sys.argv[2] if len(sys.argv) > 2 else "bfull"
tag, extra, kw = CONFIGS[which]
per_step(tag, **extra, **kw)
