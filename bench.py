"""Benchmark driver — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config (BASELINE.md config 5): a batch of independent n=256
scenario QPs (box + budget constraints), vmapped and solved on the TPU
chip in one jit-compiled program.  Metric: aggregate IPM iterations/s.

Baseline: the same workload solved one instance at a time by the
single-core numpy/LAPACK reference implementation (cvxopt_tpu/_npref.py
— the same algorithm CVXOPT runs: interpreted Python driving LAPACK
potrf/potrs), restricted to one thread.

Extra diagnostic fields beyond the required four are included in the
same JSON line.
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")  # single-core baseline, as stated

import json
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_batch(nb, n, dtype=np.float64, seed=0):
    """Scenario QPs: min 1/2 x'Px + q'x  s.t. 0 <= x <= 1, sum x = 1."""
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((nb, n, n // 4)) / np.sqrt(n)
    P = F @ F.transpose(0, 2, 1) + 0.1 * np.eye(n)
    q = -rng.uniform(0.0, 0.1, (nb, n))
    I = np.eye(n)
    G1 = np.concatenate([-I, I], axis=0)
    G = np.broadcast_to(G1, (nb, 2 * n, n)).copy()
    h = np.broadcast_to(np.concatenate([np.zeros(n), np.ones(n)]),
                        (nb, 2 * n)).copy()
    A = np.broadcast_to(np.ones((1, n)), (nb, 1, n)).copy()
    b = np.ones((nb, 1))
    return (P.astype(dtype), q.astype(dtype), G.astype(dtype),
            h.astype(dtype), A.astype(dtype), b.astype(dtype))


def bench_tpu(nb, n, dtype, tol, maxiters=50):
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.coneqp import make_coneqp

    dims = ConeDims(l=2 * n)
    # 'chol2_inv': explicit-inverse factor — the TPU fast path (batched
    # 1-RHS triangular solves are sequential-bound; see kkt.kkt_chol2)
    core = make_coneqp(dims, kktsolver="chol2_inv", maxiters=maxiters,
                       abstol=tol, reltol=tol, feastol=tol)

    # Problem data is generated ON DEVICE inside the jitted program
    # from a scalar seed: the remote-execution path ships input buffers
    # per request, so host-side batches would measure the tunnel, not
    # the TPU; a scalar input also makes every rep a distinct
    # computation (identical requests can be served from a cache).
    I = jnp.eye(n, dtype=dtype)
    G1 = jnp.concatenate([-I, I], axis=0)
    h1 = jnp.concatenate([jnp.zeros(n, dtype), jnp.ones(n, dtype)])
    A1 = jnp.ones((1, n), dtype=dtype)
    b1 = jnp.ones((1,), dtype=dtype)

    def gen(key):
        kF, kq = jax.random.split(key)
        F = jax.random.normal(kF, (n, n // 4), dtype) / jnp.sqrt(
            jnp.asarray(n, dtype))
        P = F @ F.T + 0.1 * I
        q = -jax.random.uniform(kq, (n,), dtype, 0.0, 0.1)
        return P, q

    def run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nb)
        P, q = jax.vmap(gen)(keys)
        out = jax.vmap(lambda Pk, qk: core(Pk, qk, G1, h1, A1, b1))(
            P, q)
        return (out["status"], out["iterations"],
                jnp.max(out["relgap"]))

    run = jax.jit(run)

    t0 = time.time()
    st, it, rg = run(0)
    jax.block_until_ready((st, it, rg))
    compile_and_first = time.time() - t0

    reps, dt, total_iters, solved = 0, 0.0, 0, 0
    t0 = time.time()
    while dt < 2.0 and reps < 16:
        st, it, rg = run(reps + 1)
        jax.block_until_ready((st, it, rg))
        total_iters += int(np.asarray(it).sum())
        solved += int((np.asarray(st) == 0).sum())
        reps += 1
        dt = time.time() - t0
        if os.environ.get("BENCH_DEBUG"):
            print(f"  rep {reps}: cumulative {dt:.3f}s",
                  file=sys.stderr)
    dt = dt / reps

    return dict(
        time_s=dt,
        compile_s=compile_and_first,
        total_iters=total_iters,
        solved=solved,
        nb=nb * reps,
        max_relgap=float(np.asarray(rg)),
        iters_per_s=float(total_iters / reps / dt),
        backend=jax.devices()[0].platform,
        device=str(jax.devices()[0]),
    )


def bench_large_kkt(n=8192):
    """BASELINE primary metric: KKT assembly+factorize+solve wall time
    for one large dense QP KKT system (S = P + G' D G; chol; solve)."""
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    @jax.jit
    def fs(seed):
        key = jax.random.PRNGKey(seed)
        kF, kG, kd, kb = jax.random.split(key, 4)
        F = jax.random.normal(kF, (n, 256), jnp.float32)
        Gt = jax.random.normal(kG, (n, n), jnp.float32) / np.float32(
            np.sqrt(n))
        d = jax.random.uniform(kd, (n,), jnp.float32, 0.5, 2.0)
        b = jax.random.normal(kb, (n,), jnp.float32)
        S = F @ F.T + jnp.eye(n) + (Gt * d) @ Gt.T
        L = jnp.linalg.cholesky(S)
        y = jsl.solve_triangular(L, b[:, None], lower=True)
        x = jsl.solve_triangular(L.T, y, lower=False)
        return x.sum()

    float(fs(0))                       # compile + warm
    t0 = time.time()
    reps = 3
    for r in range(reps):
        float(fs(r + 1))               # float() forces a real sync
    return (time.time() - t0) / reps


def bench_f64_mixed(nb=256, n=256):
    """Accuracy mode: f64 residuals + f32 factorization (refinement=1)
    — full 1e-7-class KKT accuracy on TPU.  Returns (iters_per_s,
    solved, max_pres, max_dres)."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.coneqp import make_coneqp

    dims = ConeDims(l=2 * n)
    core = make_coneqp(dims, kktsolver="chol2_inv", maxiters=50,
                       abstol=1e-7, reltol=1e-7, feastol=1e-7,
                       refinement=1, factor_dtype="float32")
    I = jnp.eye(n, dtype=jnp.float64)
    G1 = jnp.concatenate([-I, I], axis=0)
    h1 = jnp.concatenate([jnp.zeros(n), jnp.ones(n)])
    A1 = jnp.ones((1, n), jnp.float64)
    b1 = jnp.ones((1,), jnp.float64)

    @jax.jit
    def run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nb)

        def gen(k):
            kF, kq = jax.random.split(k)
            F = jax.random.normal(kF, (n, n // 4), jnp.float64) \
                / np.sqrt(n)
            return (F @ F.T + 0.1 * I,
                    -jax.random.uniform(kq, (n,), jnp.float64, 0., .1))

        P, q = jax.vmap(gen)(keys)
        out = jax.vmap(lambda Pk, qk: core(Pk, qk, G1, h1, A1, b1))(
            P, q)
        return (out["status"], out["iterations"],
                jnp.max(out["pres"]), jnp.max(out["dres"]))

    o = run(0)
    np.asarray(o[0])
    t0 = time.time()
    reps, ti, solved = 2, 0, 0
    for r in range(reps):
        o = run(r + 1)
        st = np.asarray(o[0])
        solved += int((st == 0).sum())
        ti += int(np.asarray(o[1]).sum())
    dt = (time.time() - t0) / reps
    return dict(iters_per_s=round(ti / reps / dt, 1),
                solved=f"{solved}/{nb * reps}",
                max_pres=float(o[2]), max_dres=float(o[3]))


def bench_cpu_baseline(n, tol, k=3, maxiters=50):
    """Single-core reference iterations/s on identical instances."""
    from cvxopt_tpu._npref import coneqp_np
    args = make_batch(k, n, dtype=np.float64)
    t0 = time.time()
    total = 0
    solved = 0
    for i in range(k):
        P, q, G, h, A, b = (a[i] for a in args)
        r = coneqp_np(P, q, G, h, A, b.reshape(-1), maxiters=maxiters,
                      abstol=tol, reltol=tol, feastol=tol)
        total += r["iterations"]
        solved += r["status"] == "optimal"
    dt = time.time() - t0
    return dict(time_s=dt, total_iters=total, solved=solved,
                iters_per_s=total / dt)


def main():
    import jax
    # IPM needs true f32 matmuls (default TPU matmul is bf16-based)
    jax.config.update("jax_default_matmul_precision", "highest")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    n = int(os.environ.get("BENCH_N", 256))
    nb = int(os.environ.get("BENCH_B", 1024))

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        # f32 on TPU for now (f64 is emulated; mixed-precision
        # refinement is the planned fp64-accuracy path)
        dtype, tol = np.float32, 1e-4
    else:
        jax.config.update("jax_enable_x64", True)
        dtype, tol = np.float64, 1e-7

    tpu = bench_tpu(nb, n, dtype, tol)
    large_ms = None
    if os.environ.get("BENCH_LARGE", "1") != "0":
        large_ms = round(bench_large_kkt() * 1e3, 1)
    f64m = None
    if on_tpu and os.environ.get("BENCH_F64", "1") != "0":
        f64m = bench_f64_mixed()
    base = bench_cpu_baseline(n, tol if not on_tpu else 1e-7)

    result = {
        "metric": "batched_qp_ipm_iters_per_s",
        "value": round(tpu["iters_per_s"], 2),
        "unit": "iters/s",
        "vs_baseline": round(tpu["iters_per_s"] / base["iters_per_s"],
                             2),
        "config": f"{nb}x n={n} scenario QPs (l=2n box+budget)",
        "solved": f"{tpu['solved']}/{tpu['nb']}",
        "max_relgap": tpu["max_relgap"],
        "batch_time_s": round(tpu["time_s"], 3),
        "compile_s": round(tpu["compile_s"], 1),
        "baseline_iters_per_s": round(base["iters_per_s"], 2),
        "kkt_factor_solve_ms_n8192": large_ms,
        "f64_mixed_mode": f64m,
        "device": tpu["device"],
        "dtype": np.dtype(dtype).name,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
