"""Benchmark driver — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline config (BASELINE.md config 5): a batch of independent n=256
scenario QPs (box + budget constraints) solved ON THE TPU to the
REFERENCE-DEFAULT accuracy contract — abstol = reltol = feastol = 1e-7
(/root/reference/src/python/coneprog.py:440-454) — via the
progressive-precision cascade (coneqp.make_coneqp_cascade): a pure-f32
phase to 1e-4, a warm-started f64-residual/f32-factor phase to 1e-7,
and a per-instance f64 rescue phase for anything the mixed factor
cannot finish.  Metric: aggregate IPM iterations/s across the batch.

Baseline: the same workload solved one instance at a time by the
single-core numpy/LAPACK reference implementation (cvxopt_tpu/_npref.py
— the same algorithm CVXOPT runs: interpreted Python driving LAPACK
potrf/potrs), restricted to one thread, at the same 1e-7 tolerances.

Extra fields beyond the required four: the f32 diagnostic mode (the
round-1 headline), the n=10240 KKT factorize+solve time (BASELINE
primary metric), a batched SOCP config (BASELINE config 3 pattern) and
a single mcsdp-pattern SDP at n=200 (BASELINE config 4).
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")  # single-core baseline

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


def bench_cascade(nb, n, maxiters=50):
    """Headline: 1e-7-accuracy batched QPs via the precision cascade."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.coneqp import make_coneqp_cascade

    dims = ConeDims(l=2 * n)
    solve = make_coneqp_cascade(dims, kktsolver="chol2_inv",
                                maxiters=maxiters, abstol=1e-7,
                                reltol=1e-7, feastol=1e-7)
    I = jnp.eye(n, dtype=jnp.float64)
    G1 = jnp.concatenate([-I, I], axis=0)
    h1 = jnp.concatenate([jnp.zeros(n), jnp.ones(n)])
    A1 = jnp.ones((1, n), jnp.float64)
    b1 = jnp.ones((1,), jnp.float64)

    # Problem data is generated ON DEVICE from a scalar seed: the
    # remote-execution path ships input buffers per request, so
    # host-side batches would measure the tunnel, not the TPU.
    @jax.jit
    def gen(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nb)

        def one(k):
            kF, kq = jax.random.split(k)
            F = jax.random.normal(kF, (n, n // 4), jnp.float64) \
                / np.sqrt(n)
            return (F @ F.T + 0.1 * I,
                    -jax.random.uniform(kq, (n,), jnp.float64, 0., .1))

        return jax.vmap(one)(keys)

    def run(seed):
        P, q = gen(seed)
        out = solve(P, q, G1, h1, A1, b1)
        return (out["status"], out["iterations"],
                jnp.max(out["relgap"]), jnp.max(out["gap"]),
                jnp.max(out["pres"]), jnp.max(out["dres"]),
                jnp.sum(out["rescue_iterations"]),
                jnp.sum(out["phase1_iterations"]))

    t0 = time.time()
    o = run(0)
    jax.block_until_ready(o)
    compile_s = time.time() - t0

    reps, ti, solved, p1 = 3, 0, 0, 0
    t0 = time.time()
    for r in range(reps):
        o = run(r + 1)
        jax.block_until_ready(o)
        solved += int((np.asarray(o[0]) == 0).sum())
        ti += int(np.asarray(o[1]).sum())
        p1 += int(np.asarray(o[7]).sum())
    dt = (time.time() - t0) / reps
    return dict(
        iters_per_s=ti / reps / dt,
        time_s=dt, compile_s=compile_s,
        solved=f"{solved}/{nb * reps}",
        max_relgap=float(o[2]), max_gap=float(o[3]),
        max_pres=float(o[4]), max_dres=float(o[5]),
        rescue_iters=int(o[6]),
        phase1_frac=round(p1 / max(ti, 1), 3),
        device=str(jax.devices()[0]),
    )


def bench_f32(nb, n, tol=1e-4, maxiters=50):
    """Diagnostic: the pure-f32 mode (round-1 headline)."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.coneqp import make_coneqp

    dtype = jnp.float32
    dims = ConeDims(l=2 * n)
    core = make_coneqp(dims, kktsolver="chol2_inv", maxiters=maxiters,
                       abstol=tol, reltol=tol, feastol=tol)
    I = jnp.eye(n, dtype=dtype)
    G1 = jnp.concatenate([-I, I], axis=0)
    h1 = jnp.concatenate([jnp.zeros(n, dtype), jnp.ones(n, dtype)])
    A1 = jnp.ones((1, n), dtype=dtype)
    b1 = jnp.ones((1,), dtype=dtype)

    @jax.jit
    def run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nb)

        def gen(k):
            kF, kq = jax.random.split(k)
            F = jax.random.normal(kF, (n, n // 4), dtype) / jnp.sqrt(
                jnp.asarray(n, dtype))
            return (F @ F.T + 0.1 * I,
                    -jax.random.uniform(kq, (n,), dtype, 0.0, 0.1))

        P, q = jax.vmap(gen)(keys)
        out = jax.vmap(lambda Pk, qk: core(Pk, qk, G1, h1, A1, b1))(
            P, q)
        return out["status"], out["iterations"], jnp.max(out["relgap"])

    o = run(0)
    jax.block_until_ready(o)
    reps, ti, solved = 3, 0, 0
    t0 = time.time()
    for r in range(reps):
        o = run(r + 1)
        jax.block_until_ready(o)
        solved += int((np.asarray(o[0]) == 0).sum())
        ti += int(np.asarray(o[1]).sum())
    dt = (time.time() - t0) / reps
    return dict(iters_per_s=round(ti / reps / dt, 1),
                solved=f"{solved}/{nb * reps}",
                max_relgap=float(o[2]))


def bench_socp(nb=256, n=64, nq=100, mq=4, maxiters=50):
    """BASELINE config 3 pattern (robls): batched QPs with nq
    second-order cone constraints, solved to 1e-7 via the cascade."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.coneqp import make_coneqp_cascade

    dims = ConeDims(q=(mq,) * nq)
    solve = make_coneqp_cascade(dims, kktsolver="chol2_inv",
                                maxiters=maxiters, abstol=1e-7,
                                reltol=1e-7, feastol=1e-7,
                                shared_GhAb=False)
    m = dims.cdim

    @jax.jit
    def gen(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nb)

        def one(k):
            kF, kq_, kG, kf = jax.random.split(k, 4)
            F = jax.random.normal(kF, (n, n // 4), jnp.float64) \
                / np.sqrt(n)
            P = F @ F.T + 0.1 * jnp.eye(n)
            q = -jax.random.uniform(kq_, (n,), jnp.float64, 0., .1)
            # per block: ||D_i x + f_i|| <= g_i'x + 1 (x=0 strictly
            # feasible);  G rows: [-g_i'; -D_i], h: [1; f_i]
            G = 0.3 * jax.random.normal(kG, (m, n), jnp.float64)
            f = 0.1 * jax.random.normal(kf, (m,), jnp.float64)
            h = f.reshape(nq, mq).at[:, 0].set(1.0).reshape(-1)
            return P, q, G, h

        return jax.vmap(one)(keys)

    A0 = jnp.zeros((0, n), jnp.float64)
    b0 = jnp.zeros((0,), jnp.float64)

    def run(seed):
        P, q, G, h = gen(seed)
        Ab = jnp.broadcast_to(A0, (nb, 0, n))
        bb = jnp.broadcast_to(b0, (nb, 0))
        out = solve(P, q, G, h, Ab, bb)
        return (out["status"], out["iterations"], jnp.max(out["gap"]),
                jnp.max(out["pres"]), jnp.max(out["dres"]))

    t0 = time.time()
    o = run(0)
    jax.block_until_ready(o)
    compile_s = time.time() - t0
    reps, ti, solved = 2, 0, 0
    t0 = time.time()
    for r in range(reps):
        o = run(r + 1)
        jax.block_until_ready(o)
        solved += int((np.asarray(o[0]) == 0).sum())
        ti += int(np.asarray(o[1]).sum())
    dt = (time.time() - t0) / reps
    return dict(iters_per_s=round(ti / reps / dt, 1),
                solved=f"{solved}/{nb * reps}",
                config=f"{nb}x n={n} QP with {nq} SOC({mq}) blocks",
                max_gap=float(o[2]), max_pres=float(o[3]),
                max_dres=float(o[4]), compile_s=round(compile_s, 1))


def bench_sdp(m=200, maxiters=40):
    """BASELINE config 4 (mcsdp pattern): min 1'x s.t. w + diag(x) >= 0
    (one (m,m) PSD block).  Reports per-iteration wall time — the 's'
    path runs batched eigh/SVD per iteration (SURVEY 'hard parts')."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.conelp import make_conelp

    n = m
    dims = ConeDims(s=(m,))
    # 'rescue': f32 chol2_inv phase + a robust f64 chol2 phase for
    # whatever the f32 factor cannot finish ('s'-cone conditioning is
    # not diagonally equilibrable; see kkt.robust_name)
    core = make_conelp(dims, kktsolver="chol2_inv", maxiters=maxiters,
                       abstol=1e-6, reltol=1e-6, feastol=1e-6,
                       refinement=1, factor_dtype="rescue")

    rng = np.random.default_rng(7)
    w = rng.standard_normal((m, m))
    w = (w + w.T) / np.sqrt(m)
    G = np.zeros((m * m, n))
    for j in range(n):
        G[j * m + j, j] = -1.0
    c = jnp.ones((n,), jnp.float64)
    Gj = jnp.asarray(G)
    hj = jnp.asarray(w.reshape(-1, order="F"))
    A0 = jnp.zeros((0, n), jnp.float64)
    b0 = jnp.zeros((0,), jnp.float64)

    t0 = time.time()
    out = core(c, Gj, hj, A0, b0)
    jax.block_until_ready(out["status"])
    compile_s = time.time() - t0
    t0 = time.time()
    out = core(c, Gj, hj, A0, b0)
    jax.block_until_ready(out["status"])
    dt = time.time() - t0
    iters = int(out["iterations"])
    return dict(status=int(out["status"]), iterations=iters,
                iter_ms=round(dt / max(iters, 1) * 1e3, 1),
                gap=float(out["gap"]), pres=float(out["pres"]),
                dres=float(out["dres"]),
                config=f"mcsdp m={m}", compile_s=round(compile_s, 1))


def bench_large_kkt(n=10240):
    """BASELINE primary metric: KKT assembly+factorize+solve wall time
    for one large dense QP KKT system (S = P + G' D G; chol; solve) at
    n=10k.  The problem data (G, P factor) is generated once and held
    device-resident; only the per-IPM-iteration work — re-assembly
    with fresh scaling weights d, factorization, solve — is timed."""
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    @jax.jit
    def gen(seed):
        key = jax.random.PRNGKey(seed)
        kF, kG = jax.random.split(key)
        F = jax.random.normal(kF, (n, 256), jnp.float32)
        Gt = jax.random.normal(kG, (n, n), jnp.float32) / np.float32(
            np.sqrt(n))
        return F, Gt

    F, Gt = gen(0)
    jax.block_until_ready(Gt)

    @jax.jit
    def fs(seed, F, Gt):
        key = jax.random.PRNGKey(seed)
        kd, kb = jax.random.split(key)
        d = jax.random.uniform(kd, (n,), jnp.float32, 0.5, 2.0)
        b = jax.random.normal(kb, (n,), jnp.float32)
        S = F @ F.T + jnp.eye(n) + (Gt * d) @ Gt.T
        L = jnp.linalg.cholesky(S)
        y = jsl.solve_triangular(L, b[:, None], lower=True)
        x = jsl.solve_triangular(L.T, y, lower=False)
        return x.sum()

    float(fs(0, F, Gt))                # compile + warm
    t0 = time.time()
    reps = 3
    for r in range(reps):
        float(fs(r + 1, F, Gt))        # float() forces a real sync
    return (time.time() - t0) / reps


def bench_markowitz(nb=64, n=500, maxiters=50):
    """BASELINE config 2: Markowitz portfolio QPs at n=500 assets
    (pattern: /root/reference/examples/doc/chap8/portfolio.py):
    min -p'x + mu x'Sx  s.t. x >= 0, 1'x = 1, solved to 1e-7 via the
    cascade."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.coneqp import make_coneqp_cascade

    dims = ConeDims(l=n)
    solve = make_coneqp_cascade(dims, kktsolver="chol2_inv",
                                maxiters=maxiters, abstol=1e-7,
                                reltol=1e-7, feastol=1e-7)
    G1 = -jnp.eye(n, dtype=jnp.float64)
    h1 = jnp.zeros(n)
    A1 = jnp.ones((1, n), jnp.float64)
    b1 = jnp.ones((1,), jnp.float64)

    @jax.jit
    def gen(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nb)

        def one(k):
            kF, kD, kp = jax.random.split(k, 3)
            F = jax.random.normal(kF, (n, n // 10), jnp.float64) \
                / np.sqrt(n)
            D = jax.random.uniform(kD, (n,), jnp.float64, 0.01, 0.1)
            S = 2.0 * (F @ F.T + jnp.diag(D))    # mu * Sigma
            p = jax.random.uniform(kp, (n,), jnp.float64, 0.0, 0.5)
            return S, -p

        return jax.vmap(one)(keys)

    def run(seed):
        P, q = gen(seed)
        out = solve(P, q, G1, h1, A1, b1)
        return (out["status"], out["iterations"], jnp.max(out["gap"]),
                jnp.max(out["pres"]), jnp.max(out["dres"]))

    t0 = time.time()
    o = run(0)
    jax.block_until_ready(o)
    compile_s = time.time() - t0
    reps, ti, solved = 2, 0, 0
    t0 = time.time()
    for r in range(reps):
        o = run(r + 1)
        jax.block_until_ready(o)
        solved += int((np.asarray(o[0]) == 0).sum())
        ti += int(np.asarray(o[1]).sum())
    dt = (time.time() - t0) / reps
    return dict(iters_per_s=round(ti / reps / dt, 1),
                solved=f"{solved}/{nb * reps}",
                config=f"{nb}x n={n} Markowitz portfolio QPs",
                max_gap=float(o[2]), max_pres=float(o[3]),
                max_dres=float(o[4]), compile_s=round(compile_s, 1))


def bench_sparse(n=100_000):
    """Sparse direct path (VERDICT item 3): an LP with n variables and
    banded structure solved end-to-end through the RCM + fixed-pattern
    banded-Cholesky kktsolver — never densifying G (dense would be
    4e10 entries at this size).  Runs on the CPU backend: the claim is
    O(n kd^2) structured scaling; long sequential scans are
    host-shaped (a block-panel TPU variant is roadmap)."""
    import scipy.sparse as sp
    import jax
    from cvxopt_tpu.ops.sparse_kkt import lp_sparse

    rng = np.random.default_rng(0)
    c = rng.standard_normal(n) * 0.1
    rows, cols, vals, h = [], [], [], []
    r = 0
    for i in range(n):
        rows += [r, r + 1]
        cols += [i, i]
        vals += [-1.0, 1.0]
        h += [0.0, 1.0]
        r += 2
    for i in range(n - 1):
        rows += [r, r, r + 1, r + 1]
        cols += [i, i + 1, i, i + 1]
        vals += [1.0, -1.0, -1.0, 1.0]
        h += [0.5, 0.5]
        r += 2
    G = sp.coo_matrix((vals, (rows, cols)), shape=(r, n)).tocsr()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t0 = time.time()
        sol = lp_sparse(c, G, np.asarray(h),
                        options={"maxiters": 30})
        dt = time.time() - t0
    return dict(n=n, m=r, status=sol["status"],
                iterations=sol["iterations"],
                solve_s=round(dt, 1), gap=sol["gap"],
                device="cpu (structured-scaling metric)")


def bench_cpu_baseline(n, tol, k=3, maxiters=50, repeats=2):
    """Single-core reference iterations/s on identical instances.

    Best-of-`repeats` passes: the figure is sensitive to transient
    host load (the TPU tunnel's compile helpers run on the same
    cores), and the baseline should reflect the reference running
    unimpeded.  Called FIRST in main(), before any device work."""
    from cvxopt_tpu._npref import coneqp_np
    args = make_batch(k, n, dtype=np.float64)
    best = 0.0
    total = solved = 0
    for _ in range(repeats):
        t0 = time.time()
        total = solved = 0
        for i in range(k):
            P, q, G, h, A, b = (a[i] for a in args)
            r = coneqp_np(P, q, G, h, A, b.reshape(-1),
                          maxiters=maxiters,
                          abstol=tol, reltol=tol, feastol=tol)
            total += r["iterations"]
            solved += r["status"] == "optimal"
        dt = time.time() - t0
        best = max(best, total / dt)
    return dict(total_iters=total, solved=solved, iters_per_s=best)


def main():
    import jax
    # IPM needs true f32 matmuls (default TPU matmul is bf16-based)
    jax.config.update("jax_default_matmul_precision", "highest")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_enable_x64", True)

    on_tpu = jax.devices()[0].platform != "cpu"
    n = int(os.environ.get("BENCH_N", 256))
    nb = int(os.environ.get("BENCH_B", 1024 if on_tpu else 8))

    # the single-core baseline runs FIRST, before any device work
    # contends for host CPU (see bench_cpu_baseline)
    base = bench_cpu_baseline(n, 1e-7)

    main_res = bench_cascade(nb, n)

    f32 = None
    if on_tpu and os.environ.get("BENCH_F32", "1") != "0":
        try:
            f32 = bench_f32(nb, n)
        except Exception as e:                       # pragma: no cover
            f32 = {"error": repr(e)[:200]}

    large_ms = None
    if os.environ.get("BENCH_LARGE", "1") != "0":
        try:
            large_ms = round(bench_large_kkt(
                10240 if on_tpu else 2048) * 1e3, 1)
        except Exception as e:                       # pragma: no cover
            large_ms = repr(e)[:200]

    socp = None
    if os.environ.get("BENCH_SOCP", "1") != "0":
        try:
            socp = bench_socp(nb=min(nb, 256) if on_tpu else 4,
                              n=64 if on_tpu else 16,
                              nq=100 if on_tpu else 10)
        except Exception as e:                       # pragma: no cover
            socp = {"error": repr(e)[:200]}

    sdp = None
    if os.environ.get("BENCH_SDP", "1") != "0":
        try:
            sdp = bench_sdp(m=200 if on_tpu else 25)
        except Exception as e:                       # pragma: no cover
            sdp = {"error": repr(e)[:200]}

    sparse = None
    if os.environ.get("BENCH_SPARSE", "1") != "0":
        try:
            sparse = bench_sparse(100_000 if on_tpu else 20_000)
        except Exception as e:                       # pragma: no cover
            sparse = {"error": repr(e)[:200]}

    mark = None
    if on_tpu and os.environ.get("BENCH_MARKOWITZ", "1") != "0":
        try:
            mark = bench_markowitz()
        except Exception as e:                       # pragma: no cover
            mark = {"error": repr(e)[:200]}

    result = {
        "metric": "batched_qp_ipm_iters_per_s_at_1e-7",
        "value": round(main_res["iters_per_s"], 2),
        "unit": "iters/s",
        "vs_baseline": round(
            main_res["iters_per_s"] / base["iters_per_s"], 2),
        "config": f"{nb}x n={n} scenario QPs (l=2n box+budget), "
                  f"abstol=reltol=feastol=1e-7",
        "solved": main_res["solved"],
        "max_gap": main_res["max_gap"],
        "max_relgap": main_res["max_relgap"],
        "max_pres": main_res["max_pres"],
        "max_dres": main_res["max_dres"],
        "rescue_iters": main_res["rescue_iters"],
        "phase1_frac": main_res["phase1_frac"],
        "batch_time_s": round(main_res["time_s"], 3),
        "compile_s": round(main_res["compile_s"], 1),
        "baseline_iters_per_s": round(base["iters_per_s"], 2),
        "f32_mode": f32,
        "kkt_factor_solve_ms_n10240": large_ms,
        "socp": socp,
        "sdp": sdp,
        "sparse_lp": sparse,
        "markowitz": mark,
        "device": main_res["device"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
