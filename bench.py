"""Benchmark driver — prints a JSON result line after EVERY completed
stage (the last line printed is the most complete result):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Survivability harness (round 4): the round-3 driver run timed out with
zero output because the old design printed one JSON line only at the
very end of main().  Now:
  * after each stage the full (partial) result line is re-printed and
    mirrored to BENCH_PARTIAL.json — a timeout preserves everything
    completed so far;
  * every stage runs in its OWN SUBPROCESS under a hard timeout.
    signal.alarm is not enough: a remote-backend call that blocks
    inside the C extension never returns to the interpreter, so the
    alarm handler cannot fire (observed live — an SDP-stage remote
    compile blocked 15+ min past its alarm).  A child process can
    always be SIGKILLed; the orchestrator itself performs NO device
    work and therefore cannot hang;
  * a global wall-clock budget (env BENCH_BUDGET_S, default 1500 s)
    is checked between stages — remaining stages are skipped with
    {"skipped": "budget"};
  * the sparse bench's TPU block-panel attempt runs at a SAFE size
    (n=20000; the r03 worker crash is r05-bounded to n in
    (20000, 50000] — a platform kernel fault); BENCH_SPARSE_TPU=0
    skips it, =full attempts the crashing size (don't).

Run a single stage in-process: `python bench.py --stage <name>
[--args '<json kwargs>']` (this is what the orchestrator spawns).

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

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1500))

RESULT = {
    "metric": "batched_qp_ipm_iters_per_s_at_1e-7",
    "value": None,
    "unit": "iters/s",
    "vs_baseline": None,
    "incomplete": True,
    "stages_done": [],
    "stage_s": {},
}


def emit():
    """Print the current (partial) result as one JSON line and mirror
    it to BENCH_PARTIAL.json.  Called after every stage: if the driver
    kills the process, the last printed line is the best evidence."""
    line = json.dumps(RESULT)
    print(line, flush=True)
    try:
        with open(os.path.join(_HERE, "BENCH_PARTIAL.json"), "w") as f:
            f.write(line + "\n")
    except OSError:                                  # pragma: no cover
        pass


def _setup_jax():
    """Per-process JAX configuration (stage subprocesses + --stage)."""
    import jax
    if os.environ.get("BENCH_FORCE_CPU", "0") == "1":
        # the axon sitecustomize overrides JAX_PLATFORMS; updating the
        # config after import reliably selects CPU (harness testing)
        jax.config.update("jax_platforms", "cpu")
    # IPM needs true f32 matmuls (default TPU matmul is bf16-based)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      0.0)
    jax.config.update("jax_enable_x64", True)
    return jax


def stage_device():
    jax = _setup_jax()
    d = jax.devices()[0]
    return {"device": str(d), "platform": d.platform}


def run_stage(name, timeout_s, kwargs=None):
    """Run one bench stage in a SUBPROCESS under a hard timeout and
    the global wall-clock budget.  The child prints one JSON line;
    a hang is SIGKILLed by subprocess.run's timeout (a blocked remote
    C call cannot be interrupted by signal handlers in-process).
    Returns the stage result dict/value, or {'error'|'skipped': ...};
    never raises."""
    import subprocess
    remaining = BUDGET_S - (time.time() - T0)
    if remaining < 20:
        return {"skipped": "budget"}
    t = int(min(timeout_s, max(remaining, 20)))
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", name]
    if kwargs:
        cmd += ["--args", json.dumps(kwargs)]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=t, cwd=_HERE)
        out = None
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{") or line.startswith("["):
                try:
                    out = json.loads(line)
                    break
                except ValueError:
                    continue
            # bare floats (the baseline stages return scalars)
            try:
                out = float(line)
                break
            except ValueError:
                continue
        if out is None:
            tail = (proc.stderr or proc.stdout or "")[-400:]
            return {"error": f"no JSON from stage (rc={proc.returncode})",
                    "tail": tail}
        RESULT["stages_done"].append(name)
        return out
    except subprocess.TimeoutExpired:
        return {"error": f"stage killed after {t}s timeout"}
    except Exception as e:                           # pragma: no cover
        return {"error": repr(e)[:200]}
    finally:
        RESULT["stage_s"][name] = round(time.time() - t0, 1)


def stage_socp(**kw):
    """SOCP stage with in-process HBM-pressure retry: halve the chunk
    width, double the chunk count (total scenarios fixed) on OOM."""
    nb = kw.pop("nb", 2048)
    chunks = kw.pop("chunks", 5)
    err = None
    while nb >= 4:
        try:
            return bench_socp(nb=nb, chunks=chunks, **kw)
        except Exception as e:                       # pragma: no cover
            err = {"error": repr(e)[:200], "nb": nb}
            if "RESOURCE_EXHAUSTED" not in repr(e) \
                    and "memory" not in repr(e).lower():
                return err
            nb //= 2
            chunks *= 2
    return err


_STAGES = {
    "device": lambda **kw: stage_device(),
    "cpu_baseline": lambda **kw: bench_cpu_baseline(**kw),
    "socp_baseline": lambda **kw: bench_socp_baseline(**kw),
    "sdp_baseline": lambda **kw: bench_sdp_baseline(**kw),
    "cascade": lambda **kw: bench_cascade(**kw),
    "socp": lambda **kw: stage_socp(**kw),
    "large_kkt": lambda **kw: bench_large_kkt(**kw),
    "sdp": lambda **kw: bench_sdp(**kw),
    "markowitz": lambda **kw: bench_markowitz(**kw),
    "batched_lp": lambda **kw: bench_batched_lp(**kw),
    "f32": lambda **kw: bench_f32(**kw),
    "sparse": lambda **kw: bench_sparse(**kw),
}


def stage_main(name, kwargs):
    """--stage entry: run one stage in this process, print one JSON
    line (the orchestrator parses the LAST parseable line)."""
    if name != "device":
        _setup_jax()
    try:
        out = _STAGES[name](**kwargs)
    except Exception as e:
        out = {"error": repr(e)[:300]}
    print(json.dumps(out), flush=True)


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


def bench_socp_baseline(n=64, nq=100, mq=4, k=3, repeats=2):
    """Single-core general-cone reference on the SOCP bench family
    (coneqp_np_cones — the q-cone coneqp path, coneprog.py:1440 +
    misc.py NT scaling, run-vectorized numpy so its per-iteration
    overhead is at least as low as the reference's C cone kernels).
    Best-of-`repeats`, called before any device work (host load)."""
    from cvxopt_tpu._npref import coneqp_np_cones
    m = nq * mq
    rng = np.random.default_rng(0)
    insts = []
    for _ in range(k):
        F = rng.standard_normal((n, n // 4)) / np.sqrt(n)
        P = F @ F.T + 0.1 * np.eye(n)
        q = -rng.uniform(0.0, 0.1, n)
        G = 0.3 * rng.standard_normal((m, n))
        h = (0.1 * rng.standard_normal(m)).reshape(nq, mq)
        h[:, 0] = 1.0
        insts.append((P, q, G, h.reshape(-1)))
    best = 0.0
    for _ in range(repeats):
        total = 0
        t0 = time.time()
        for P, q, G, h in insts:
            r = coneqp_np_cones(P, q, G, h, {"q": [mq] * nq},
                                abstol=1e-7, reltol=1e-7,
                                feastol=1e-7)
            assert r["status"] == "optimal"
            total += r["iterations"]
        best = max(best, total / (time.time() - t0))
    return best


def bench_socp(nb=1024, n=64, nq=100, mq=4, maxiters=50, chunks=2,
               baseline_iters_per_s=None):
    """North-star config (BASELINE config 3 pattern, robls
    /root/reference/examples/doc/chap9/robls.py): a large scenario set
    of SOC-constrained QPs solved to the full 1e-7 contract via the
    cascade — phase B factors in f32 through the condition-halving
    kkt_cholqr, so the whole batch runs at f32 speed.  `chunks` chunks
    of `nb` instances are solved back to back (total = chunks*nb
    scenarios); aggregate iters/s counts all instances' iterations
    over the full wall time."""
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

    A0 = jnp.zeros((nb, 0, n), jnp.float64)
    b0 = jnp.zeros((nb, 0), jnp.float64)

    def run(seed):
        P, q, G, h = gen(seed)
        out = solve(P, q, G, h, A0, b0)
        return (out["status"], out["iterations"], jnp.max(out["gap"]),
                jnp.max(out["pres"]), jnp.max(out["dres"]),
                jnp.sum(out["rescue_iterations"]),
                jnp.max(out["relgap"]))

    t0 = time.time()
    o = run(0)
    jax.block_until_ready(o)
    compile_s = time.time() - t0
    ti, solved, rescue = 0, 0, 0
    chunk_s = []
    t0 = time.time()
    for r in range(chunks):
        tc = time.time()
        o = run(r + 1)
        # fetch values per chunk: the remote backend needs a real sync
        solved += int((np.asarray(o[0]) == 0).sum())
        ti += int(np.asarray(o[1]).sum())
        rescue += int(np.asarray(o[5]))
        # per-chunk wall: diagnoses tunnel-variance / rescue-compile
        # outliers (r05: one run halved on identical work)
        chunk_s.append(round(time.time() - tc, 2))
    dt = time.time() - t0
    res = dict(iters_per_s=round(ti / dt, 1),
               solved=f"{solved}/{nb * chunks}",
               config=f"{nb * chunks}x n={n} QP with {nq} SOC({mq}) "
                      f"blocks at 1e-7 ({chunks} chunks)",
               scenarios=nb * chunks,
               max_gap=float(o[2]), max_pres=float(o[3]),
               max_dres=float(o[4]), max_relgap=float(o[6]),
               rescue_iters=rescue, chunk_s=chunk_s,
               compile_s=round(compile_s, 1))
    if baseline_iters_per_s:
        res["baseline_iters_per_s"] = round(baseline_iters_per_s, 1)
        res["vs_baseline"] = round(
            res["iters_per_s"] / baseline_iters_per_s, 1)
    return res


def _mcsdp_data(m, seed=7):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((m, m))
    w = (w + w.T) / np.sqrt(m)
    G = np.zeros((m * m, m))
    for j in range(m):
        G[j * m + j, j] = -1.0
    return w, G


def bench_sdp_baseline(m=200, iters=3):
    """Single-core reference per-iteration cost on mcsdp (numpy
    general-cone coneqp with P=0; 's' per-iteration cost is constant,
    so a few iterations time the full solve rate).  Returns iters/s."""
    from cvxopt_tpu._npref import coneqp_np_cones
    w, G = _mcsdp_data(m)
    t0 = time.time()
    r = coneqp_np_cones(np.zeros((m, m)), np.ones(m), G,
                        w.reshape(-1), {"s": [m]}, maxiters=iters,
                        abstol=1e-7, reltol=1e-6, feastol=1e-7)
    dt = time.time() - t0
    return max(r["iterations"], 1) / dt


def bench_sdp(m=200, maxiters=40, baseline_iters_per_s=None):
    _stage_t0 = time.time()
    """BASELINE config 4 (mcsdp pattern): min 1'x s.t. w + diag(x) >= 0
    (one (m,m) PSD block), at the REFERENCE-DEFAULT accuracy contract
    abstol=feastol=1e-7, reltol=1e-6 (coneprog.py:440-454).  Uses the
    per-iteration 'adaptive' mixed-precision mode (kkt_chol2): factor
    in equilibrated f32 while an f64-residual probe certifies the
    refinement contraction, switching to the f64 factor only for the
    final ill-conditioned iterations (measured: f32 factors collapse
    the HSD gap on 's' cones near 1e-7, so a fixed f32 factor cannot
    finish).  Also reports a per-iteration component breakdown (eigh /
    factor) and a batched 16x m=50 configuration via the cascade."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.conelp import make_conelp_refresh, \
        make_conelp_cascade

    n = m
    dims = ConeDims(s=(m,))
    # periodic scaling refresh: on the emulated-f64 TPU backend the
    # single-trajectory NT scaling stalls at dres ~ 2e-7 near mu~1e-9
    # (conelp.make_conelp_refresh docstring, measured r04); the
    # refreshed solve reaches the contract in a few post-restart steps
    # r05: trigger-driven — the stall detector decides when to
    # restart (stall_exit=4); a healthy run never refreshes
    core = make_conelp_refresh(dims, kktsolver="chol2",
                               maxiters=maxiters, abstol=1e-7,
                               reltol=1e-6, feastol=1e-7,
                               refinement=1, factor_dtype="adaptive",
                               stall_exit=4, rounds=3)

    w, G = _mcsdp_data(m)
    c = jnp.ones((n,), jnp.float64)
    Gj = jnp.asarray(G)
    hj = jnp.asarray(w.reshape(-1, order="F"))
    A0 = jnp.zeros((0, n), jnp.float64)
    b0 = jnp.zeros((0,), jnp.float64)

    t0 = time.time()
    out = core(c, Gj, hj, A0, b0)
    _ = int(out["status"])
    compile_s = time.time() - t0
    t0 = time.time()
    out = core(c, Gj, hj, A0, b0)
    _ = int(out["status"])
    dt = time.time() - t0
    iters = int(out["iterations"])
    res = dict(status=int(out["status"]), iterations=iters,
               iter_ms=round(dt / max(iters, 1) * 1e3, 1),
               gap=float(out["gap"]), relgap=float(out["relgap"]),
               pres=float(out["pres"]), dres=float(out["dres"]),
               refresh_rounds=int(out.get("refresh_rounds", 0)),
               config=f"mcsdp m={m} at 1e-7/1e-6",
               compile_s=round(compile_s, 1))
    if baseline_iters_per_s:
        res["baseline_iters_per_s"] = round(baseline_iters_per_s, 3)
        res["vs_baseline"] = round(
            (1e3 / res["iter_ms"]) / baseline_iters_per_s, 1)

    # ---- per-iteration component breakdown ---------------------------
    from cvxopt_tpu import scaling as nt
    from cvxopt_tpu import kkt as kktmod

    @jax.jit
    def eigh_step(seed):
        key = jax.random.PRNGKey(seed)
        X = jax.random.normal(key, (m, m), jnp.float64)
        X = X @ X.T + m * jnp.eye(m)
        wv, V = jnp.linalg.eigh(X)
        return jnp.sum(wv) + jnp.sum(V)

    fac32 = kktmod.get_kktsolver("chol2", Gj, dims, A0,
                                 factor_dtype="float32")
    fac64 = kktmod.get_kktsolver("chol2", Gj, dims, A0)

    def mk_fs(fac):
        @jax.jit
        def factor_solve(seed):
            key = jax.random.PRNGKey(seed)
            d = jax.random.uniform(key, (m,), jnp.float64, 0.5, 2.0)
            r = jnp.diag(jnp.sqrt(d))
            W = {"d": jnp.zeros((0,)), "di": jnp.zeros((0,)),
                 "beta": [], "v": [], "r": [r[None]],
                 "rti": [r[None]]}
            sol = fac(W)
            ux, uy, Wuz = sol(c, b0, hj)
            return jnp.sum(ux) + jnp.sum(Wuz)

        return factor_solve

    def t_of(f):
        float(f(0))
        t0 = time.time()
        for r in range(3):
            float(f(r + 1))
        return (time.time() - t0) / 3 * 1e3

    res["breakdown_ms"] = {
        "eigh_f64": round(t_of(eigh_step), 1),
        "kkt_factor_solve_f32": round(t_of(mk_fs(fac32)), 1),
        "kkt_factor_solve_f64": round(t_of(mk_fs(fac64)), 1)}

    # ---- full-iteration attribution (VERDICT r04 #2): chained
    # in-jit timings of every component the conelp 's' iteration
    # calls (one-shot timings measure the ~25 ms round trip).
    # Budget-guarded: on a cold compile cache the ~10 extra programs
    # could eat the stage timeout and lose the MAIN result with them.
    from jax import lax as _lax

    if (time.time() - _stage_t0 > float(
            os.environ.get("BENCH_SDP_ATTR_BUDGET_S", 700))
            or os.environ.get("BENCH_SDP_ATTR", "1") == "0"):
        res["breakdown_ms"]["attribution"] = "skipped (stage budget)"
        return _bench_sdp_batched(res, maxiters)

    def chain_ms(step, K=6, reps=2):
        def runner(k):
            @jax.jit
            def f(seed):
                x0 = jnp.asarray(1.0 + 1e-9 * seed, jnp.float64)
                return _lax.fori_loop(0, k,
                                      lambda i, x: step(x), x0)
            return f

        out = {}
        for k, f in ((1, runner(1)), (K, runner(K))):
            float(np.asarray(f(0)))
            t0 = time.time()
            for r_ in range(reps):
                float(np.asarray(f(r_ + 1)))
            out[k] = (time.time() - t0) / reps
        return max((out[K] - out[1]) / (K - 1) * 1e3, 0.0)

    S0 = jnp.eye(m) * 2.0 + 0.05 * jnp.asarray(w)

    def _upd(x):
        s_ = (S0 * (1.0 + 1e-12 * x)).reshape(-1)
        Wn, lam = nt.compute_scaling(s_, s_ + 0.01, dims)
        return x + jnp.mean(lam) * 1e-9

    def _ms_pair(x):      # predictor max_step on the stacked pair
        X = S0 * (1.0 + 1e-12 * x)
        from cvxopt_tpu import cones as _cones
        t = _cones.max_step(
            jnp.stack([X.reshape(-1), (X + 0.01).reshape(-1)]), dims)
        return x + jnp.mean(t) * 1e-9

    def _mse_pair(x):     # corrector max_step_eig on the stacked pair
        X = S0 * (1.0 + 1e-12 * x)
        from cvxopt_tpu import cones as _cones
        t, sig, q = _cones.max_step_eig(
            jnp.stack([X.reshape(-1), (X + 0.01).reshape(-1)]), dims)
        return x + jnp.mean(sig) * 1e-9

    def _scale_chain(x):  # the per-solve W scalings (2x) + sprod
        s_ = (S0 * (1.0 + 1e-12 * x)).reshape(-1)
        Wn, lam = nt.compute_scaling(s_, s_ + 0.01, dims)
        a = nt.scale(s_, Wn, dims, trans="T")
        b_ = nt.scale(a, Wn, dims, inverse="I")
        from cvxopt_tpu import cones as _cones
        c_ = _cones.sprod(b_, a, dims)
        return x + jnp.mean(c_) * 1e-9

    def _resid(x):        # outer residual mvt pair on (m*m, m) f64
        from cvxopt_tpu.ops.matvec import mv as _mv, mvt as _mvt
        z_ = hj * (1.0 + 1e-12 * x)
        gz = _mvt(Gj, z_)
        gx = _mv(Gj, gz)
        return x + jnp.mean(gx) * 1e-9

    upd_ms = chain_ms(_upd)
    msp_ms = chain_ms(_ms_pair)
    mse_ms = chain_ms(_mse_pair)
    sc_ms = max(chain_ms(_scale_chain) - upd_ms, 0.0)
    rs_ms = chain_ms(_resid)
    bd = res["breakdown_ms"]
    bd.update(nt_update=round(upd_ms, 1),
              max_step_pair=round(msp_ms, 1),
              max_step_eig_pair=round(mse_ms, 1),
              scale2_sprod=round(sc_ms, 1),
              residual_mvt=round(rs_ms, 1))
    # one iteration = update_scaling + predictor max_step +
    # corrector max_step_eig + 1 factor (f32 early / f64-eigh late)
    # + ~5 KKT solve applications (f4 pred/corr at refinement=1 +
    # the HSD (c,b,h) solve; solve-only cost ~= factor_solve_f32 -
    # factor share, approximated by the f32 number) + 2 resid4-class
    # scaling chains + outer residuals
    attach = (upd_ms + msp_ms + mse_ms
              + bd["kkt_factor_solve_f64"]
              + 4 * max(bd["kkt_factor_solve_f32"] - 10.0, 2.0)
              + 2 * sc_ms + rs_ms)
    bd["iteration_attributed"] = round(attach, 1)
    if res.get("iter_ms"):
        bd["attribution_frac"] = round(attach / res["iter_ms"], 2)

    return _bench_sdp_batched(res, maxiters)


def _bench_sdp_batched(res, maxiters):
    """Batched small SDPs (f32 phase A + warm f64 phase B) — appended
    to the bench_sdp result."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu.conelp import make_conelp_cascade

    mb, nbatch = 50, 128
    dimsb = ConeDims(s=(mb,))
    solveb = make_conelp_cascade(dimsb, maxiters=maxiters,
                                 abstol=1e-7, reltol=1e-6,
                                 feastol=1e-7, shared_GhAb=False)
    _, Gb = _mcsdp_data(mb)
    Gbj = jnp.broadcast_to(jnp.asarray(Gb), (nbatch,) + Gb.shape)
    cbj = jnp.broadcast_to(jnp.ones((mb,), jnp.float64), (nbatch, mb))
    Abj = jnp.zeros((nbatch, 0, mb), jnp.float64)
    bbj = jnp.zeros((nbatch, 0), jnp.float64)

    @jax.jit
    def genb(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), nbatch)

        def one(k):
            W = jax.random.normal(k, (mb, mb), jnp.float64)
            W = (W + W.T) / np.sqrt(mb)
            return W.T.reshape(-1)

        return jax.vmap(one)(keys)

    def runb(seed):
        hb = genb(seed)
        out = solveb(cbj, Gbj, hb, Abj, bbj)
        return (out["status"], out["iterations"],
                jnp.max(out["gap"]), jnp.max(out["pres"]),
                jnp.max(out["relgap"]), jnp.max(out["dres"]))

    t0 = time.time()
    o = runb(0)
    _ = int(np.asarray(o[0]).sum())
    cb_s = time.time() - t0
    # best-of-2: single-shot batched timings on the tunnel showed 3x
    # run-to-run swings (r05 runs: 143 vs 44.7 it/s, identical
    # program) — take the best rep like the baseline stages do
    dtb, itb, solved = None, 0, 0
    for rep in (1, 2):
        t0 = time.time()
        o = runb(rep)
        s_ = int((np.asarray(o[0]) == 0).sum())
        i_ = int(np.asarray(o[1]).sum())
        d_ = time.time() - t0
        if dtb is None or i_ / d_ > itb / dtb:
            dtb, itb, solved = d_, i_, s_
    res["batched"] = dict(
        iters_per_s=round(itb / dtb, 1),
        solved=f"{solved}/{nbatch}",
        config=f"{nbatch}x mcsdp m={mb} at 1e-7/1e-6",
        max_gap=float(o[2]), max_pres=float(o[3]),
        # every "solved" claim must carry the relgap that the
        # gap<=abstol OR relgap<=reltol exit rests on (VERDICT r04 #5)
        max_relgap=float(o[4]), max_dres=float(o[5]),
        compile_s=round(cb_s, 1))
    return res


def bench_large_kkt(n=10240):
    """BASELINE primary metric: per-IPM-iteration KKT work for one
    large dense QP system at n=10k, split into its components:

      assembly : S = P + G' D G with fresh scaling weights d — a
                 rank-n update, the dominant matmul (hot spot #1,
                 /root/reference/src/python/misc.py:1352).  Runs at
                 3-pass 'high' f32 matmul precision (bf16x3): the
                 assembly feeds a factorization whose f32 roundoff is
                 already ~eps*kappa; the 6-pass 'highest' mode doubles
                 the cost for accuracy the factor cannot use.  The IPM
                 contract is preserved by f64 iterative refinement
                 exactly as in the cascade's phase B.
      factor   : cholesky(S)
      solve    : two triangular solves

    The problem data (G, P factor) is generated once and held
    device-resident; each timed rep re-assembles with fresh d."""
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

    hi = jax.lax.Precision.HIGHEST

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames="prec")
    def assemble(seed, F, Gt, prec="high"):
        key = jax.random.PRNGKey(seed)
        d = jax.random.uniform(key, (n,), jnp.float32, 0.5, 2.0)
        with jax.default_matmul_precision(prec):
            # dtype-explicit eye: under x64 a bare jnp.eye(n) is f64
            # and silently promoted THE WHOLE KKT MATRIX to f64 —
            # every r02-r04 "f32" factor number actually measured the
            # emulated-f64 op set (1599 ms vs the true f32 46 ms;
            # scripts/tpu_chol_novel.py, r05)
            S = F @ F.T + jnp.eye(n, dtype=jnp.float32) \
                + (Gt * d) @ Gt.T
        return S

    from cvxopt_tpu.ops.blockinv import (blocked_cholesky,
                                         panel_cholesky, spd_inverse)

    # the seed perturbations below keep every request distinct (the
    # remote backend caches identical requests) at negligible cost
    @jax.jit
    def factor_xla(seed, S):
        Sp = S.at[0, 0].add(1e-6 * seed)
        return jnp.sum(jnp.linalg.cholesky(Sp))

    @jax.jit
    def factor_blocked(seed, S):
        Sp = S.at[0, 0].add(1e-6 * seed)
        return jnp.sum(blocked_cholesky(Sp))

    @jax.jit
    def factor_panel(seed, S):
        Sp = S.at[0, 0].add(1e-6 * seed)
        return jnp.sum(panel_cholesky(Sp, panel=512))

    @jax.jit
    def factor_inv(seed, S):
        Sp = S.at[0, 0].add(1e-6 * seed)
        return jnp.sum(spd_inverse(Sp, base=1280))

    @jax.jit
    def solve(seed, L):
        b = jax.random.normal(jax.random.PRNGKey(seed), (n,),
                              jnp.float32)
        y = jsl.solve_triangular(L, b[:, None], lower=True)
        x = jsl.solve_triangular(L.T, y, lower=False)
        return x.sum()

    @jax.jit
    def solve_inv(seed, Sinv):
        b = jax.random.normal(jax.random.PRNGKey(seed), (n,),
                              jnp.float32)
        return (Sinv @ b).sum()

    def t_of(f, *args):
        # fetch a scalar per rep: block_until_ready does not force a
        # sync on the remote (axon) backend
        float(jnp.sum(f(0, *args)))
        t0 = time.time()
        reps = 3
        for r in range(reps):
            float(jnp.sum(f(r + 1, *args)))
        return (time.time() - t0) / reps

    t_asm_hi = t_of(lambda s, F, Gt: assemble(s, F, Gt, prec="high"),
                    F, Gt)
    t_asm_hst = t_of(
        lambda s, F, Gt: assemble(s, F, Gt, prec="highest"), F, Gt)
    S = assemble(0, F, Gt, prec="high")
    L = jnp.linalg.cholesky(S)
    _ = float(L[0, 0])
    t_fac = t_of(factor_xla, S)
    t_fac_blk = t_of(factor_blocked, S)
    try:
        t_fac_pan = t_of(factor_panel, S)
        # accuracy probe: reconstruction residual of the panel factor
        Lp = panel_cholesky(S, panel=512)
        panel_relres = float(
            jnp.linalg.norm(Lp @ Lp.T - S) / jnp.linalg.norm(S))
    except Exception as e:                           # pragma: no cover
        t_fac_pan, panel_relres = None, repr(e)[:120]
    try:
        t_fac_inv = t_of(factor_inv, S)
        Sinv = spd_inverse(S, base=1280)
        t_sol_inv = t_of(solve_inv, Sinv)
        # accuracy probe of the inverse route (f32, kappa-limited —
        # the IPM's f64 refinement consumes this)
        b = jnp.ones((n,), jnp.float32)
        relres = float(jnp.linalg.norm(S @ (Sinv @ b) - b)
                       / jnp.linalg.norm(b))
    except Exception as e:                           # pragma: no cover
        t_fac_inv, t_sol_inv, relres = None, None, repr(e)[:120]
    t_sol = t_of(solve, L)
    best_fac = min(x for x in (t_fac, t_fac_blk, t_fac_inv, t_fac_pan)
                   if x is not None)
    best_sol = t_sol_inv if (t_fac_inv is not None
                             and t_fac_inv == best_fac) else t_sol
    total = t_asm_hi + best_fac + best_sol
    return dict(total_ms=round(total * 1e3, 1),
                assembly_high_ms=round(t_asm_hi * 1e3, 1),
                assembly_highest_ms=round(t_asm_hst * 1e3, 1),
                factor_xla_chol_ms=round(t_fac * 1e3, 1),
                factor_blocked_chol_ms=round(t_fac_blk * 1e3, 1),
                factor_panel_chol_ms=(
                    round(t_fac_pan * 1e3, 1) if t_fac_pan else None),
                panel_relres_f32=panel_relres,
                factor_spd_inverse_ms=(
                    round(t_fac_inv * 1e3, 1) if t_fac_inv else None),
                solve_triangular_ms=round(t_sol * 1e3, 1),
                solve_inverse_matvec_ms=(
                    round(t_sol_inv * 1e3, 1) if t_sol_inv else None),
                inverse_relres_f32=relres,
                factor_ms=round(best_fac * 1e3, 1),
                solve_ms=round(best_sol * 1e3, 1),
                note="f32 + f64 iterative refinement; assembly at "
                     "3-pass 'high' matmul precision; factor/solve = "
                     "best of XLA chol / blocked chol / panel chol / "
                     "spd_inverse")


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
                jnp.max(out["pres"]), jnp.max(out["dres"]),
                jnp.max(out["relgap"]))

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
                max_dres=float(o[4]), max_relgap=float(o[5]),
                compile_s=round(compile_s, 1))


def _chain_lp(n):
    """The banded chain-LP family used by bench_sparse: box bounds
    plus |x_i - x_{i+1}| <= 0.5 coupling rows."""
    import scipy.sparse as sp
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
    return c, G, np.asarray(h)


def bench_sparse(n=100_000):
    """Sparse direct path: an LP with n variables and banded structure
    solved end-to-end through the RCM + fixed-pattern banded-Cholesky
    kktsolver — never densifying G (dense would be 4e10 entries at
    this size).  Two backends are timed: the CPU scalar-scan factor
    (O(n kd^2) structured-scaling metric) and, on TPU, the block-panel
    `pbtrf_blocked` factor (n/cb dense MXU panels, f64)."""
    import jax
    from cvxopt_tpu.ops.sparse_kkt import lp_sparse

    c, G, h = _chain_lp(n)
    r = G.shape[0]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t0 = time.time()
        sol = lp_sparse(c, G, h,
                        options={"maxiters": 30}, method="scan")
        dt = time.time() - t0
    relg = sol.get("relative gap")
    res = dict(n=n, m=r, status=sol["status"],
               iterations=sol["iterations"],
               solve_s=round(dt, 1), gap=sol["gap"],
               relgap=(None if relg is None else float(relg)),
               device="cpu (structured-scaling metric)")
    # The TPU block-panel attempt at n=100k KILLS the remote worker
    # (kernel fault) — r05 root-cause bound: the fused
    # IPM-while_loop + blocked-banded-scan program faults for n in
    # (20000, 50000]; n<=20000 runs, and STANDALONE pbtrf_blocked
    # runs to n=131072 (scripts/tpu_sparse_repro.py) — a platform
    # (libtpu/XLA) fault, not repo code.  The on-device number is
    # therefore taken at the safe n=20000: measured r05 at 11
    # iterations / ~150 s (emulated-f64 chol-in-scan, ~14 s/iter) —
    # REJECTED vs the CPU scan backend (n=1e5 in 2.7 s), recorded
    # for the artifact.  BENCH_SPARSE_TPU=0 skips; =full attempts
    # the crashing size (don't).
    mode = os.environ.get("BENCH_SPARSE_TPU", "1")
    if mode != "0" and jax.devices()[0].platform != "cpu":
        n_tpu = n if mode == "full" else min(n, 20_000)
        try:
            if n_tpu < n:
                # shrink the chain problem to the safe size
                c2, G2, h2 = _chain_lp(n_tpu)
            else:
                c2, G2, h2 = c, G, np.asarray(h)
            t0 = time.time()
            sol2 = lp_sparse(c2, G2, h2, options={"maxiters": 30},
                             method="blocked")
            relg2 = sol2.get("relative gap")
            res["tpu_blocked"] = dict(
                n=n_tpu, status=sol2["status"],
                iterations=sol2["iterations"],
                solve_s=round(time.time() - t0, 1),
                gap=sol2["gap"],
                relgap=(None if relg2 is None else float(relg2)),
                device="tpu",
                note="safe-size run; n>20k faults the worker "
                     "(platform bug, see bench_sparse comment); "
                     "rejected vs the CPU scan backend on speed")
        except Exception as e:                       # pragma: no cover
            res["tpu_blocked"] = {"error": repr(e)[:160]}
    return res


def bench_batched_lp(nb=256, n=16, mextra=8, maxiters=400):
    """Batched exact-vertex LPs through the vmapped native simplex
    (simplex.py:32-34's story): nb small LPs solved as ONE jitted
    program, vs scipy.optimize.linprog (HiGHS dual simplex) solving
    the same instances one at a time on the host — the per-instance
    C-simplex pattern of the reference's glpk bridge."""
    import jax
    import jax.numpy as jnp
    from cvxopt_tpu.simplex import make_simplex

    m = 2 * n + mextra
    rng = np.random.default_rng(5)
    I = np.eye(n)
    Gfix = np.vstack([I, -I])
    Pn = rng.standard_normal((nb, mextra, n)) / np.sqrt(n)
    G = np.broadcast_to(Gfix, (nb, 2 * n, n))
    G = np.concatenate([G, Pn], axis=1)
    h = np.concatenate(
        [np.ones((nb, n)), np.zeros((nb, n)),
         Pn @ np.full(n, 0.5) + rng.uniform(0.05, 0.5, (nb, mextra))],
        axis=1)
    cobj = rng.standard_normal((nb, n))
    A = np.broadcast_to(np.ones((1, n)), (nb, 1, n))
    b = np.full((nb, 1), n / 2.0)

    run = make_simplex(n, m, 1, maxiters, batched=True)
    args = tuple(jnp.asarray(v) for v in (cobj, G, h, A, b))
    code, x, z, y = run(*args)
    solved = int((np.asarray(code) == 0).sum())
    t0 = time.time()
    reps = 3
    for r in range(reps):
        code, x, z, y = run(args[0] + 1e-12 * (r + 1), *args[1:])
        _ = int(np.asarray(code).sum())        # force a real sync
    dt = (time.time() - t0) / reps
    objs = np.einsum("bi,bi->b", np.asarray(x), cobj)

    # scipy HiGHS baseline, one instance at a time
    from scipy.optimize import linprog
    t0 = time.time()
    sobjs = []
    for i in range(nb):
        r = linprog(cobj[i], A_ub=Pn[i], b_ub=h[i, 2 * n:],
                    A_eq=A[i], b_eq=b[i], bounds=(0.0, 1.0),
                    method="highs")
        sobjs.append(r.fun)
    dt_scipy = time.time() - t0
    gap = float(np.max(np.abs(objs - np.asarray(sobjs))))
    return dict(lps_per_s=round(nb / dt, 1),
                scipy_lps_per_s=round(nb / dt_scipy, 1),
                vs_scipy=round(dt_scipy / dt, 2),
                solved=f"{solved}/{nb}",
                max_obj_diff_vs_scipy=gap,
                config=f"{nb}x n={n} m={m} LPs, vmapped simplex")


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
    dev = run_stage("device", 180)
    if not isinstance(dev, dict) or "platform" not in dev:
        RESULT["device"] = dev                       # pragma: no cover
        emit()
        return
    RESULT["device"] = dev["device"]
    on_tpu = dev["platform"] != "cpu"
    n = int(os.environ.get("BENCH_N", 256))
    nb = int(os.environ.get("BENCH_B", 1024 if on_tpu else 8))
    RESULT["config"] = (f"{nb}x n={n} scenario QPs (l=2n box+budget), "
                        f"abstol=reltol=feastol=1e-7")
    emit()

    # ---- single-core baselines FIRST, before device work contends
    # for host CPU (see bench_cpu_baseline) --------------------------
    base = run_stage("cpu_baseline", 300, {"n": n, "tol": 1e-7})
    if isinstance(base, dict) and "iters_per_s" in base:
        RESULT["baseline_iters_per_s"] = round(base["iters_per_s"], 2)
    socp_base = None
    if on_tpu and os.environ.get("BENCH_SOCP", "1") != "0":
        socp_base = run_stage("socp_baseline", 240)
        if isinstance(socp_base, dict):              # error/skip
            RESULT["socp_baseline"] = socp_base
            socp_base = None
    sdp_base = None
    if on_tpu and os.environ.get("BENCH_SDP", "1") != "0":
        sdp_base = run_stage("sdp_baseline", 180)
        if isinstance(sdp_base, dict):               # error/skip
            RESULT["sdp_baseline"] = sdp_base
            sdp_base = None
    emit()

    # ---- headline: batched QP cascade at 1e-7 ----------------------
    main_res = run_stage("cascade", 700, {"nb": nb, "n": n})
    if isinstance(main_res, dict) and "iters_per_s" in main_res:
        RESULT["value"] = round(main_res["iters_per_s"], 2)
        if RESULT.get("baseline_iters_per_s"):
            RESULT["vs_baseline"] = round(
                main_res["iters_per_s"] / RESULT["baseline_iters_per_s"],
                2)
        RESULT["solved"] = main_res["solved"]
        RESULT["max_gap"] = main_res["max_gap"]
        # max_relgap may exceed reltol: those instances exit on the
        # gap <= abstol=1e-7 branch of the reference's OR-exit
        # (coneprog.py:2220) with small |pcost| inflating the
        # relative measure — same semantics as the reference
        RESULT["max_relgap"] = main_res["max_relgap"]
        RESULT["max_pres"] = main_res["max_pres"]
        RESULT["max_dres"] = main_res["max_dres"]
        RESULT["rescue_iters"] = main_res["rescue_iters"]
        RESULT["phase1_frac"] = main_res["phase1_frac"]
        RESULT["batch_time_s"] = round(main_res["time_s"], 3)
        RESULT["compile_s"] = round(main_res["compile_s"], 1)
    else:                                            # pragma: no cover
        RESULT["cascade_error"] = main_res
    emit()

    # ---- SOCP (north-star config) ----------------------------------
    if os.environ.get("BENCH_SOCP", "1") != "0":
        kw = {"nb": int(os.environ.get("BENCH_SOCP_NB",
                                       2048 if on_tpu else 4)),
              "n": 64 if on_tpu else 16,
              "nq": 100 if on_tpu else 10,
              "chunks": int(os.environ.get("BENCH_SOCP_CHUNKS",
                                           5 if on_tpu else 1)),
              "baseline_iters_per_s": socp_base}
        RESULT["socp"] = run_stage("socp", 700, kw)
        emit()

    # ---- n=10240 KKT component breakdown (BASELINE primary) --------
    if os.environ.get("BENCH_LARGE", "1") != "0":
        RESULT["kkt_factor_solve_ms_n10240"] = run_stage(
            "large_kkt", 900, {"n": 10240 if on_tpu else 2048})
        emit()

    # ---- SDP (mcsdp m=200 + batched 16x m=50) ----------------------
    # generous timeout: one f64 eigh costs ~165 s of REMOTE COMPILE on
    # the axon tunnel (measured r04) and the SDP programs embed
    # several; with a warm persistent cache the stage runs in ~1 min
    if os.environ.get("BENCH_SDP", "1") != "0":
        RESULT["sdp"] = run_stage(
            "sdp", 1200, {"m": 200 if on_tpu else 25,
                          "baseline_iters_per_s": sdp_base})
        emit()

    # ---- Markowitz portfolio QPs -----------------------------------
    if on_tpu and os.environ.get("BENCH_MARKOWITZ", "1") != "0":
        RESULT["markowitz"] = run_stage("markowitz", 400)
        emit()

    # ---- batched vmapped simplex (exact-vertex LPs) ----------------
    if os.environ.get("BENCH_LP", "1") != "0":
        RESULT["batched_lp"] = run_stage("batched_lp", 300)
        emit()

    # ---- f32 diagnostic mode ---------------------------------------
    if on_tpu and os.environ.get("BENCH_F32", "1") != "0":
        RESULT["f32_mode"] = run_stage("f32", 300,
                                       {"nb": nb, "n": n})
        emit()

    # ---- sparse LP LAST (its TPU attempt is opt-in, see above) -----
    if os.environ.get("BENCH_SPARSE", "1") != "0":
        RESULT["sparse_lp"] = run_stage(
            "sparse", 400, {"n": 100_000 if on_tpu else 20_000})

    RESULT["incomplete"] = False
    RESULT["total_s"] = round(time.time() - T0, 1)
    emit()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        kwargs = {}
        if len(sys.argv) > 4 and sys.argv[3] == "--args":
            kwargs = json.loads(sys.argv[4])
        stage_main(sys.argv[2], kwargs)
    else:
        main()
