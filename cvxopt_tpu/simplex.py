"""Dense two-phase revised simplex — the native backend for the
`glpk.lp` surface (reference: /root/reference/src/C/glpk.c:85 `lp`,
exported `:994`, dispatched from `solvers.lp(solver='glpk')`,
coneprog.py:2807-2875).

The reference delegates to GLPK's C simplex for exact vertex
solutions.  The TPU-native equivalent is a jax implementation designed
for the platform rather than a binding: the whole solve is one
`lax.while_loop` over fixed-shape state, so it jits once and — unlike
any C simplex — **vmaps across problem batches**, amortizing pivot
latency exactly the way the batched IPM cores do.

Formulation (matching glpk.lp):

    minimize c'x   s.t.  G x <= h,  A x = b          (x free)

Standard form: free x is split x = x+ - x- (all columns lb=0), slacks
are appended for the G rows, artificials complete the phase-1 crash
basis (slacks serve where the rhs sign allows), rows are sign-scaled
to a nonnegative rhs, and the data is max-norm equilibrated (boeing2-
class dynamic range defeats fixed pivot tolerances otherwise).

Numerical design — STATELESS pivots: each iteration refactorizes the
basis from scratch (QR; f64-portable — TPU has no f64 LU lowering)
instead of carrying product-form eta updates.  Measured on boeing2
(NETLIB, 382 rows): eta updates + periodic refactorization let the
inverse drift to 1e14 across degenerate-pivot runs and every
tolerance heuristic downstream collapses; the fresh-QR loop solves it
in 522 pivots to pinf 1e-10 / dinf 1e-13 with no growth heuristics,
no pivot banning and no artificial drive-out pass at all.  O(m^3) per
pivot is the honest price: this surface exists for exact-vertex
parity (the IPM cores are the performance path), and the batched-
vmap mode targets small LPs where the cube is trivial.

Pricing: Dantzig (most negative reduced cost) with Bland's rule
engaging after a run of degenerate steps (anti-cycling).  Ratio test:
two-pass Harris — pass 1 relaxes each bound by a feasibility
tolerance, pass 2 picks the largest-|pivot| row under the relaxed
bound.  Basic artificials are zero-capped in phase 2 (rows where a
pivot would RAISE one also block, forcing a degenerate pivot that
ejects it), which subsumes the classical drive-out pass.

Returns the glpk.lp tuple (status, x, z, y) with duals satisfying
c + G'z + A'y = 0, z >= 0 at optimality.  Statuses: 'optimal',
'primal infeasible', 'dual infeasible' (unbounded primal), 'unknown'
(iteration limit).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

from cvxopt_tpu.ops.matvec import mv, mvt

__all__ = ["simplex_core", "make_simplex", "lp"]

_BLAND_AFTER = 25      # degenerate steps before Bland's rule kicks in

# status codes (core)
OPTIMAL, PRIMAL_INFEASIBLE, DUAL_INFEASIBLE, UNKNOWN = 0, 1, 2, 3
_STATUS = {OPTIMAL: "optimal", PRIMAL_INFEASIBLE: "primal infeasible",
           DUAL_INFEASIBLE: "dual infeasible", UNKNOWN: "unknown"}


def _binv_xb(W, basis, r):
    """Fresh basis inverse + basic values via QR (see module
    docstring: stateless pivots are the stability design)."""
    B = W[:, basis]
    Q, R = jnp.linalg.qr(B)
    Binv = jsl.solve_triangular(R, jnp.swapaxes(Q, -1, -2),
                                lower=False)
    return Binv, mv(Binv, r)


def _phase(W, r, cost, enter_ok, basis, cap, cap_art=None, degen0=0):
    """One (resumable) simplex phase: minimize cost'x over
    {W x = r, x >= 0} from the given basis, for at most ``cap``
    pivots (``cap`` may be a traced scalar — the tm_lim host loop
    re-enters with the carried state).  ``cap_art`` marks zero-capped
    columns (phase-2 artificials).  Returns (basis, code, it, degen)
    with code == -1 when the pivot cap was hit mid-phase."""
    m, ncols = W.shape
    idx = jnp.arange(ncols)
    dtol = 1e-9 * (1.0 + jnp.max(jnp.abs(cost)))
    wtol = 1e-7

    def cond(st):
        basis, it, degen, code = st
        return (code < 0) & (it < cap)

    def body(st):
        basis, it, degen, code = st
        Binv, xB = _binv_xb(W, basis, r)
        xp = jnp.maximum(xB, 0.0)
        in_basis = jnp.zeros((ncols,), bool).at[basis].set(True)
        y = mvt(Binv, cost[basis])
        d = cost - mvt(W, y)
        elig = (~in_basis) & enter_ok & (d < -dtol)
        any_elig = jnp.any(elig)

        use_bland = degen >= _BLAND_AFTER
        j_dantzig = jnp.argmin(jnp.where(elig, d, jnp.inf))
        j_bland = jnp.argmin(jnp.where(elig, idx, ncols))
        j = jnp.where(use_bland, j_bland, j_dantzig)

        w = mv(Binv, W[:, j])
        ptol = 1e-9 * (1.0 + jnp.max(xp))
        bu = w > wtol
        if cap_art is not None:
            bd = cap_art[basis] & (w < -wtol)
        else:
            bd = jnp.zeros((m,), bool)
        blocked = bu | bd
        unbounded = ~jnp.any(blocked)

        wsafe_u = jnp.where(bu, w, 1.0)
        wsafe_d = jnp.where(bd, w, 1.0)
        # Harris pass 1: tolerance-relaxed bound
        rel = jnp.where(bu, (xp + ptol) / wsafe_u, jnp.inf)
        rel = jnp.where(
            bd, jnp.maximum(xp / wsafe_d, 0.0) + ptol / jnp.abs(wsafe_d),
            rel)
        tb = jnp.min(rel)
        # Harris pass 2: exact ratios; largest |pivot| under the bound
        rat = jnp.where(bu, xp / wsafe_u, jnp.inf)
        rat = jnp.where(bd, jnp.maximum(xp / wsafe_d, 0.0), rat)
        cand = blocked & (rat <= tb)
        i_harris = jnp.argmax(jnp.where(cand, jnp.abs(w), -jnp.inf))
        # Bland's rule must tie-break on the EXACT minimum-ratio set
        # (not the Harris-relaxed one) for its termination guarantee
        tmin = jnp.min(jnp.where(blocked, rat, jnp.inf))
        cand_exact = blocked & (rat <= tmin)
        i_bland = jnp.argmin(jnp.where(cand_exact, basis, ncols))
        i = jnp.where(use_bland, i_bland, i_harris)
        t = jnp.maximum(rat[i], 0.0)

        basis2 = basis.at[i].set(j.astype(basis.dtype))
        degen2 = jnp.where(t <= 1e-11, degen + 1, 0).astype(jnp.int32)

        code2 = jnp.where(~any_elig, OPTIMAL,
                          jnp.where(unbounded, DUAL_INFEASIBLE,
                                    -1)).astype(jnp.int32)
        take = code2 < 0
        return (jnp.where(take, basis2, basis), it + 1,
                jnp.where(take, degen2, degen), code2)

    st = (basis, jnp.asarray(0, jnp.int32),
          jnp.asarray(degen0, jnp.int32), jnp.asarray(-1, jnp.int32))
    basis, it, degen, code = lax.while_loop(cond, body, st)
    return basis, code, it, degen


def _setup(c, G, h, A, b):
    """Standard-form setup (jittable): equilibrate, sign-scale, build
    the working tableau columns and the crash basis.  Returns a dict
    of arrays consumed by `_phase`/`_extract`."""
    n = c.shape[0]
    mG = G.shape[0]
    p = A.shape[0]
    m = mG + p
    dt = jnp.asarray(c).dtype

    GA = jnp.concatenate([G, A], axis=0)
    r0 = jnp.concatenate([h, b])

    # ---- max-norm equilibration --------------------------------------
    def _guard(v):
        return jnp.where(v > 1e-300, v, 1.0)

    if m and n:
        rs = 1.0 / _guard(jnp.max(jnp.abs(GA), axis=1))
        cs = 1.0 / _guard(jnp.max(jnp.abs(GA * rs[:, None]), axis=0))
    else:
        rs = jnp.ones((m,), dt)
        cs = jnp.ones((n,), dt)
    GA = GA * rs[:, None] * cs[None, :]
    r0 = r0 * rs
    cobj = jnp.asarray(c) * cs

    sgn = jnp.where(r0 < 0, -1.0, 1.0).astype(dt)
    # rows: [G I; A 0], sign-scaled; columns: x+ | x- | slack | artif.
    # The artificial identity is NOT sign-scaled: its columns must be
    # +e_i so the crash basis has value r_i >= 0 (a sgn-scaled
    # artificial column would be -e_i on negative-rhs rows and the
    # "feasible" artificial start would carry negative basics).
    S = jnp.concatenate(
        [jnp.eye(mG, dtype=dt), jnp.zeros((p, mG), dt)], axis=0)
    W = jnp.concatenate([GA, -GA, S], axis=1) * sgn[:, None]
    W = jnp.concatenate([W, jnp.eye(m, dtype=dt)], axis=1)
    r = r0 * sgn
    ncols = 2 * n + mG + m
    nreal = 2 * n + mG

    # ---- crash basis: slacks where the sign allows -------------------
    row_idx = jnp.arange(m)
    slack_ok = (row_idx < mG) & (sgn > 0)
    basis0 = jnp.where(slack_ok, 2 * n + row_idx,
                       nreal + row_idx).astype(jnp.int32)

    col_idx = jnp.arange(ncols)
    is_art = col_idx >= nreal

    c1 = jnp.where(is_art, 1.0, 0.0).astype(dt)
    c2 = jnp.concatenate([cobj, -cobj, jnp.zeros((mG + m,), dt)])
    c2 = jnp.where(is_art, 0.0, c2)
    # only arrays in S: it crosses jit boundaries as a pytree, and
    # plain ints would come back as traced scalars
    return dict(W=W, r=r, c1=c1, c2=c2, is_art=is_art, basis0=basis0,
                cs=cs, rs=rs, sgn=sgn)


def _feas_ok(S, basis):
    """Phase-1 exit check: artificial infeasibility below tolerance."""
    _, xB1 = _binv_xb(S["W"], basis, S["r"])
    infeas = jnp.sum(jnp.where(S["is_art"][basis],
                               jnp.maximum(xB1, 0.0), 0.0))
    return infeas <= 1e-7 * (1.0 + jnp.linalg.norm(S["r"]))


def _extract(S, basis):
    """Vertex + duals from the final basis (undo sign/equilibration)."""
    cs, rs, sgn = S["cs"], S["rs"], S["sgn"]
    m, ncols = S["W"].shape
    n = cs.shape[0]
    mG = ncols - 2 * n - m              # columns: x+ | x- | slack | art
    Binv, xB = _binv_xb(S["W"], basis, S["r"])
    xfull = jnp.zeros((ncols,), xB.dtype).at[basis].set(xB)
    x = (xfull[:n] - xfull[n:2 * n]) * cs
    y_s = mvt(Binv, S["c2"][basis])      # duals in sign-scaled space
    z = -sgn[:mG] * y_s[:mG] * rs[:mG]
    y = -sgn[mG:] * y_s[mG:] * rs[mG:]
    z = jnp.maximum(z, 0.0)              # clip pivot-tolerance dust
    return x, z, y


def simplex_core(c, G, h, A, b, maxiters):
    """Jittable core: returns (code, x, z, y) as arrays.  Shapes are
    static; vmap over a leading batch axis for batched vertex solves.
    ``maxiters`` caps the TOTAL pivot count across both phases (GLPK's
    it_lim semantics: one simplex-iteration budget for the solve)."""
    S = _setup(c, G, h, A, b)
    W, r, is_art = S["W"], S["r"], S["is_art"]

    # ---- phase 1: minimize sum of artificials ------------------------
    basis, code1, it1, _ = _phase(W, r, S["c1"], ~is_art, S["basis0"],
                                  maxiters)
    feas_ok = _feas_ok(S, basis)

    # ---- phase 2: real costs; basic artificials zero-capped ----------
    basis, code2, _, _ = _phase(W, r, S["c2"], ~is_art, basis,
                                jnp.maximum(maxiters - it1, 0),
                                cap_art=is_art)
    code1 = jnp.where(code1 < 0, UNKNOWN, code1)
    code2 = jnp.where(code2 < 0, UNKNOWN, code2)

    x, z, y = _extract(S, basis)
    code = jnp.where(
        ~feas_ok & (code1 == OPTIMAL), PRIMAL_INFEASIBLE,
        jnp.where(code1 != OPTIMAL, UNKNOWN, code2))
    return code, x, z, y


@functools.lru_cache(maxsize=32)
def make_simplex(n, mG, p, maxiters, batched=False):
    """Build the jitted simplex for the given shape.  ``batched=True``
    returns the vmapped form (leading batch axis on every argument) —
    the TPU-native batch-of-vertex-solves mode."""
    def run(c, G, h, A, b):
        return simplex_core(c, G, h, A, b, maxiters)

    if batched:
        run = jax.vmap(run)
    return jax.jit(run)


# jitted pieces for the tm_lim (time-limited) host-chunked driver;
# jit retraces per problem shape automatically
_setup_j = jax.jit(_setup)
_feas_j = jax.jit(_feas_ok)
_extract_j = jax.jit(_extract)
_phase1_j = jax.jit(lambda S, basis, degen, cap: _phase(
    S["W"], S["r"], S["c1"], ~S["is_art"], basis, cap, degen0=degen))
_phase2_j = jax.jit(lambda S, basis, degen, cap: _phase(
    S["W"], S["r"], S["c2"], ~S["is_art"], basis, cap,
    cap_art=S["is_art"], degen0=degen))

_TIME_LIMIT = -2                        # host-loop marker, maps UNKNOWN


def _simplex_timed(c, G, h, A, b, maxiters, tm_lim_ms, verbose):
    """tm_lim driver (GLPK smcp.tm_lim semantics, glpk.c:323-327):
    the phases run as host-driven chunks of pivots, checking the
    wall-clock deadline between chunks; exceeding it returns
    'unknown' (the reference maps GLP_ETMLIM the same way)."""
    import time as _time
    deadline = _time.time() + tm_lim_ms / 1000.0
    S = _setup_j(c, G, h, A, b)
    chunk = 64

    def run(phase_fn, basis, budget, label):
        done, degen, code = 0, 0, -1
        while code < 0 and done < budget:
            if _time.time() >= deadline:
                return basis, _TIME_LIMIT, done
            cap = min(chunk, budget - done)
            basis, code, itc, degen = phase_fn(
                S, basis, jnp.asarray(degen, jnp.int32),
                jnp.asarray(cap, jnp.int32))
            code, done, degen = int(code), done + int(itc), int(degen)
            if verbose:
                print(f"glpk.lp native simplex: {label} pivot {done}")
        return basis, code, done

    basis, code1, it1 = run(_phase1_j, S["basis0"], maxiters, "phase 1")
    if code1 == _TIME_LIMIT or code1 == -1:
        return UNKNOWN, None, None, None
    if code1 == OPTIMAL and not bool(_feas_j(S, basis)):
        return PRIMAL_INFEASIBLE, None, None, None
    if code1 != OPTIMAL:
        return UNKNOWN, None, None, None
    basis, code2, _ = run(_phase2_j, basis, maxiters - it1, "phase 2")
    if code2 == _TIME_LIMIT or code2 == -1:
        return UNKNOWN, None, None, None
    x, z, y = _extract_j(S, basis)
    return int(code2), x, z, y


_MSG_LEVELS = ("GLP_MSG_OFF", "GLP_MSG_ERR", "GLP_MSG_ON",
               "GLP_MSG_ALL")


def lp(c, G, h, A=None, b=None, options=None):
    """glpk.lp-compatible entry: (status, x, z, y) — or (status, x, z)
    when A is omitted — via the native simplex.  Options use GLPK
    parameter names with the reference's plumbing (glpk.c:214-330):
    when ``options`` is None the module-level `cvxopt_tpu.glpk.options`
    dict applies; recognized keys are 'it_lim' (total simplex pivot
    limit), 'tm_lim' (wall-clock limit in ms — enforced by a
    host-chunked drive of the jitted phases), and 'msg_lev'
    (GLP_MSG_OFF/ERR/ON/ALL; ON prints a solve summary, ALL per-chunk
    progress).  Unrecognized values warn and fall back to defaults,
    matching the reference's PyErr_WarnEx behavior."""
    import warnings

    c = np.asarray(c, dtype=np.float64).reshape(-1)
    n = c.shape[0]
    G = np.asarray(G, dtype=np.float64).reshape(-1, n)
    h = np.asarray(h, dtype=np.float64).reshape(-1)
    has_A = A is not None
    if has_A:
        A = np.asarray(A, dtype=np.float64).reshape(-1, n)
        b = np.asarray(b, dtype=np.float64).reshape(-1)
    else:
        A = np.zeros((0, n))
        b = np.zeros((0,))
    if options is None:
        # reference fallback (glpk.c:214): module options dict applies
        # when no options kwarg is passed
        from cvxopt_tpu import glpk as _glpk
        options = _glpk.options
    opts = dict(options or {})

    msg_lev = opts.get("msg_lev", "GLP_MSG_OFF")
    if msg_lev not in _MSG_LEVELS:
        warnings.warn("replacing glpk.options['msg_lev'] with default "
                      "value")
        msg_lev = "GLP_MSG_OFF"
    it_lim = opts.get("it_lim")
    if it_lim is not None and not isinstance(it_lim, int):
        warnings.warn("replacing glpk.options['it_lim'] with default "
                      "value")
        it_lim = None
    tm_lim = opts.get("tm_lim")
    if tm_lim is not None and not isinstance(tm_lim, int):
        warnings.warn("replacing glpk.options['tm_lim'] with default "
                      "value")
        tm_lim = None
    maxiters = int(it_lim or 50 * (G.shape[0] + A.shape[0] + n) + 1000)

    t0 = __import__("time").time()
    if tm_lim and tm_lim > 0:
        code, x, z, y = _simplex_timed(
            jnp.asarray(c), jnp.asarray(G), jnp.asarray(h),
            jnp.asarray(A), jnp.asarray(b), maxiters, tm_lim,
            verbose=(msg_lev == "GLP_MSG_ALL"))
    else:
        run = make_simplex(n, G.shape[0], A.shape[0], maxiters)
        code, x, z, y = run(jnp.asarray(c), jnp.asarray(G),
                            jnp.asarray(h), jnp.asarray(A),
                            jnp.asarray(b))
        code = int(code)
    status = _STATUS[code]
    if msg_lev in ("GLP_MSG_ON", "GLP_MSG_ALL"):
        print(f"glpk.lp native simplex: n={n} m={G.shape[0]} "
              f"p={A.shape[0]} status={status} "
              f"({__import__('time').time() - t0:.3f}s)")
    if status != "optimal":
        out = (status, None, None)
        return out + (None,) if has_A else out
    if has_A:
        return status, np.asarray(x), np.asarray(z), np.asarray(y)
    return status, np.asarray(x), np.asarray(z)
