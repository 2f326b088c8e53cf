"""Dense two-phase revised simplex — the native backend for the
`glpk.lp` surface (reference: /root/reference/src/C/glpk.c:85 `lp`,
exported `:994`, dispatched from `solvers.lp(solver='glpk')`,
coneprog.py:2807-2875).

The reference delegates to GLPK's C simplex for exact vertex
solutions.  The TPU-native equivalent is a jax implementation designed
for the platform rather than a binding: the whole solve is one
`lax.while_loop` over fixed-shape dense state (basis inverse, basic
values, index sets), so it jits once and — unlike any C simplex —
**vmaps across problem batches**, amortizing the pivot latency exactly
the way the batched IPM cores do.

Formulation (matching glpk.lp):

    minimize c'x   s.t.  G x <= h,  A x = b          (x free)

Standard form: free x is split x = x+ - x- (all columns lb=0), slacks
are appended for the G rows, and a full artificial identity provides
the phase-1 basis; rows are sign-scaled so the rhs is nonnegative.

Per pivot: duals y = Binv' c_B, reduced costs d = c - W'y (one (m,
ncols) matvec), Dantzig pricing with a Bland's-rule fallback after a
run of degenerate steps (anti-cycling), textbook ratio test, and a
product-form (eta) basis-inverse update — all fixed-shape jax ops.

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
from jax import lax

from cvxopt_tpu.ops.matvec import mv, mvt

__all__ = ["simplex_core", "make_simplex", "lp"]

_TOL = 1e-9
_BLAND_AFTER = 25      # degenerate steps before Bland's rule kicks in

# status codes (core)
OPTIMAL, PRIMAL_INFEASIBLE, DUAL_INFEASIBLE, UNKNOWN = 0, 1, 2, 3
_STATUS = {OPTIMAL: "optimal", PRIMAL_INFEASIBLE: "primal infeasible",
           DUAL_INFEASIBLE: "dual infeasible", UNKNOWN: "unknown"}


def _phase(W, cost, enter_ok, basis, Binv, xB, maxiters):
    """One simplex phase: minimize cost'x over {W x = r, x >= 0}
    starting from the given basis.  Returns (basis, Binv, xB, code)
    where code is OPTIMAL (no entering column) or DUAL_INFEASIBLE
    (unbounded ray) or UNKNOWN (iteration cap)."""
    m, ncols = W.shape
    idx = jnp.arange(ncols)

    def cond(st):
        it, code = st[3], st[5]
        return (code < 0) & (it < maxiters)

    def body(st):
        basis, Binv, xB, it, degen = st[0], st[1], st[2], st[3], st[4]
        in_basis = jnp.zeros((ncols,), bool).at[basis].set(True)
        cB = cost[basis]
        y = mvt(Binv, cB)                    # Binv' cB
        d = cost - mvt(W, y)                 # reduced costs
        elig = (~in_basis) & enter_ok & (d < -_TOL)
        any_elig = jnp.any(elig)

        # Dantzig (most negative d) vs Bland (smallest index) pricing
        j_dantzig = jnp.argmin(jnp.where(elig, d, jnp.inf))
        j_bland = jnp.argmin(jnp.where(elig, idx, ncols))
        use_bland = degen >= _BLAND_AFTER
        j = jnp.where(use_bland, j_bland, j_dantzig)

        w = mv(Binv, W[:, j])
        blocked = w > _TOL
        ratios = jnp.where(blocked, xB / jnp.maximum(w, _TOL), jnp.inf)
        t = jnp.min(ratios)
        unbounded = ~jnp.any(blocked)
        # leaving row: min ratio; ties by smallest basis index (Bland)
        near = ratios <= t * (1.0 + 1e-12) + 1e-30
        i = jnp.argmin(jnp.where(near & blocked, basis, ncols))

        # eta update: Binv <- E Binv, xB <- E xB with pivot (i, j)
        wi = w[i]
        eta = -w / wi
        eta = eta.at[i].set(1.0 / wi)
        Binv2 = Binv + jnp.outer(eta, Binv[i])
        Binv2 = Binv2.at[i].set(Binv[i] / wi)
        xB2 = xB - t * w
        xB2 = xB2.at[i].set(t)
        basis2 = basis.at[i].set(j.astype(basis.dtype))
        degen2 = jnp.where(t <= _TOL, degen + 1, 0).astype(jnp.int32)

        code = jnp.where(~any_elig, OPTIMAL,
                         jnp.where(unbounded, DUAL_INFEASIBLE,
                                   -1)).astype(jnp.int32)
        # when exiting, keep the pre-pivot state
        take = code < 0
        basis3 = jnp.where(take, basis2, basis)
        Binv3 = jnp.where(take, Binv2, Binv)
        xB3 = jnp.where(take, xB2, xB)
        return (basis3, Binv3, xB3, it + 1,
                jnp.where(take, degen2, degen), code)

    def body_wrap(st):
        basis, Binv, xB, it, degen, code = body(
            (st[0], st[1], st[2], st[3], st[4]))
        return (basis, Binv, xB, it, degen, code)

    st = (basis, Binv, xB, jnp.asarray(0, jnp.int32),
          jnp.asarray(0, jnp.int32), jnp.asarray(-1, jnp.int32))
    basis, Binv, xB, it, _, code = lax.while_loop(cond, body_wrap, st)
    code = jnp.where(code < 0, UNKNOWN, code)
    return basis, Binv, xB, code


def simplex_core(c, G, h, A, b, maxiters):
    """Jittable core: returns (code, x, z, y) as arrays.  Shapes are
    static; vmap over a leading batch axis for batched vertex solves."""
    n = c.shape[0]
    mG = G.shape[0]
    p = A.shape[0]
    m = mG + p
    dt = c.dtype

    r = jnp.concatenate([h, b])
    sgn = jnp.where(r < 0, -1.0, 1.0).astype(dt)
    # rows: [G I; A 0], sign-scaled; columns: x+ | x- | slack | artif
    S = jnp.concatenate(
        [jnp.eye(mG, dtype=dt), jnp.zeros((p, mG), dt)], axis=0)
    GA = jnp.concatenate([G, A], axis=0)
    W = jnp.concatenate([GA, -GA, S, jnp.eye(m, dtype=dt)], axis=1)
    W = W * sgn[:, None]
    r = r * sgn
    ncols = 2 * n + mG + m
    nreal = 2 * n + mG

    art = jnp.arange(nreal, ncols)
    basis0 = art.astype(jnp.int32)
    Binv0 = jnp.eye(m, dtype=dt)
    xB0 = r

    col_idx = jnp.arange(ncols)
    is_art = col_idx >= nreal

    # ---- phase 1: minimize sum of artificials ------------------------
    c1 = jnp.where(is_art, 1.0, 0.0).astype(dt)
    basis, Binv, xB, code1 = _phase(W, c1, ~is_art, basis0, Binv0, xB0,
                                    maxiters)
    infeas = jnp.sum(jnp.where(is_art[basis], xB, 0.0))
    feas_ok = infeas <= 1e-7 * (1.0 + jnp.linalg.norm(r))

    # ---- drive basic artificials out (degenerate pivots) -------------
    # An artificial left basic at 0 whose Binv-row is NOT orthogonal to
    # the real columns could re-grow during phase 2 (ratio tests only
    # block on w_i > 0); pivot each such row onto its largest real
    # column.  Rows that are zero across the real columns are redundant
    # constraints: their artificial stays basic at 0 forever (every
    # entering direction has w_i = 0) and, with zero cost, never
    # pollutes the duals.
    Wreal = W[:, :nreal]

    def drive_out(i, st):
        basis, Binv, xB = st
        row = mvt(Wreal, Binv[i])                        # e_i' Binv W
        in_b = jnp.zeros((ncols,), bool).at[basis].set(True)
        row = jnp.where(in_b[:nreal], 0.0, row)          # skip basics
        j = jnp.argmax(jnp.abs(row))
        ok = is_art[basis[i]] & (jnp.abs(row[j]) > 1e-8)

        def pivot(args):
            basis, Binv, xB = args
            w = mv(Binv, W[:, j])
            wi = w[i]
            eta = -w / wi
            Binv2 = Binv + jnp.outer(eta, Binv[i])
            Binv2 = Binv2.at[i].set(Binv[i] / wi)
            xB2 = xB - xB[i] / wi * w
            xB2 = xB2.at[i].set(xB[i] / wi)
            return basis.at[i].set(j.astype(basis.dtype)), Binv2, xB2

        return lax.cond(ok, pivot, lambda a: a, (basis, Binv, xB))

    basis, Binv, xB = lax.fori_loop(0, m, drive_out, (basis, Binv, xB))

    # ---- phase 2: the real costs (artificials barred) ----------------
    c2 = jnp.concatenate([jnp.asarray(c), -jnp.asarray(c),
                          jnp.zeros((mG + m,), dt)])
    c2 = jnp.where(is_art, 0.0, c2)
    basis, Binv, xB, code2 = _phase(W, c2, ~is_art, basis, Binv, xB,
                                    maxiters)

    # ---- extraction --------------------------------------------------
    xfull = jnp.zeros((ncols,), dt).at[basis].set(xB)
    x = xfull[:n] - xfull[n:2 * n]
    y_s = mvt(Binv, c2[basis])           # duals in sign-scaled space
    z = -sgn[:mG] * y_s[:mG]
    y = -sgn[mG:] * y_s[mG:]
    z = jnp.maximum(z, 0.0)              # clip pivot-tolerance dust

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


def lp(c, G, h, A=None, b=None, options=None):
    """glpk.lp-compatible entry: (status, x, z, y) — or (status, x, z)
    when A is omitted — via the native simplex.  Recognized options
    (GLPK parameter names, as in the reference's options plumbing):
    'it_lim' (pivot limit), 'msg_lev' (ignored), 'tm_lim' (ignored —
    the jitted solve is not interruptible)."""
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
    opts = dict(options or {})
    maxiters = int(opts.get("it_lim", 0) or
                   50 * (G.shape[0] + A.shape[0] + n) + 1000)

    run = make_simplex(n, G.shape[0], A.shape[0], maxiters)
    code, x, z, y = run(jnp.asarray(c), jnp.asarray(G), jnp.asarray(h),
                        jnp.asarray(A), jnp.asarray(b))
    code = int(code)
    status = _STATUS[code]
    if status != "optimal":
        out = (status, None, None)
        return out + (None,) if has_A else out
    if has_A:
        return status, np.asarray(x), np.asarray(z), np.asarray(y)
    return status, np.asarray(x), np.asarray(z)
