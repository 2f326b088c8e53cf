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


def _phase(W, r, cost, enter_ok, basis, maxiters, cap_art=None):
    """One simplex phase: minimize cost'x over {W x = r, x >= 0}
    from the given basis.  ``cap_art`` marks zero-capped columns
    (phase-2 artificials).  Returns (basis, code)."""
    m, ncols = W.shape
    idx = jnp.arange(ncols)
    dtol = 1e-9 * (1.0 + jnp.max(jnp.abs(cost)))
    wtol = 1e-7

    def cond(st):
        basis, it, degen, code = st
        return (code < 0) & (it < maxiters)

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
        i_bland = jnp.argmin(jnp.where(cand, basis, ncols))
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

    st = (basis, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
          jnp.asarray(-1, jnp.int32))
    basis, it, _, code = lax.while_loop(cond, body, st)
    code = jnp.where(code < 0, UNKNOWN, code)
    return basis, code


def simplex_core(c, G, h, A, b, maxiters):
    """Jittable core: returns (code, x, z, y) as arrays.  Shapes are
    static; vmap over a leading batch axis for batched vertex solves."""
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

    # ---- phase 1: minimize sum of artificials ------------------------
    c1 = jnp.where(is_art, 1.0, 0.0).astype(dt)
    basis, code1 = _phase(W, r, c1, ~is_art, basis0, maxiters)
    _, xB1 = _binv_xb(W, basis, r)
    infeas = jnp.sum(jnp.where(is_art[basis], jnp.maximum(xB1, 0.0),
                               0.0))
    feas_ok = infeas <= 1e-7 * (1.0 + jnp.linalg.norm(r))

    # ---- phase 2: real costs; basic artificials zero-capped ----------
    c2 = jnp.concatenate([cobj, -cobj, jnp.zeros((mG + m,), dt)])
    c2 = jnp.where(is_art, 0.0, c2)
    basis, code2 = _phase(W, r, c2, ~is_art, basis, maxiters,
                          cap_art=is_art)

    # ---- extraction (undo sign + equilibration scalings) -------------
    Binv, xB = _binv_xb(W, basis, r)
    xfull = jnp.zeros((ncols,), dt).at[basis].set(xB)
    x = (xfull[:n] - xfull[n:2 * n]) * cs
    y_s = mvt(Binv, c2[basis])           # duals in sign-scaled space
    z = -sgn[:mG] * y_s[:mG] * rs[:mG]
    y = -sgn[mG:] * y_s[mG:] * rs[mG:]
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
