"""Mixed-integer linear programming — cvxopt.glpk.ilp equivalent.

The reference bridges to GLPK's branch-and-cut
(/root/reference/src/C/glpk.c:467 `ilp(c, G, h, A, b, I, B)`); this is
a from-scratch best-first branch-and-bound over the TPU-native conelp
relaxations.

    status, x = ilp(c, G, h, A, b, I, B)

I: indices of integer variables; B: indices of binary variables (0/1
bounds added automatically).  Status strings follow the reference:
'optimal', 'LP relaxation is primal infeasible' (tests/test_glpk.py:46),
'LP relaxation is dual infeasible', 'unknown' (node limit).

TPU-native design: every node's relaxation has the SAME shape — branch
bounds are expressed as per-integer-variable box rows ``lo <= x_j <=
hi`` appended to G, so node relaxations differ only in the h vector.
Up to ``node_batch`` open nodes are therefore solved per device call
through the jit-cached, vmapped conelp core (the B&B analogue of the
batched-scenario solving the framework is built around).  Branching
uses pseudo-costs (mean dual-bound degradation per unit fraction, the
product rule) once a variable has been observed in both directions,
falling back to most-fractional before that.
"""

from __future__ import annotations

import heapq
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.conelp import make_conelp, make_conelp_ws, \
    STATUS_OPTIMAL, STATUS_PRIMAL_INFEASIBLE, STATUS_DUAL_INFEASIBLE


def _parse_glpk_options(opts):
    """GLPK-parameter plumbing (reference: glpk.options /
    solvers.options['glpk'], tests/test_glpk.py:50-77).  Recognized
    names map onto this solver's controls:
        'it_lim' / 'mip_gap'-style node cap -> max_nodes
        'tm_lim' (milliseconds)             -> wall-clock limit
        'msg_lev' ('GLP_MSG_OFF'/.../'GLP_MSG_ON') -> progress printing
    Unknown names are accepted and ignored (GLPK behavior for
    inapplicable parameters)."""
    g = dict(opts.get("glpk", {}))
    for k in ("it_lim", "tm_lim", "msg_lev"):
        if k in opts:
            g.setdefault(k, opts[k])
    max_nodes = g.get("it_lim")
    tm_lim = g.get("tm_lim")
    msg = str(g.get("msg_lev", "GLP_MSG_OFF"))
    verbose = msg not in ("GLP_MSG_OFF", "0")
    return (int(max_nodes) if max_nodes else None,
            float(tm_lim) / 1e3 if tm_lim else None, verbose)


def ilp(c, G, h, A=None, b=None, I: Optional[Sequence[int]] = None,
        B: Optional[Sequence[int]] = None, options=None,
        max_nodes: int = 1000, int_tol: float = 1e-6,
        node_batch: int = 8, bound: float = 1e6,
        warm_start: bool = True):
    import time as _time
    c = np.asarray(c, dtype=float).reshape(-1)
    n = c.shape[0]
    G = np.asarray(G, dtype=float).reshape(-1, n)
    h = np.asarray(h, dtype=float).reshape(-1)
    I = sorted(set(int(i) for i in (I or [])) |
               set(int(i) for i in (B or [])))
    B = sorted(set(int(i) for i in (B or [])))
    opts = dict(options or {})
    opts.setdefault("show_progress", False)
    g_nodes, tm_lim, verbose = _parse_glpk_options(opts)
    if g_nodes:
        max_nodes = g_nodes
    t_start = _time.time()
    ni = len(I)

    if A is None:
        A = np.zeros((0, n))
        b = np.zeros(0)
    else:
        A = np.asarray(A, dtype=float).reshape(-1, n)
        b = np.asarray(b, dtype=float).reshape(-1)

    # fixed-shape relaxation: box rows for every integer variable
    rows = np.zeros((2 * ni, n))
    for k, j in enumerate(I):
        rows[k, j] = 1.0               # x_j <= hi_k
        rows[ni + k, j] = -1.0         # -x_j <= -lo_k
    Gx = np.concatenate([G, rows]) if ni else G
    lo0 = np.full(ni, -bound)
    hi0 = np.full(ni, bound)
    for k, j in enumerate(I):
        if j in B:
            lo0[k], hi0[k] = 0.0, 1.0

    dims = ConeDims(l=Gx.shape[0])
    kw = dict(maxiters=int(opts.get("maxiters", 100)),
              abstol=float(opts.get("abstol", 1e-7)),
              reltol=float(opts.get("reltol", 1e-6)),
              feastol=float(opts.get("feastol", 1e-7)))
    core = make_conelp(dims, **kw)
    # warm solves get a short budget: a failed warm node is re-solved
    # cold (below), so wasting the full maxiters on a hard warm start
    # (e.g. an infeasible child) would cost more than it saves
    kw_ws = dict(kw, maxiters=min(40, kw["maxiters"]))
    core_ws = make_conelp_ws(dims, **kw_ws) if warm_start else None

    # bound-propagation infeasibility pre-check (host, no solve): a
    # row supported ONLY on integer variables with min-activity > h is
    # infeasible under the node's box — the presolve analogue of
    # GLPK's branch-and-cut node preprocessing
    int_mask = np.zeros(n, bool)
    int_mask[I] = True
    _int_only = (np.abs(G[:, ~int_mask]).sum(axis=1) == 0) \
        if (~int_mask).any() else np.ones(G.shape[0], bool)
    _Gi = G[np.ix_(_int_only, I)] if ni else None
    _hi_rows = h[_int_only] if ni else None

    def node_infeasible(lo, hi):
        if _Gi is None or not _Gi.size:
            return False
        minact = np.where(_Gi > 0, _Gi * lo, _Gi * hi).sum(axis=1)
        return bool((minact > _hi_rows + 1e-9).any())
    cj = jnp.asarray(c)
    Gj = jnp.asarray(Gx)
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)
    vcore = jax.jit(jax.vmap(lambda h_: core(cj, Gj, h_, Aj, bj)))
    vcore_ws = jax.jit(jax.vmap(
        lambda h_, x0, y0, z0: core_ws(cj, Gj, h_, Aj, bj,
                                       x0, y0, z0))) \
        if warm_start else None
    total_ipm_iters = [0]

    def solve_nodes(bounds, starts=None):
        """bounds: list of (lo, hi); returns per-node (status, obj, x,
        y, z).  With `starts` (parent (x, y, z) per node), children
        are warm-started from their parent's iterates."""
        hs = np.stack([np.concatenate([h, hi, -lo])
                       for lo, hi in bounds]) if ni else \
            np.stack([h for _ in bounds])
        if starts is not None and vcore_ws is not None:
            x0 = jnp.asarray(np.stack([s[0] for s in starts]))
            y0 = jnp.asarray(np.stack([s[1] for s in starts]))
            z0 = jnp.asarray(np.stack([s[2] for s in starts]))
            out = vcore_ws(jnp.asarray(hs), x0, y0, z0)
        else:
            out = vcore(jnp.asarray(hs))
        total_ipm_iters[0] += int(np.asarray(
            out["iterations"]).sum())
        return (np.asarray(out["status"]), np.asarray(out["pcost"]),
                np.asarray(out["x"]), np.asarray(out["y"]),
                np.asarray(out["z"]))

    # root
    st, obj, xs, ys, zs = solve_nodes([(lo0, hi0)])
    if st[0] == STATUS_PRIMAL_INFEASIBLE:
        return "LP relaxation is primal infeasible", None
    if st[0] == STATUS_DUAL_INFEASIBLE:
        return "LP relaxation is dual infeasible", None
    if st[0] != STATUS_OPTIMAL:
        return "unknown", None
    if not I:
        return "optimal", xs[0]

    best_obj = np.inf
    best_x = None
    counter = 0
    heap = [(obj[0], 0, lo0, hi0, xs[0], ys[0], zs[0])]
    nodes = 0

    # pseudo-cost branching state: mean objective degradation per unit
    # of fraction removed, per integer variable and direction
    # (GLPK's branch-and-cut uses the same statistic; here it steers
    # which variable each node splits on)
    pc_dn = np.zeros(ni)
    pc_up = np.zeros(ni)
    pn_dn = np.zeros(ni, dtype=int)
    pn_up = np.zeros(ni, dtype=int)

    def pick_branch(frac):
        """Pseudo-cost product rule; most-fractional until a variable
        has been observed in both directions."""
        cand = np.flatnonzero(frac > int_tol)
        init = (pn_dn[cand] > 0) & (pn_up[cand] > 0)
        if init.any():
            f = frac[cand]
            dn = np.where(pn_dn[cand] > 0, pc_dn[cand] /
                          np.maximum(pn_dn[cand], 1), 1.0)
            up = np.where(pn_up[cand] > 0, pc_up[cand] /
                          np.maximum(pn_up[cand], 1), 1.0)
            score = np.maximum(dn * f, 1e-12) * \
                np.maximum(up * (1.0 - f), 1e-12)
            score = np.where(init, score, -1.0)
            return int(cand[np.argmax(score)])
        return int(cand[np.argmax(frac[cand])])

    timed_out = False
    dropped_unknown = False
    while heap and nodes < max_nodes:
        if tm_lim is not None and _time.time() - t_start > tm_lim:
            timed_out = True
            break
        # pop up to node_batch most promising nodes
        batch = []
        starts = []
        meta = []        # (k, direction, fraction, parent_obj)
        while heap and len(batch) < node_batch:
            bound_val, _, lo, hi, x, y, z = heapq.heappop(heap)
            if bound_val >= best_obj - 1e-9:
                continue
            frac = np.array([abs(x[j] - round(x[j])) for j in I])
            if frac.max() <= int_tol:
                o = float(c @ x)
                if o < best_obj:
                    best_obj = o
                    best_x = x.copy()
                    for j in I:
                        best_x[j] = round(best_x[j])
                continue
            k = pick_branch(frac)
            j = I[k]
            f = np.floor(x[j])
            fk = x[j] - f
            lo_up = lo.copy()
            lo_up[k] = f + 1.0
            hi_dn = hi.copy()
            hi_dn[k] = f
            if hi_dn[k] >= lo[k] and not node_infeasible(lo, hi_dn):
                batch.append((lo.copy(), hi_dn))
                starts.append((x, y, z))
                meta.append((k, 0, fk, bound_val))
            if lo_up[k] <= hi[k] and not node_infeasible(lo_up, hi):
                batch.append((lo_up, hi))
                starts.append((x, y, z))
                meta.append((k, 1, fk, bound_val))
        if not batch:
            continue
        nodes += len(batch)
        st, obj, xs, ys, zs = solve_nodes(
            batch, starts=starts if warm_start else None)
        # a node that did not converge must NOT be dropped (that would
        # unsoundly prune its subtree): re-solve cold, and if it still
        # fails, the final status degrades to 'feasible'
        done = (STATUS_OPTIMAL, STATUS_PRIMAL_INFEASIBLE,
                STATUS_DUAL_INFEASIBLE)
        bad = [i for i in range(len(batch)) if st[i] not in done]
        if bad and warm_start:
            st2, obj2, xs2, ys2, zs2 = solve_nodes(
                [batch[i] for i in bad])
            st, obj = np.array(st), np.array(obj)
            xs, ys, zs = np.array(xs), np.array(ys), np.array(zs)
            for t, i in enumerate(bad):
                st[i], obj[i], xs[i] = st2[t], obj2[t], xs2[t]
                ys[i], zs[i] = ys2[t], zs2[t]
        if any(st[i] not in done for i in range(len(batch))):
            dropped_unknown = True
        if verbose:
            print(f"ilp: nodes={nodes} best={best_obj:.6g} "
                  f"open={len(heap)}")
        for i, (lo, hi) in enumerate(batch):
            if st[i] != STATUS_OPTIMAL:
                continue
            k, dirn, fk, pobj = meta[i]
            degr = max(float(obj[i]) - float(pobj), 0.0)
            if dirn == 0 and fk > int_tol:
                pc_dn[k] += degr / fk
                pn_dn[k] += 1
            elif dirn == 1 and fk < 1.0 - int_tol:
                pc_up[k] += degr / (1.0 - fk)
                pn_up[k] += 1
            if obj[i] < best_obj - 1e-9:
                counter += 1
                heapq.heappush(
                    heap, (obj[i], counter, lo, hi, xs[i], ys[i],
                           zs[i]))

    incomplete = timed_out or dropped_unknown \
        or (nodes >= max_nodes and bool(heap))
    stats = opts.get("_stats")
    if isinstance(stats, dict):
        stats.update(nodes=nodes, ipm_iterations=total_ipm_iters[0],
                     best_obj=(None if best_x is None else best_obj))
    if best_x is not None:
        # 'feasible' = incumbent found but optimality not proven
        # within the node/time budget (reference glpk.c:457-464)
        return ("feasible" if incomplete else "optimal"), best_x
    if incomplete:
        return "unknown", None
    return "primal infeasible", None
