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
from cvxopt_tpu.conelp import make_conelp, STATUS_OPTIMAL, \
    STATUS_PRIMAL_INFEASIBLE, STATUS_DUAL_INFEASIBLE


def ilp(c, G, h, A=None, b=None, I: Optional[Sequence[int]] = None,
        B: Optional[Sequence[int]] = None, options=None,
        max_nodes: int = 1000, int_tol: float = 1e-6,
        node_batch: int = 8, bound: float = 1e6):
    c = np.asarray(c, dtype=float).reshape(-1)
    n = c.shape[0]
    G = np.asarray(G, dtype=float).reshape(-1, n)
    h = np.asarray(h, dtype=float).reshape(-1)
    I = sorted(set(int(i) for i in (I or [])) |
               set(int(i) for i in (B or [])))
    B = sorted(set(int(i) for i in (B or [])))
    opts = dict(options or {})
    opts.setdefault("show_progress", False)
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
    core = make_conelp(
        dims,
        maxiters=int(opts.get("maxiters", 100)),
        abstol=float(opts.get("abstol", 1e-7)),
        reltol=float(opts.get("reltol", 1e-6)),
        feastol=float(opts.get("feastol", 1e-7)))
    cj = jnp.asarray(c)
    Gj = jnp.asarray(Gx)
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)
    vcore = jax.jit(jax.vmap(lambda h_: core(cj, Gj, h_, Aj, bj)))

    def solve_nodes(bounds):
        """bounds: list of (lo, hi); returns per-node (status, obj, x)."""
        hs = np.stack([np.concatenate([h, hi, -lo])
                       for lo, hi in bounds]) if ni else \
            np.stack([h for _ in bounds])
        out = vcore(jnp.asarray(hs))
        return (np.asarray(out["status"]), np.asarray(out["pcost"]),
                np.asarray(out["x"]))

    # root
    st, obj, xs = solve_nodes([(lo0, hi0)])
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
    heap = [(obj[0], 0, lo0, hi0, xs[0])]
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

    while heap and nodes < max_nodes:
        # pop up to node_batch most promising nodes
        batch = []
        meta = []        # (k, direction, fraction, parent_obj)
        while heap and len(batch) < node_batch:
            bound_val, _, lo, hi, x = heapq.heappop(heap)
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
            if hi_dn[k] >= lo[k]:
                batch.append((lo.copy(), hi_dn))
                meta.append((k, 0, fk, bound_val))
            if lo_up[k] <= hi[k]:
                batch.append((lo_up, hi))
                meta.append((k, 1, fk, bound_val))
        if not batch:
            continue
        nodes += len(batch)
        st, obj, xs = solve_nodes(batch)
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
                    heap, (obj[i], counter, lo, hi, xs[i]))

    if best_x is not None:
        return "optimal", best_x
    if nodes >= max_nodes and heap:
        return "unknown", None
    return "primal infeasible", None
