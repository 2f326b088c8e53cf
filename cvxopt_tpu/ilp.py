"""Mixed-integer linear programming — cvxopt.glpk.ilp equivalent.

The reference bridges to GLPK's branch-and-cut
(/root/reference/src/C/glpk.c:467 `ilp(c, G, h, A, b, I, B)`); this is
a from-scratch best-first branch-and-bound over the TPU-native conelp
relaxations.

    status, x = ilp(c, G, h, A, b, I, B)

I: indices of integer variables; B: indices of binary variables (0/1
bounds added automatically).  Status strings follow the reference:
'optimal', 'primal infeasible', 'dual infeasible' (relaxation
unbounded), 'unknown' (node limit).

A planned TPU-native upgrade is batching open nodes through the
vmapped solver (solve many relaxations per device call); this v1
explores nodes sequentially.
"""

from __future__ import annotations

import heapq
from typing import Optional, Sequence

import numpy as np

from cvxopt_tpu.conelp import conelp


def ilp(c, G, h, A=None, b=None, I: Optional[Sequence[int]] = None,
        B: Optional[Sequence[int]] = None, options=None,
        max_nodes: int = 1000, int_tol: float = 1e-6):
    c = np.asarray(c, dtype=float).reshape(-1)
    n = c.shape[0]
    G = np.asarray(G, dtype=float).reshape(-1, n)
    h = np.asarray(h, dtype=float).reshape(-1)
    I = sorted(set(int(i) for i in (I or [])) |
               set(int(i) for i in (B or [])))
    B = sorted(set(int(i) for i in (B or [])))
    if B:
        rows = np.zeros((2 * len(B), n))
        hb = np.zeros(2 * len(B))
        for k, j in enumerate(B):
            rows[2 * k, j] = 1.0        # x_j <= 1
            hb[2 * k] = 1.0
            rows[2 * k + 1, j] = -1.0   # -x_j <= 0
        G = np.concatenate([G, rows])
        h = np.concatenate([h, hb])

    opts = dict(options or {})
    opts.setdefault("show_progress", False)

    def solve_relax(extraG, extrah):
        Gk = np.concatenate([G] + extraG) if extraG else G
        hk = np.concatenate([h] + extrah) if extrah else h
        return conelp(c, Gk, hk, A=A, b=b, options=opts)

    root = solve_relax([], [])
    if root["status"] == "primal infeasible":
        # reference status string (tests/test_glpk.py:46)
        return "LP relaxation is primal infeasible", None
    if root["status"] == "dual infeasible":
        return "LP relaxation is dual infeasible", None
    if root["status"] != "optimal":
        return "unknown", None
    if not I:
        return "optimal", np.asarray(root["x"])

    best_obj = np.inf
    best_x = None
    counter = 0
    heap = [(root["primal objective"], counter, [], [],
             np.asarray(root["x"]))]
    nodes = 0

    while heap and nodes < max_nodes:
        bound, _, eG, eh, x = heapq.heappop(heap)
        if bound >= best_obj - 1e-9:
            continue
        nodes += 1
        frac = np.array([abs(x[j] - round(x[j])) for j in I])
        if frac.max() <= int_tol:
            obj = float(c @ x)
            if obj < best_obj:
                best_obj = obj
                best_x = x.copy()
                for j in I:
                    best_x[j] = round(best_x[j])
            continue
        j = I[int(np.argmax(frac))]
        lo = np.floor(x[j])
        for sense in ("down", "up"):
            row = np.zeros((1, n))
            if sense == "down":
                row[0, j] = 1.0
                rhs = np.array([lo])
            else:
                row[0, j] = -1.0
                rhs = np.array([-(lo + 1.0)])
            sol = solve_relax(eG + [row], eh + [rhs])
            if sol["status"] != "optimal":
                continue
            obj = sol["primal objective"]
            if obj < best_obj - 1e-9:
                counter += 1
                heapq.heappush(heap, (obj, counter, eG + [row],
                                      eh + [rhs], np.asarray(sol["x"])))

    if best_x is not None:
        return "optimal", best_x
    if nodes >= max_nodes:
        return "unknown", None
    return "primal infeasible", None
