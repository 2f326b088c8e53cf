"""Solver front-ends: lp, qp, socp, sdp.

TPU-native equivalents of the reference front-ends
(/root/reference/src/python/coneprog.py:2550 lp, 4156 qp, 3013 socp,
3566 sdp): stack cone blocks, dispatch to conelp/coneqp, and split the
solution back into per-block pieces with the reference's result keys
('sl'/'sq'/'zl'/'zq' for socp, 'sl'/'ss'/'zl'/'zs' for sdp).

`solver='glpk'` dispatches to the native simplex (cvxopt_tpu.simplex —
exact vertex solutions, reference dispatch semantics
coneprog.py:2807-2875 reproduced: residuals recomputed from the
returned vertex).  `solver='mosek'` dispatches to the MOSEK bridge
(cvxopt_tpu.msk, requires the commercial `mosek` package installed).
'dsdp' has no external counterpart and raises ValueError (the native
conelp 's' path provides the capability).  The default (None) path —
the reference's own IPM — is fully supported.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.conelp import conelp
from cvxopt_tpu.coneqp import coneqp

_EXTERNAL = ("dsdp",)


def _check_solver(solver):
    if solver in _EXTERNAL:
        raise ValueError(
            f"external solver '{solver}' is not available in cvxopt_tpu; "
            "use the default (None) TPU-native solver")
    if solver is not None:
        raise ValueError(f"invalid solver '{solver}'")


def _lp_glpk(c, G, h, A, b, options):
    """solver='glpk' branch of lp (coneprog.py:2807-2875): run the
    native simplex, then recompute every result-dict field from the
    vertex solution exactly as the reference does."""
    from cvxopt_tpu import glpk as glpk_mod

    # reference semantics (coneprog.py:2807): the options['glpk'] dict
    # (per-call kwarg, else the shared solvers.options) applies
    # INSTEAD of the module options; module glpk.options is only the
    # final fallback
    from cvxopt_tpu import solvers as _solvers

    if options is not None and "glpk" in options:
        opts = dict(options["glpk"])
    elif "glpk" in _solvers.options:
        opts = dict(_solvers.options["glpk"])
    else:
        opts = dict(glpk_mod.options)
    c = np.asarray(c, dtype=float).reshape(-1)
    n = c.shape[0]
    G = np.asarray(G, dtype=float).reshape(-1, n)
    h = np.asarray(h, dtype=float).reshape(-1)
    m = G.shape[0]
    has_A = A is not None
    if has_A:
        A = np.asarray(A, dtype=float).reshape(-1, n)
        b = np.asarray(b, dtype=float).reshape(-1)
    res = glpk_mod.lp(c, G, h, A if has_A else None,
                      b if has_A else None, options=opts)
    status, x = res[0], res[1]
    z = res[2]
    y = res[3] if has_A else (np.zeros((0,)) if status == "optimal"
                              else None)
    if not has_A:
        A = np.zeros((0, n))
        b = np.zeros((0,))
    return _vertex_result(c, G, h, A, b, status, x, z, y)


def _vertex_result(c, G, h, A, b, status, x, z, y):
    """Reference-format LP result dict recomputed from an external
    solver's (x, z, y) (coneprog.py:2807-2875 / :2877-3007 pattern:
    all residual/objective fields are recomputed locally so the
    result is solver-independent)."""
    m = G.shape[0]
    none = dict.fromkeys(
        ("primal objective", "dual objective", "gap", "relative gap",
         "primal infeasibility", "dual infeasibility", "primal slack",
         "dual slack"))
    out = {"status": status, "x": None, "s": None, "y": None,
           "z": None,
           "residual as primal infeasibility certificate": None,
           "residual as dual infeasibility certificate": None}
    out.update(none)
    if status != "optimal":
        return out

    s = h - G @ x
    gap = float(s @ z)
    pcost = float(c @ x)
    dcost = float(-h @ z - b @ y)
    relgap = (gap / -pcost if pcost < 0.0
              else gap / dcost if dcost > 0.0 else None)
    resx0 = max(1.0, float(np.linalg.norm(c)))
    resy0 = max(1.0, float(np.linalg.norm(b)))
    resz0 = max(1.0, float(np.linalg.norm(h)))
    rx = c + G.T @ z + A.T @ y
    ry = b - A @ x
    rz = G @ x + s - h
    out.update({
        "x": x, "s": s, "y": y, "z": z,
        "primal objective": pcost, "dual objective": dcost,
        "gap": gap, "relative gap": relgap,
        "primal infeasibility": max(
            float(np.linalg.norm(ry)) / resy0,
            float(np.linalg.norm(rz)) / resz0),
        "dual infeasibility": float(np.linalg.norm(rx)) / resx0,
        "primal slack": float(np.min(s)) if m else 0.0,
        "dual slack": float(np.min(z)) if m else 0.0,
    })
    return out


def _msk_status(solsta):
    """Map mosek solsta -> reference status string
    (coneprog.py:2877-3007)."""
    import mosek
    if solsta is mosek.solsta.optimal:
        return "optimal"
    if solsta is mosek.solsta.prim_infeas_cer:
        return "primal infeasible"
    if solsta is mosek.solsta.dual_infeas_cer:
        return "dual infeasible"
    return "unknown"


def _msk_options(options):
    """Resolve MOSEK options: per-call kwarg -> solvers.options['mosek']
    -> msk.options module default (same chain for every front-end)."""
    from cvxopt_tpu import msk as msk_mod
    from cvxopt_tpu import solvers as _solvers

    if options is not None and "mosek" in options:
        return dict(options["mosek"])
    if "mosek" in _solvers.options:
        return dict(_solvers.options["mosek"])
    return dict(msk_mod.options)


def _lp_mosek(c, G, h, A, b, options):
    """solver='mosek' branch of lp (coneprog.py:2877-3007): run the
    MOSEK bridge, map solsta, recompute all result fields locally."""
    from cvxopt_tpu import msk as msk_mod

    opts = _msk_options(options)
    c = np.asarray(c, dtype=float).reshape(-1)
    n = c.shape[0]
    G = np.asarray(G, dtype=float).reshape(-1, n)
    h = np.asarray(h, dtype=float).reshape(-1)
    has_A = A is not None
    if has_A:
        A = np.asarray(A, dtype=float).reshape(-1, n)
        b = np.asarray(b, dtype=float).reshape(-1)
    else:
        A = np.zeros((0, n))
        b = np.zeros((0,))
    solsta, x, z, y = msk_mod.lp(c, G, h,
                                 A if has_A else None,
                                 b if has_A else None, options=opts)
    status = _msk_status(solsta)
    if status != "optimal":
        x = z = y = None
    elif y is None:
        y = np.zeros((0,))
    return _vertex_result(c, G, h, A, b, status, x, z, y)


def lp(c, G, h, A=None, b=None, solver=None, options=None, **kwargs):
    """LP front-end (coneprog.py:2550): conelp with dims = {'l': m},
    the native simplex under solver='glpk', or the MOSEK bridge under
    solver='mosek' (requires the `mosek` package)."""
    if solver == "glpk":
        return _lp_glpk(c, G, h, A, b, options)
    if solver == "mosek":
        return _lp_mosek(c, G, h, A, b, options)
    _check_solver(solver)
    return conelp(c, G, h, dims=None, A=A, b=b, options=options)


def qp(P, q, G=None, h=None, A=None, b=None, solver=None, options=None,
       initvals=None, **kwargs):
    """QP front-end (coneprog.py:4156): coneqp with dims = {'l': m};
    solver='mosek' uses the MOSEK bridge."""
    if solver == "mosek":
        from cvxopt_tpu import msk as msk_mod
        q1 = np.asarray(q, dtype=float).reshape(-1)
        n = q1.shape[0]
        Gm = (np.zeros((0, n)) if G is None
              else np.asarray(G, dtype=float).reshape(-1, n))
        hm = (np.zeros((0,)) if h is None
              else np.asarray(h, dtype=float).reshape(-1))
        has_A = A is not None
        Am = (np.asarray(A, dtype=float).reshape(-1, n) if has_A
              else np.zeros((0, n)))
        bm = (np.asarray(b, dtype=float).reshape(-1) if has_A
              else np.zeros((0,)))
        solsta, x, z, y = msk_mod.qp(
            np.asarray(P, dtype=float), q1, Gm, hm,
            Am if has_A else None, bm if has_A else None,
            options=_msk_options(options))
        status = _msk_status(solsta)
        out = _vertex_result(q1, Gm, hm, Am, bm, status,
                             x if status == "optimal" else None,
                             z if status == "optimal" else None,
                             (y if y is not None else np.zeros((0,)))
                             if status == "optimal" else None)
        if status == "optimal":
            # objective fields use the quadratic objective; recompute
            # 'relative gap' from the corrected pcost/dcost by the
            # reference's rule (coneprog.py:2255-2260) so it is
            # consistent with the reported objectives.
            Pm = np.asarray(P, dtype=float).reshape(n, n)
            pcost = 0.5 * float(x @ Pm @ x) + float(q1 @ x)
            gap = out["gap"] or 0.0
            dcost = pcost - gap
            out["primal objective"] = pcost
            out["dual objective"] = dcost
            if pcost < 0.0:
                out["relative gap"] = gap / -pcost
            elif dcost > 0.0:
                out["relative gap"] = gap / dcost
            else:
                out["relative gap"] = None
        return out
    _check_solver(solver)
    return coneqp(P, q, G, h, dims=None, A=A, b=b, initvals=initvals,
                  options=options)


def _stack_cols(blocks, n):
    mats = [np.asarray(B, dtype=float).reshape(-1, n) for B in blocks]
    if not mats:
        return np.zeros((0, n))
    return np.concatenate(mats, axis=0)


def socp(c, Gl=None, hl=None, Gq=None, hq=None, A=None, b=None,
         solver=None, options=None, **kwargs):
    """SOCP front-end (coneprog.py:3013): stacks Gl and the Gq[k] blocks
    into one conelp call; splits s, z back into 'sl'/'sq'/'zl'/'zq'.
    solver='mosek' uses the MOSEK bridge (rejects equality
    constraints, matching the reference, coneprog.py:3340)."""
    if solver != "mosek":
        _check_solver(solver)
    c = np.asarray(c, dtype=float).reshape(-1)
    n = c.shape[0]
    Gq = Gq or []
    hq = hq or []
    if Gl is None:
        Gl = np.zeros((0, n))
        hl = np.zeros((0,))
    Gl = np.asarray(Gl, dtype=float).reshape(-1, n)
    hl = np.asarray(hl, dtype=float).reshape(-1)
    ml = Gl.shape[0]
    mq = [np.asarray(hk).size for hk in hq]
    G = np.concatenate([Gl, _stack_cols(Gq, n)], axis=0)
    h = np.concatenate([hl] + [np.asarray(hk, dtype=float).reshape(-1)
                               for hk in hq])
    dims = ConeDims(l=ml, q=tuple(mq))
    if solver == "mosek":
        if A is not None:
            raise ValueError("'mosek' does not accept equality "
                             "constraints in socp")
        from cvxopt_tpu import msk as msk_mod
        solsta, x, zl_, zq_ = msk_mod.socp(
            c, Gl, hl, Gq, hq,
            options=_msk_options(options))
        status = _msk_status(solsta)
        z = (np.concatenate([np.asarray(zl_)] +
                            [np.asarray(zk) for zk in zq_])
             if status == "optimal" else None)
        sol = _vertex_result(
            c, G, h, np.zeros((0, n)), np.zeros((0,)), status,
            np.asarray(x) if status == "optimal" else None, z,
            np.zeros((0,)) if status == "optimal" else None)
    else:
        sol = conelp(c, G, h, dims=dims, A=A, b=b, options=options)

    def split(v):
        if v is None:
            return None, None
        v = np.asarray(v)
        vl = v[:ml]
        vq, ind = [], ml
        for m in mq:
            vq.append(v[ind:ind + m])
            ind += m
        return vl, vq

    sl, sq = split(sol.pop("s", None))
    zl, zq = split(sol.pop("z", None))
    sol["sl"], sol["sq"] = sl, sq
    sol["zl"], sol["zq"] = zl, zq
    return sol


def sdp(c, Gl=None, hl=None, Gs=None, hs=None, A=None, b=None,
        solver=None, options=None, **kwargs):
    """SDP front-end (coneprog.py:3566): Gs[k] are (m_k^2, n) blocks,
    hs[k] are (m_k, m_k) matrices; splits s, z back into
    'sl'/'ss'/'zl'/'zs' (ss/zs as (m_k, m_k) matrices)."""
    _check_solver(solver)
    c = np.asarray(c, dtype=float).reshape(-1)
    n = c.shape[0]
    Gs = Gs or []
    hs = hs or []
    if Gl is None:
        Gl = np.zeros((0, n))
        hl = np.zeros((0,))
    Gl = np.asarray(Gl, dtype=float).reshape(-1, n)
    hl = np.asarray(hl, dtype=float).reshape(-1)
    ml = Gl.shape[0]
    ms = [np.asarray(hk, dtype=float).reshape(-1) for hk in hs]
    msizes = [int(round(len(v) ** 0.5)) for v in ms]
    G = np.concatenate([Gl, _stack_cols(Gs, n)], axis=0)
    h = np.concatenate([hl] + ms)
    dims = ConeDims(l=ml, s=tuple(msizes))
    sol = conelp(c, G, h, dims=dims, A=A, b=b, options=options)

    def split(v):
        if v is None:
            return None, None
        v = np.asarray(v)
        vl = v[:ml]
        vs, ind = [], ml
        for m in msizes:
            vs.append(v[ind:ind + m * m].reshape(m, m))
            ind += m * m
        return vl, vs

    sl, ss = split(sol.pop("s", None))
    zl, zs = split(sol.pop("z", None))
    sol["sl"], sol["ss"] = sl, ss
    sol["zl"], sol["zs"] = zl, zs
    return sol
