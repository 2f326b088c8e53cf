"""Native simplex (cvxopt_tpu.simplex / glpk.lp surface) vs the IPM
and vs hand-solvable LPs.  Reference contract:
/root/reference/src/C/glpk.c:85 (status, x, z, y) and the
solvers.lp(solver='glpk') dict assembly coneprog.py:2807-2875."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvxopt_tpu import glpk, solvers
from cvxopt_tpu.simplex import make_simplex, simplex_core


def test_doc_lp_vertex():
    # doc LP: min -4x1 -5x2 s.t. 2x1+x2<=3, x1+2x2<=3, x>=0 -> x=[1,1]
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    status, x, z = glpk.lp(c, G, h)
    assert status == "optimal"
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-9)
    # exact vertex: KKT holds to machine precision
    np.testing.assert_allclose(c + G.T @ z, 0.0, atol=1e-9)
    assert np.all(z >= -1e-12)
    # complementary slackness
    s = h - G @ x
    np.testing.assert_allclose(s * z, 0.0, atol=1e-9)


def test_equalities_and_duals():
    rng = np.random.default_rng(3)
    n, m, p = 8, 14, 2
    A = rng.standard_normal((p, n))
    x0 = rng.standard_normal(n)
    b = A @ x0
    G = np.concatenate([rng.standard_normal((m - n, n)), -np.eye(n)])
    h = np.concatenate([G[:m - n] @ x0 + rng.uniform(0.5, 1.0, m - n),
                        -x0 + rng.uniform(0.5, 1.0, n)])
    c = rng.standard_normal(n)
    status, x, z, y = glpk.lp(c, G, h, A, b)
    if status == "dual infeasible":
        return  # random instance may be unbounded; covered elsewhere
    assert status == "optimal"
    np.testing.assert_allclose(c + G.T @ z + A.T @ y, 0.0, atol=1e-8)
    np.testing.assert_allclose(A @ x, b, atol=1e-8)
    assert np.all(G @ x - h <= 1e-8)
    # matches the IPM optimum
    ipm = solvers.lp(c, G, h, A=A, b=b)
    assert ipm["status"] == "optimal"
    assert abs(float(c @ x) - ipm["primal objective"]) < 1e-5


def test_primal_infeasible():
    c = np.array([1.0])
    G = np.array([[1.0], [-1.0]])
    h = np.array([-1.0, -1.0])      # x <= -1 and x >= 1
    status, x, z = glpk.lp(c, G, h)
    assert status == "primal infeasible"
    assert x is None and z is None


def test_unbounded_is_dual_infeasible():
    c = np.array([-1.0])
    G = np.array([[-1.0]])          # x >= 0, min -x
    h = np.array([0.0])
    status, x, z = glpk.lp(c, G, h)
    assert status == "dual infeasible"


def test_degenerate_lp():
    # multiple constraints active at the optimum (degenerate vertex)
    c = np.array([-1.0, -1.0])
    G = np.array([[1., 0.], [0., 1.], [1., 1.], [-1., 0.], [0., -1.]])
    h = np.array([1., 1., 2., 0., 0.])
    status, x, z = glpk.lp(c, G, h)
    assert status == "optimal"
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-9)


def test_solvers_lp_glpk_dispatch():
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    sol = solvers.lp(c, G, h, solver="glpk")
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]).ravel(), [1., 1.],
                               atol=1e-9)
    assert sol["gap"] < 1e-9
    assert sol["primal infeasibility"] < 1e-9
    assert sol["dual infeasibility"] < 1e-9
    assert sol["primal slack"] >= -1e-12
    # infeasible through the dispatch: None fields, reference semantics
    sol = solvers.lp(np.array([1.0]), np.array([[1.0], [-1.0]]),
                     np.array([-1.0, -1.0]), solver="glpk")
    assert sol["status"] == "primal infeasible"
    assert sol["x"] is None and sol["gap"] is None


def test_it_lim_option():
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    status, *_ = glpk.lp(c, G, h, options={"it_lim": 1})
    assert status == "unknown"


def test_batched_vmap_simplex():
    """The TPU-native mode: one jitted program, a batch axis of LPs."""
    rng = np.random.default_rng(7)
    nb, n, m = 16, 6, 12
    c = rng.standard_normal((nb, n))
    x0 = rng.standard_normal((nb, n))
    G = np.concatenate(
        [rng.standard_normal((nb, m - n, n)),
         np.broadcast_to(-np.eye(n), (nb, n, n))], axis=1)
    slack = rng.uniform(0.5, 1.5, (nb, m))
    h = np.einsum("bij,bj->bi", G, x0) + slack
    A = np.zeros((nb, 0, n))
    b = np.zeros((nb, 0))
    run = make_simplex(n, m, 0, 2000, batched=True)
    code, x, z, y = run(jnp.asarray(c), jnp.asarray(G),
                        jnp.asarray(h), jnp.asarray(A), jnp.asarray(b))
    code = np.asarray(code)
    x = np.asarray(x)
    for k in range(nb):
        if code[k] == 2:           # unbounded instance: legitimate
            continue
        assert code[k] == 0, code
        assert np.all(G[k] @ x[k] - h[k] <= 1e-7)
        np.testing.assert_allclose(
            c[k] + G[k].T @ np.asarray(z)[k], 0.0, atol=1e-7)
    # cross-check a solved instance against the IPM
    ks = np.nonzero(code == 0)[0]
    assert ks.size >= nb // 2
    k = int(ks[0])
    ipm = solvers.lp(c[k], G[k], h[k])
    assert abs(float(c[k] @ x[k]) - ipm["primal objective"]) < 1e-5


def test_redundant_rows():
    # duplicated equality rows leave an artificial basic in a redundant
    # row; the solution must still be clean
    c = np.array([1.0, 2.0])
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    b = np.array([1.0, 1.0])
    G = -np.eye(2)
    h = np.zeros(2)
    status, x, z, y = glpk.lp(c, G, h, A, b)
    assert status == "optimal"
    np.testing.assert_allclose(x, [1.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(A @ x, b, atol=1e-12)


def test_boeing2_via_simplex():
    """boeing2.mps (166 rows, 143 cols) through the native simplex:
    same NETLIB objective as the IPM path, exact vertex."""
    import os
    from cvxopt_tpu.mpsio import mps_load
    d = mps_load(os.path.join(os.path.dirname(__file__), "data",
                              "boeing2.mps"))
    c, G, h, A, b = d.to_lp()
    sol = solvers.lp(c, G, h, A=A, b=b, solver="glpk",
                     options={"glpk": {"it_lim": 20000}})
    assert sol["status"] == "optimal"
    assert abs(sol["primal objective"] - (-315.0187280)) < 1e-3
    assert sol["primal infeasibility"] < 1e-7
    assert sol["dual infeasibility"] < 1e-7


def test_options_plumbing_reference_semantics():
    """Mirror of the reference options test (test_glpk.py:50-77):
    module glpk.options fallback, per-call override, msg_lev levels,
    solvers.options['glpk'] and options={'glpk': ...} dispatch."""
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0])

    saved = glpk.options
    try:
        glpk.options = {"msg_lev": "GLP_MSG_OFF"}
        assert glpk.lp(c, G, h)[0] == "optimal"
        assert glpk.lp(c, G, h, A, b)[0] == "optimal"
        assert glpk.lp(c, G, h,
                       options={"msg_lev": "GLP_MSG_ON"})[0] == "optimal"
        assert glpk.lp(c, G, h, A, b,
                       options={"msg_lev": "GLP_MSG_ERR"})[0] == "optimal"

        sol5 = solvers.lp(c, G, h, solver="glpk",
                          options={"glpk": {"msg_lev": "GLP_MSG_ON"}})
        assert sol5["status"] == "optimal"

        # module it_lim applies when no options kwarg is passed
        glpk.options = {"it_lim": 1}
        assert glpk.lp(c, G, h)[0] == "unknown"
        glpk.options = {}

        solvers.options["glpk"] = {"msg_lev": "GLP_MSG_ON"}
        try:
            sol6 = solvers.lp(c, G, h, solver="glpk")
            assert sol6["status"] == "optimal"
        finally:
            solvers.options.pop("glpk", None)
    finally:
        glpk.options = saved


def test_bad_option_values_warn_and_default():
    """Unrecognized msg_lev / non-int it_lim warn and fall back,
    matching the reference's PyErr_WarnEx path (glpk.c:238-328)."""
    import warnings
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        status, *_ = glpk.lp(c, G, h, options={
            "msg_lev": "BOGUS", "it_lim": "many", "tm_lim": 1.5})
    assert status == "optimal"
    msgs = " ".join(str(w.message) for w in rec)
    assert "msg_lev" in msgs and "it_lim" in msgs and "tm_lim" in msgs


def test_tm_lim_enforced(monkeypatch):
    """tm_lim (wall-clock ms) terminates the solve with 'unknown'
    when exceeded, and leaves ample-budget solves untouched (GLPK
    smcp.tm_lim semantics, glpk.c:323-327)."""
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    # generous budget: solves fine through the chunked driver
    status, x, z = glpk.lp(c, G, h, options={"tm_lim": 60_000})
    assert status == "optimal"
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-8)
    # deterministic deadline breach: a fake clock advancing 10 ms per
    # call makes the 5 ms budget expire at the first between-chunk
    # check (GLPK likewise only checks between simplex iterations)
    import time as _time
    real = _time.time
    t = {"v": real()}

    def fake():
        t["v"] += 0.010
        return t["v"]

    monkeypatch.setattr(_time, "time", fake)
    status2, *_ = glpk.lp(c, G, h, options={"tm_lim": 5})
    assert status2 == "unknown"


def test_it_lim_total_across_phases():
    """it_lim caps TOTAL pivots (GLPK semantics), not per-phase: a
    budget that phase 1 consumes leaves nothing for phase 2."""
    rng = np.random.default_rng(3)
    n = 20
    Gm = np.vstack([np.eye(n), -np.eye(n)])
    h = np.concatenate([np.ones(n), np.zeros(n)])
    A = np.ones((1, n))
    b = np.array([n / 2.0])
    c = rng.standard_normal(n)
    st_full, *_ = glpk.lp(c, Gm, h, A, b)
    assert st_full == "optimal"
    # a 2-pivot budget cannot complete both phases on this problem
    st_tiny, *_ = glpk.lp(c, Gm, h, A, b, options={"it_lim": 2})
    assert st_tiny == "unknown"
