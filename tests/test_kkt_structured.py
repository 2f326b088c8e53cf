"""Library-packaged structure-exploiting KKT solvers
(cvxopt_tpu.kkt_structured) — the reference ships these only as doc
examples (/root/reference/examples/doc/chap8/{l1,l1regls}.py); here
they are library functions and must match the dense default path."""

import numpy as np
import jax.numpy as jnp

from cvxopt_tpu import solvers, kkt_structured


def test_woodbury_solver():
    rng = np.random.default_rng(0)
    n, k = 30, 4
    d = rng.uniform(0.5, 2.0, n)
    U = rng.standard_normal((n, k))
    M = np.diag(d) + 3.0 * U @ U.T
    solve = kkt_structured.woodbury_solver(d, U, c=3.0)
    r = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(solve(jnp.asarray(r))),
                               np.linalg.solve(M, r), rtol=1e-9,
                               atol=1e-11)
    # matrix of right-hand sides
    R = rng.standard_normal((n, 5))
    np.testing.assert_allclose(np.asarray(solve(jnp.asarray(R))),
                               np.linalg.solve(M, R), rtol=1e-9,
                               atol=1e-11)


def test_l1_library_solver():
    rng = np.random.default_rng(2)
    m, n = 60, 20
    P = rng.standard_normal((m, n))
    q = rng.standard_normal(m)
    sol = kkt_structured.l1(P, q)
    assert sol["status"] == "optimal"
    u = np.asarray(sol["u"])
    # dense cross-check
    I = np.eye(m)
    Gd = np.block([[P, -I], [-P, -I]])
    c = np.concatenate([np.zeros(n), np.ones(m)])
    h = np.concatenate([q, -q])
    sd = solvers.conelp(c, Gd, h)
    assert sd["status"] == "optimal"
    np.testing.assert_allclose(u, np.asarray(sd["x"])[:n], atol=1e-4)
    # dual feasibility P'w = 0 (reference test_examples l1 check)
    z = np.asarray(sol["z"])
    w = z[m:] - z[:m]
    np.testing.assert_allclose(P.T @ w, np.zeros(n), atol=1e-5)


def test_l1regls_library_solver():
    rng = np.random.default_rng(4)
    m, n = 15, 30                   # m << n: the Woodbury fast path
    A = rng.standard_normal((m, n))
    y = rng.standard_normal(m)
    sol = kkt_structured.l1regls(A, y)
    assert sol["status"] == "optimal"
    u = np.asarray(sol["u"])
    # optimality conditions of min ||Au-y||^2 + ||u||_1
    g = 2 * A.T @ (A @ u - y)
    on = np.abs(u) > 1e-6
    assert np.max(np.abs(g[on] + np.sign(u[on]))) < 1e-4
    assert np.max(np.abs(g[~on])) <= 1.0 + 1e-4
