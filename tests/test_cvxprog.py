"""Tests for the nonlinear solvers cp/cpl/gp, mirroring the
reference's chap9 examples (/root/reference/examples/doc/chap9,
tests/test_examples.py:61-72)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvxopt_tpu.cvxprog import cp, cpl, gp


def test_acent():
    """Equality-constrained analytic centering (chap9/acent.py):
    minimize -sum log x  s.t.  A x = b."""
    rng = np.random.default_rng(0)
    m, n = 5, 20
    y = rng.standard_normal(m)
    s = rng.uniform(0, 1, n)
    A = rng.standard_normal((m, n))
    r = s - A.T @ y
    A = A + np.outer(y, r) / (y @ y)      # ensures A'y > 0
    x_feas = rng.uniform(0, 1, n)
    b = A @ x_feas

    def F(x):
        return jnp.array([-jnp.sum(jnp.log(x))])

    sol = cp(F, np.ones(n), A=A, b=b)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    assert x.min() > 0
    np.testing.assert_allclose(A @ x, b, atol=1e-6)
    # optimality: 1/x = A'nu for some nu  =>  residual of least squares
    g = 1.0 / x
    nu, *_ = np.linalg.lstsq(A.T, g, rcond=None)
    np.testing.assert_allclose(A.T @ nu, g, rtol=1e-4, atol=1e-5)


def test_acent2_with_box():
    """Analytic centering with box constraint -1 <= x <= 1 via G, h
    (chap9/acent2.py pattern)."""
    rng = np.random.default_rng(1)
    m, n = 3, 8
    A = rng.standard_normal((m, n))
    x_feas = rng.uniform(0.1, 0.5, n)
    b = A @ x_feas

    def F(x):
        return jnp.array([-jnp.sum(jnp.log(1.0 - x * x))])

    G = np.concatenate([np.eye(n), -np.eye(n)])
    h = np.ones(2 * n)
    sol = cp(F, np.zeros(n), G, h, A=A, b=b)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    assert np.abs(x).max() < 1.0
    np.testing.assert_allclose(A @ x, b, atol=1e-6)


def test_gp_floorplanning():
    """The small GP of section 9.3 (chap9/gp.py)."""
    Aflr, Awall = 1000.0, 100.0
    alpha, beta, gamma, delta = 0.5, 2.0, 0.5, 2.0
    F = np.array([[-1., 1., 1., 0., -1., 1., 0., 0.],
                  [-1., 1., 0., 1., 1., -1., 1., -1.],
                  [-1., 0., 1., 1., 0., 0., -1., 1.]]).T
    g = np.log(np.array([1.0, 2 / Awall, 2 / Awall, 1 / Aflr, alpha,
                         1 / beta, gamma, 1 / delta]))
    K = [1, 2, 1, 1, 1, 1, 1]
    sol = gp(K, F, g)
    assert sol["status"] == "optimal"
    h, w, d = np.exp(np.asarray(sol["x"]))
    # all constraints satisfied
    assert 2 * (h * w + h * d) <= Awall * (1 + 1e-5)
    assert w * d <= Aflr * (1 + 1e-5)
    assert alpha - 1e-6 <= h / w <= beta + 1e-6
    assert gamma - 1e-6 <= d / w <= delta + 1e-6
    # true optimum (cross-checked with scipy SLSQP):
    # h = 2.8868, w = 5.7735, d = 11.5470
    np.testing.assert_allclose([h, w, d], [2.88675, 5.77350, 11.54700],
                               rtol=1e-3)


def test_cpl_linear_objective():
    """cpl with explicit linear objective: minimize c'x s.t.
    sum exp(x) <= 10, x >= -2 (componentwise)."""
    n = 4
    c = np.ones(n)

    def F(x):
        return jnp.array([jnp.sum(jnp.exp(x)) - 10.0])

    G = -np.eye(n)
    h = 2.0 * np.ones(n)
    sol = cpl(c, F, np.zeros(n), G, h)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    # solution hits the bound x = -2
    np.testing.assert_allclose(x, -2.0 * np.ones(n), atol=1e-4)


def test_l2ac():
    """Section 9.4 example: minimize 0.5||Ax-b||^2 - sum log(1-x_i^2)
    (chap9/l2ac.py) — solved with automatic Df/H."""
    rng = np.random.default_rng(2)
    m, n = 4, 10
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def F(x):
        r = Aj @ x - bj
        return jnp.array([0.5 * jnp.sum(r * r)
                          - jnp.sum(jnp.log(1.0 - x * x))])

    sol = cp(F, np.zeros(n))
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    assert np.abs(x).max() < 1.0
    # unconstrained: gradient vanishes
    g = A.T @ (A @ x - b) + 2 * x / (1 - x * x)
    assert np.abs(g).max() < 1e-5


def test_cpl_custom_kktsolver():
    """Custom kktsolver(x, znl, W) for cpl (cvxprog.py:518-537):
    min 1'x s.t. sum(exp(x)) <= K, x >= -2, with the diagonal+rank-1
    KKT structure exploited via Sherman-Morrison; cross-checked
    against the default dense path."""
    import jax.scipy.linalg as jsl
    n = 6
    c = np.ones(n)

    def F(x):
        return jnp.array([jnp.sum(jnp.exp(x)) - 10.0])

    G = -np.eye(n)
    h = 2.0 * np.ones(n)
    Gj = jnp.asarray(G)

    def Fkkt(x, znl, W):
        ex = jnp.exp(x)
        H = znl[0] * ex                      # diag of Hessian
        dnli2 = W["dnli"][0] ** 2
        di2 = W["di"] ** 2
        # S = diag(H + di^2) + dnli2 * outer(ex, ex)
        D = H + di2
        u = jnp.sqrt(dnli2) * ex
        Dinv = 1.0 / D
        denom = 1.0 + jnp.dot(u, Dinv * u)

        def Sinv(v):
            t = Dinv * v
            return t - Dinv * u * (jnp.dot(u, t) / denom)

        def solve(bx, by, bz):
            # rhs = bx + GG' W^{-1} W^{-T} bz,  GG = [ex'; -I]
            rhs = bx + ex * (dnli2 * bz[0]) - di2 * bz[1:]
            ux = Sinv(rhs)
            uy = by
            Wuz_nl = W["dnli"] * (jnp.dot(ex, ux) - bz[:1])
            Wuz_l = W["di"] * (-ux - bz[1:])
            return ux, uy, jnp.concatenate([Wuz_nl, Wuz_l])

        return solve

    sol_d = cpl(c, F, np.zeros(n), G, h)
    sol_c = cpl(c, F, np.zeros(n), G, h, kktsolver=Fkkt)
    assert sol_d["status"] == "optimal"
    assert sol_c["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol_c["x"]),
                               np.asarray(sol_d["x"]), rtol=1e-6,
                               atol=1e-7)


def test_cpl_matrix_free():
    """Operator-form Df/H (matrix_free=True, reference level-2
    customization cvxprog.py:286-402): Df@u / Df'@v / H@u run as
    jvp/vjp/Hessian-vector products of F — the dense Jacobian/Hessian
    are never materialized.  Same Sherman-Morrison custom kktsolver as
    test_cpl_custom_kktsolver; must match the dense default path."""
    n = 6
    c = np.ones(n)

    def F(x):
        return jnp.array([jnp.sum(jnp.exp(x)) - 10.0])

    G = -np.eye(n)
    h = 2.0 * np.ones(n)

    def Fkkt(x, znl, W):
        ex = jnp.exp(x)
        H = znl[0] * ex
        dnli2 = W["dnli"][0] ** 2
        di2 = W["di"] ** 2
        D = H + di2
        u = jnp.sqrt(dnli2) * ex
        Dinv = 1.0 / D
        denom = 1.0 + jnp.dot(u, Dinv * u)

        def Sinv(v):
            t = Dinv * v
            return t - Dinv * u * (jnp.dot(u, t) / denom)

        def solve(bx, by, bz):
            rhs = bx + ex * (dnli2 * bz[0]) - di2 * bz[1:]
            ux = Sinv(rhs)
            uy = by
            Wuz_nl = W["dnli"] * (jnp.dot(ex, ux) - bz[:1])
            Wuz_l = W["di"] * (-ux - bz[1:])
            return ux, uy, jnp.concatenate([Wuz_nl, Wuz_l])

        return solve

    sol_d = cpl(c, F, np.zeros(n), G, h)
    sol_mf = cpl(c, F, np.zeros(n), G, h, kktsolver=Fkkt,
                 matrix_free=True)
    assert sol_mf["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol_mf["x"]),
                               np.asarray(sol_d["x"]), rtol=1e-6,
                               atol=1e-7)
    # operator mode must reject a string kktsolver
    import pytest
    with pytest.raises(ValueError):
        cpl(c, F, np.zeros(n), G, h, matrix_free=True)


def test_cpl_with_soc_cone():
    """cpl with BOTH a nonlinear block and an SOC constraint — the
    'dnl' + 'q' scaling combination (misc.py:65-115 with mnl > 0):
    minimize c'x  s.t.  sum(exp(x)) <= K,  ||x||_2 <= 1."""
    n = 5
    rng = np.random.default_rng(8)
    c = rng.standard_normal(n)

    def F(x):
        return jnp.array([jnp.sum(jnp.exp(x)) - 20.0])

    # SOC rows: s = (1, x) in SOC(n+1)  <=>  ||x|| <= 1
    G = np.zeros((n + 1, n))
    G[1:, :] = -np.eye(n)
    h = np.zeros(n + 1)
    h[0] = 1.0
    dims = {"l": 0, "q": [n + 1], "s": []}
    sol = cpl(c, F, np.zeros(n), G, h, dims)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    assert np.linalg.norm(x) <= 1.0 + 1e-6
    assert float(np.sum(np.exp(x))) <= 20.0 + 1e-5
    # the exp constraint is slack here, so the solution is the
    # negative unit vector along c
    np.testing.assert_allclose(x, -c / np.linalg.norm(c), atol=1e-4)
