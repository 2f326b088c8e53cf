"""Modeling-DSL tests, mirroring /root/reference/tests/test_modeling.py."""

import os

import numpy as np
import pytest

from cvxopt_tpu.modeling import op, variable, dot, max, min, sum

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_exceptions():
    with pytest.raises(TypeError):
        variable(0)


def test_case1_scalar_lp():
    x = variable()
    y = variable()
    c1 = (2 * x + y <= 3)
    c2 = (x + 2 * y <= 3)
    c3 = (x >= 0)
    c4 = (y >= 0)
    lp1 = op(-4 * x - 5 * y, [c1, c2, c3, c4])
    repr(x), str(x), repr(lp1), str(lp1)
    lp1.solve()
    assert lp1.status == "optimal"
    np.testing.assert_allclose(x.value, [1.0], atol=1e-5)
    np.testing.assert_allclose(y.value, [1.0], atol=1e-5)
    # multipliers (chap10/lp.py prints these)
    assert c1.multiplier.value is not None
    np.testing.assert_allclose(np.asarray(c1.multiplier.value), [1.0],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(c2.multiplier.value), [2.0],
                               atol=1e-4)


def test_case2_matrix_lp():
    x = variable(2)
    A = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    b = np.array([3., 3., 0., 0.])
    c = np.array([-4., -5.])
    ineq = (A @ x <= b)
    lp2 = op(dot(c, x), ineq)
    lp2.solve()
    assert lp2.status == "optimal"
    assert abs(float(lp2.objective.value()[0]) - (-9.0)) < 1e-4


def test_case3_pwl():
    """PWL objectives (reference test_modeling.py:38-57, reduced
    size)."""
    m, n = 100, 20
    rng = np.random.default_rng(100)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)

    x1 = variable(n)
    lp1 = op(max(abs(A @ x1 - b)))
    lp1.solve()
    assert lp1.status == "optimal"
    # cross-check: linf solution via direct LP is the objective value
    r1 = np.abs(A @ x1.value - b).max()
    assert abs(float(lp1.objective.value()[0]) - r1) < 1e-6

    x2 = variable(n)
    lp2 = op(sum(abs(A @ x2 - b)))
    lp2.solve()
    assert lp2.status == "optimal"
    r2 = np.abs(A @ x2.value - b).sum()
    assert abs(float(lp2.objective.value()[0]) - r2) < 1e-5

    x3 = variable(n)
    lp3 = op(sum(max(0, abs(A @ x3 - b) - 0.75,
                     2 * abs(A @ x3 - b) - 2.25)))
    lp3.solve()
    assert lp3.status == "optimal"
    u = np.abs(A @ x3.value - b)
    r3 = np.maximum(0, np.maximum(u - 0.75, 2 * u - 2.25)).sum()
    assert abs(float(lp3.objective.value()[0]) - r3) < 1e-5
    # l1 objective is at least the huber-like one
    assert r3 <= r2 + 1e-6


def test_pwl_constraint():
    """PWL expression in a constraint: Chebyshev-type bound."""
    rng = np.random.default_rng(1)
    n = 5
    c = rng.standard_normal(n)
    x = variable(n)
    pr = op(dot(c, x), [max(abs(x)) <= 1])
    pr.solve()
    assert pr.status == "optimal"
    # optimum of min c'x over the box is -||c||_1
    assert abs(float(pr.objective.value()[0]) + np.abs(c).sum()) < 1e-5


def test_equality_and_value():
    x = variable(3)
    A = np.array([[1., 1., 1.]])
    cons = [A @ x == 1.0, x >= 0]
    pr = op(dot(np.array([3., 1., 2.]), x), cons)
    pr.solve()
    assert pr.status == "optimal"
    np.testing.assert_allclose(x.value, [0., 1., 0.], atol=1e-6)


def test_loadfile():
    """MPS load + solve (reference test_modeling.py:59-63)."""
    lp = op()
    lp.fromfile(os.path.join(DATA, "boeing2.mps"))
    lp.solve()
    assert lp.status == "optimal"


def test_tofile_roundtrip(tmp_path):
    x = variable(2, "x")
    A = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    b = np.array([3., 3., 0., 0.])
    pr = op(dot(np.array([-4., -5.]), x), A @ x <= b)
    path = str(tmp_path / "small.mps")
    pr.tofile(path)
    lp2 = op().fromfile(path)
    sol = lp2.solve()
    assert lp2.status == "optimal"
    assert abs(sol["primal objective"] - (-9.0)) < 1e-4


def test_min_concave_constraint():
    """min() builds concave expressions usable on the >= side."""
    x = variable(2)
    pr = op(sum(x), [min(x[0], x[1]) >= 1])
    pr.solve()
    assert pr.status == "optimal"
    np.testing.assert_allclose(x.value, [1.0, 1.0], atol=1e-5)


def test_case3_pwl_full_size():
    """The reference's PWL stress case at FULL size (500x100 random,
    /root/reference/tests/test_modeling.py:38-57): linf, l1, and the
    two-segment penalty approximation, each solving to 'optimal' with
    an objective consistent with its own solution."""
    m, n = 500, 100
    rng = np.random.default_rng(100)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)

    x1 = variable(n)
    lp1 = op(max(abs(A @ x1 - b)))
    lp1.solve()
    assert lp1.status == "optimal"
    r1 = np.abs(A @ x1.value - b).max()
    assert abs(float(lp1.objective.value()[0]) - r1) < 1e-6

    x2 = variable(n)
    lp2 = op(sum(abs(A @ x2 - b)))
    lp2.solve()
    assert lp2.status == "optimal"
    r2 = np.abs(A @ x2.value - b).sum()
    assert abs(float(lp2.objective.value()[0]) - r2) < 1e-4

    x3 = variable(n)
    lp3 = op(sum(max(0, abs(A @ x3 - b) - 0.75,
                     2 * abs(A @ x3 - b) - 2.25)))
    lp3.solve()
    assert lp3.status == "optimal"
    u = np.abs(A @ x3.value - b)
    r3 = np.maximum(0, np.maximum(u - 0.75, 2 * u - 2.25)).sum()
    assert abs(float(lp3.objective.value()[0]) - r3) < 1e-4
    assert r3 <= r2 + 1e-6


def test_inplace_expression_arithmetic():
    """Reference _function supports f += g / f -= g / f *= a; the
    Python fallback through __add__ must keep these working."""
    x = variable(2, "x")
    f = 2 * x[0] + x[1]
    f += x[0]
    f -= 3 * x[1]
    f *= 2.0
    pr = op(f, [x >= 0, x <= 1, x[0] + x[1] >= 0.5])
    pr.solve()
    assert pr.status == "optimal"
    # min 2*(3 x0 - 2 x1) over the box with sum >= 0.5 -> x=[0,1]
    np.testing.assert_allclose(np.asarray(x.value), [0.0, 1.0],
                               atol=1e-5)
