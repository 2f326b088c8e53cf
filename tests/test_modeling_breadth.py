"""DSL breadth, second pass (VERDICT r04 #9): reference-derived
modeling idioms beyond the chap10 examples, cross-checked against
scipy.optimize.linprog on the equivalent explicit LP.

Reference sources: the `_function` algebra
(/root/reference/src/python/modeling.py:250-1832 — division,
unary +, __lt__/__gt__ aliases, in-place ops) and the PWL composition
rules (max-of-max flattening, sums of PWL, scaled PWL)."""

import numpy as np
import pytest
from scipy.optimize import linprog

from cvxopt_tpu import modeling as md
from cvxopt_tpu.modeling import variable, op, max as vmax, min as vmin


def test_division_and_unary_pos():
    """e / c and +e (modeling.py:576-622, 196)."""
    x = variable(2, "x")
    e = (2.0 * x[0] + 4.0 * x[1]) / 2.0     # = x0 + 2 x1
    f = +e
    p = op(f, [x[0] >= 1.0, x[1] >= 2.0])
    p.solve()
    assert p.status == "optimal"
    np.testing.assert_allclose(float(p.objective.value()), 5.0,
                               atol=1e-5)
    # division by a nonconstant must raise, as in the reference
    with pytest.raises(TypeError):
        _ = 1.0 / x        # noqa: F841
    with pytest.raises(TypeError):
        _ = x / x[0]       # noqa: F841


def test_lt_gt_aliases():
    """__lt__/__gt__ are constraint aliases of <=/>=
    (modeling.py:654-659)."""
    x = variable(1, "x")
    p = op(x, [x > 3.0])           # > means >=
    p.solve()
    assert p.status == "optimal"
    np.testing.assert_allclose(np.asarray(x.value).ravel(), [3.0],
                               atol=1e-6)
    q = op(-x, [x < 2.0])
    q.solve()
    np.testing.assert_allclose(np.asarray(x.value).ravel(), [2.0],
                               atol=1e-6)


def test_nested_max_of_max():
    """max(max(u) + affine, other) flattens into one PWL term
    (the reference distributes the affine part into each piece)."""
    x = variable(1, "x")
    inner = vmax(x - 1.0, -x - 1.0)          # = |x| - 1
    outer = vmax(inner + 0.5, 2.0 * x - 3.0)
    # minimize outer -> at x*=0: pieces are |x|-0.5 and 2x-3;
    # minimum of max(|x|-.5, 2x-3) is -0.5 at x=0? check: at x=0 ->
    # max(-0.5, -3) = -0.5; moving x negative: |x|-.5 grows; x in
    # (0, ..): |x|-.5 grows too. So min = -0.5 at x = 0.
    p = op(outer)
    p.solve()
    assert p.status == "optimal"
    np.testing.assert_allclose(float(p.objective.value()), -0.5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x.value).ravel(), [0.0],
                               atol=1e-4)


def test_nested_min_of_min_constraint():
    """min-of-min (concave PWL) on the >= side of a constraint."""
    x = variable(1, "x")
    inner = vmin(x + 1.0, 3.0 - x)           # concave tent
    outer = vmin(inner, 2.0 * x + 0.5)
    p = op(x, [outer >= 0.5])
    p.solve()
    assert p.status == "optimal"
    xv = float(np.asarray(x.value).ravel()[0])
    # feasibility of all three pieces at the solution
    assert xv + 1.0 >= 0.5 - 1e-6
    assert 3.0 - xv >= 0.5 - 1e-6
    assert 2.0 * xv + 0.5 >= 0.5 - 1e-6
    np.testing.assert_allclose(xv, 0.0, atol=1e-5)   # min x


def test_l1_fit_vs_scipy():
    """minimize ||Ax - b||_1 via sum(abs(.)) — cross-checked against
    the explicit LP in scipy linprog."""
    rng = np.random.default_rng(0)
    A = rng.standard_normal((14, 3))
    b = rng.standard_normal(14)
    x = variable(3, "x")
    p = op(md.sum(abs(A @ x - b)))
    p.solve()
    assert p.status == "optimal"
    # explicit LP: min 1't, -t <= Ax - b <= t
    m, n = A.shape
    c = np.concatenate([np.zeros(n), np.ones(m)])
    Aub = np.block([[A, -np.eye(m)], [-A, -np.eye(m)]])
    bub = np.concatenate([b, -b])
    ref = linprog(c, A_ub=Aub, b_ub=bub,
                  bounds=[(None, None)] * (n + m))
    assert ref.status == 0
    np.testing.assert_allclose(float(p.objective.value()), ref.fun,
                               atol=1e-5)


def test_linf_fit_vs_scipy():
    """minimize ||Ax - b||_inf via max(abs(.))."""
    rng = np.random.default_rng(1)
    A = rng.standard_normal((11, 3))
    b = rng.standard_normal(11)
    x = variable(3, "x")
    p = op(vmax(abs(A @ x - b)))
    p.solve()
    assert p.status == "optimal"
    m, n = A.shape
    c = np.concatenate([np.zeros(n), [1.0]])
    Aub = np.block([[A, -np.ones((m, 1))], [-A, -np.ones((m, 1))]])
    bub = np.concatenate([b, -b])
    ref = linprog(c, A_ub=Aub, b_ub=bub,
                  bounds=[(None, None)] * (n + 1))
    assert ref.status == 0
    np.testing.assert_allclose(float(p.objective.value()), ref.fun,
                               atol=1e-5)


def test_inplace_div_and_mul():
    """__itruediv__ / __imul__ (modeling.py:539-633)."""
    x = variable(2, "x")
    e = 4.0 * x[0] + 2.0 * x[1]
    e /= 2.0                                  # 2 x0 + x1
    e *= 3.0                                  # 6 x0 + 3 x1
    p = op(e, [x >= 1.0])
    p.solve()
    assert p.status == "optimal"
    np.testing.assert_allclose(float(p.objective.value()), 9.0,
                               atol=1e-5)


def test_scaled_pwl_composition():
    """c * max(...) with c > 0 stays convex and composes into sums;
    negative scaling flips to concave (usable on the >= side)."""
    x = variable(1, "x")
    f = 2.0 * vmax(x, -x) + 0.5 * vmax(x - 1.0, 1.0 - x)
    p = op(f)
    p.solve()
    assert p.status == "optimal"
    # brute force on a grid
    g = np.linspace(-2, 2, 4001)
    val = 2 * np.abs(g) + 0.5 * np.maximum(g - 1, 1 - g)
    np.testing.assert_allclose(float(p.objective.value()), val.min(),
                               atol=1e-4)


def test_expression_slicing_in_constraints():
    """Slices of an affine expression as independent constraints
    (modeling.py:664-713 __getitem__)."""
    x = variable(4, "x")
    A = np.arange(16.0).reshape(4, 4) + np.eye(4) * 10
    e = A @ x
    p = op(md.sum(x), [e[:2] >= 1.0, e[2:] >= 2.0, x >= 0.0])
    p.solve()
    assert p.status == "optimal"
    xv = np.asarray(x.value).ravel()
    r = A @ xv
    assert (r[:2] >= 1.0 - 1e-6).all() and (r[2:] >= 2.0 - 1e-6).all()
