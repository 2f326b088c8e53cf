"""Integer LP tests, mirroring the reference's glpk.ilp cases
(/root/reference/tests/test_glpk.py:35-46)."""

import numpy as np

from cvxopt_tpu.ilp import ilp


C = np.array([-4., -5.])
G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
H = np.array([3., 3., 0., 0.])
A = np.array([[1.0, 1.0]])
B1 = np.array([1.0])


def test_ilp_one_integer():
    status, x = ilp(C, G, H, A, B1, I={0})
    assert status == "optimal"
    assert abs(x[0] - round(x[0])) < 1e-6
    assert abs(x.sum() - 1.0) < 1e-6


def test_ilp_all_integer():
    status, x = ilp(C, G, H, I={0, 1})
    assert status == "optimal"
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-6)


def test_ilp_binary():
    status, x = ilp(C, G, H, B={1})
    assert status == "optimal"
    assert x[1] in (0.0, 1.0)


def test_ilp_infeasible_relaxation():
    status, x = ilp(C, G, H, A, np.array([-1.0]), B={0, 1})
    assert status == "LP relaxation is primal infeasible"
    assert x is None


def test_ilp_knapsack():
    """0/1 knapsack: max 10x0+13x1+7x2 s.t. 3x0+4x1+2x2 <= 6."""
    c = -np.array([10., 13., 7.])
    G = np.array([[3., 4., 2.]])
    h = np.array([6.0])
    status, x = ilp(c, G, h, B={0, 1, 2})
    assert status == "optimal"
    # optimal: x1 + x2 (value 20) vs x0+x2 (17) vs x1 alone (13)
    np.testing.assert_allclose(x, [0., 1., 1.], atol=1e-6)
