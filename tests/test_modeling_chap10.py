"""Chapter-10 modeling examples (reference examples/doc/chap10,
tests/test_examples.py:75-83), reduced sizes: each example solves the
same problem in two formulations and the solutions must agree."""

import numpy as np

from cvxopt_tpu.modeling import op, variable, dot, max, sum


M, N = 60, 15


def _data(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((M, N)), rng.standard_normal(M)


def test_normappr():
    """normappr.py: linf, l1 and penalty approximation."""
    A, b = _data(0)
    x1 = variable(N)
    p1 = op(max(abs(A @ x1 + b)))
    p1.solve()
    assert p1.status == "optimal"

    x2 = variable(N)
    p2 = op(sum(abs(A @ x2 + b)))
    p2.solve()
    assert p2.status == "optimal"

    x3 = variable(N)
    p3 = op(sum(max(0, abs(A @ x3 + b) - 0.75,
                    2 * abs(A @ x3 + b) - 2.25)))
    p3.solve()
    assert p3.status == "optimal"
    # objective orderings: penalty <= l1
    assert float(p3.objective.value()[0]) <= \
        float(p2.objective.value()[0]) + 1e-6


def test_l1svc():
    """l1svc.py: the two 1-norm SVC formulations agree."""
    A, _ = _data(1)
    x = variable(N, "x")
    u = variable(M, "u")
    op(sum(abs(x)) + sum(u), [A @ x >= 1 - u, u >= 0]).solve()

    x2 = variable(N, "x2")
    op(sum(abs(x2)) + sum(max(0, 1 - A @ x2))).solve()

    assert np.linalg.norm(np.asarray(x.value)
                          - np.asarray(x2.value)) < 1e-4


def test_roblp():
    """roblp.py: the two robust-LP formulations agree."""
    rng = np.random.default_rng(2)
    A = rng.standard_normal((M, N))
    b = rng.uniform(0, 1, M)
    c = rng.standard_normal(N)

    x = variable(N)
    op(dot(c, x), A @ x + sum(abs(x)) <= b).solve()

    x2 = variable(N)
    y = variable(N)
    op(dot(c, x2), [A @ x2 + sum(y) <= b, -y <= x2, x2 <= y]).solve()

    assert np.linalg.norm(np.asarray(x.value)
                          - np.asarray(x2.value)) < 1e-4
