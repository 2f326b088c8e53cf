"""Golden cross-check: the single-core numpy reference solver
(cvxopt_tpu._npref) against the JAX coneqp — same algorithm,
independent implementations (the house verification style, SURVEY §4)."""

import numpy as np
import pytest

from cvxopt_tpu._npref import coneqp_np
from cvxopt_tpu import solvers


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coneqp_matches_npref(seed):
    rng = np.random.default_rng(seed)
    n, m, p = 15, 30, 2
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    G = np.concatenate([-np.eye(n), rng.standard_normal((m - n, n))])
    h = np.concatenate([np.zeros(n), rng.uniform(1, 2, m - n)])
    A = rng.standard_normal((p, n))
    b = rng.standard_normal(p) * 0.1
    ra = coneqp_np(P, q, G, h, A, b)
    rb = solvers.coneqp(P, q, G, h, A=A, b=b)
    assert ra["status"] == "optimal"
    assert rb["status"] == "optimal"
    np.testing.assert_allclose(ra["x"], np.asarray(rb["x"]),
                               rtol=1e-4, atol=1e-5)
    # multipliers that are ~0 at the solution can differ by orders of
    # magnitude between runs converging at different gap levels;
    # compare with an absolute floor.
    np.testing.assert_allclose(ra["z"], np.asarray(rb["z"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_coneqp_cones_matches_npref_soc(seed):
    """The general-cone numpy reference vs the JAX coneqp on an SOC QP
    (independent implementations of coneprog.py:1440 + misc.py NT
    scaling; agreement validates both)."""
    from cvxopt_tpu._npref import coneqp_np_cones
    rng = np.random.default_rng(seed)
    n, nq, mq = 24, 8, 4
    m = nq * mq
    F = rng.standard_normal((n, 8)) / np.sqrt(n)
    P = F @ F.T + 0.1 * np.eye(n)
    q = -rng.uniform(0, .1, n)
    G = 0.3 * rng.standard_normal((m, n))
    hh = (0.1 * rng.standard_normal(m)).reshape(nq, mq)
    hh[:, 0] = 1.0
    h = hh.reshape(-1)
    A = np.ones((1, n))
    b = np.ones(1)
    ref = coneqp_np_cones(P, q, G, h, {"q": [mq] * nq}, A, b,
                          abstol=1e-7, reltol=1e-7, feastol=1e-7)
    assert ref["status"] == "optimal"
    sol = solvers.coneqp(P, q, G, h, dims={"l": 0, "q": [mq] * nq,
                                           "s": []}, A=A, b=b)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), ref["x"],
                               atol=5e-6)


def test_coneqp_cones_matches_npref_sdp():
    """The numpy reference 's' path vs the JAX conelp on an mcsdp
    instance (P=0 coneqp vs HSD conelp: same optimum)."""
    from cvxopt_tpu._npref import coneqp_np_cones
    rng = np.random.default_rng(7)
    m = 10
    w = rng.standard_normal((m, m))
    w = (w + w.T) / np.sqrt(m)
    n = m
    G = np.zeros((m * m, n))
    for j in range(n):
        G[j * m + j, j] = -1.0
    ref = coneqp_np_cones(np.zeros((n, n)), np.ones(n), G,
                          w.reshape(-1), {"s": [m]},
                          abstol=1e-7, reltol=1e-6, feastol=1e-7)
    assert ref["status"] == "optimal"
    sol = solvers.conelp(np.ones(n), G, w.reshape(-1),
                         dims={"l": 0, "q": [], "s": [m]})
    assert sol["status"] == "optimal"
    # an SDP solution near a degenerate face is less sharply
    # determined than the optimal value: compare objectives tightly,
    # iterates loosely
    np.testing.assert_allclose(float(np.sum(np.asarray(sol["x"]))),
                               float(np.sum(ref["x"])), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sol["x"]), ref["x"],
                               atol=2e-3)
