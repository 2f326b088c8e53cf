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
