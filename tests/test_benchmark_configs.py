"""Reduced-size versions of the BASELINE.md benchmark configurations
(the full sizes run in bench.py):

  2. Markowitz portfolio QP (examples/doc/chap8/portfolio.py)
  3. robust least-squares SOCP with many SOC blocks (chap9/robls.py)
  4. mcsdp maxcut relaxation (chap8/mcsdp.py)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cvxopt_tpu import solvers
from cvxopt_tpu.cones import ConeDims


def markowitz(n, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, n // 2)) / np.sqrt(n)
    S = F @ F.T + 0.01 * np.eye(n)
    pbar = rng.uniform(0.0, 0.1, n)
    G = -np.eye(n)
    h = np.zeros(n)
    A = np.ones((1, n))
    b = np.array([1.0])
    return S, pbar, G, h, A, b


def test_markowitz_portfolio():
    n = 60
    S, pbar, G, h, A, b = markowitz(n)
    sol = solvers.coneqp(S, -pbar, G, h, A=A, b=b)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    assert abs(x.sum() - 1.0) < 1e-7 and x.min() > -1e-8


def robls_socp(m, n, rho, seed=0):
    """min sum_k sqrt(rho + (Ax-b)_k^2) as an SOCP with m SOC(3)
    blocks: (t_k, (Ax-b)_k, sqrt(rho)) in SOC."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    nv = n + m                          # variables (x, t)
    c = np.concatenate([np.zeros(n), np.ones(m)])
    G = np.zeros((3 * m, nv))
    h = np.zeros(3 * m)
    for k in range(m):
        G[3 * k, n + k] = -1.0          # s1 = t_k
        G[3 * k + 1, :n] = -A[k]        # s2 = (Ax-b)_k
        h[3 * k + 1] = -b[k]
        h[3 * k + 2] = np.sqrt(rho)     # s3 = sqrt(rho)
    dims = ConeDims(l=0, q=(3,) * m)
    return c, G, h, dims, A, b


def test_robls_socp_100_blocks():
    """Config 3 pattern: 100 equal SOC blocks process as ONE run."""
    m, n, rho = 100, 20, 0.1
    c, G, h, dims, A, b = robls_socp(m, n, rho)
    assert len(dims.q_runs) == 1        # single batched run
    sol = solvers.conelp(c, G, h, dims=dims.as_dict())
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])[:n]
    # compare objective against the smooth formulation's optimality:
    # grad = A' (r / sqrt(rho + r^2)) = 0
    r = A @ x - b
    g = A.T @ (r / np.sqrt(rho + r * r))
    assert np.abs(g).max() < 5e-3
    obj = np.sqrt(rho + r * r).sum()
    assert abs(sol["primal objective"] - obj) < 1e-4 * obj


def test_mcsdp():
    """Config 4 pattern (reduced): maxcut relaxation
    minimize sum(x) s.t. w + diag(x) >= 0; dual z has unit diagonal
    (reference tests/test_examples.py:test_ch8_mcsdp)."""
    n = 25
    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, n))
    w = (w + w.T) / 2.0
    # G maps x -> -diag(x) (svec rows); h = w
    G = np.zeros((n * n, n))
    for i in range(n):
        G[i * n + i, i] = -1.0
    sol = solvers.conelp(np.ones(n), G, w.reshape(-1),
                         dims={"l": 0, "q": [], "s": [n]})
    assert sol["status"] == "optimal"
    z = np.asarray(sol["z"]).reshape(n, n)
    np.testing.assert_allclose(np.diag(z), np.ones(n), atol=1e-5)
    # primal feasibility: w + diag(x) PSD
    x = np.asarray(sol["x"])
    evals = np.linalg.eigvalsh(w + np.diag(x))
    assert evals.min() > -1e-6
