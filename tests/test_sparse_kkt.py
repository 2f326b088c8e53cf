"""Sparse (banded, RCM-ordered, fixed-pattern) KKT path
(ops/sparse_kkt.py) — the TPU analogue of the reference's
CHOLMOD-backed kkt_chol2 with partial=True re-assembly
(misc.py:1431-1487, base.c:398-489)."""

import numpy as np
import scipy.sparse as sp
import pytest

import jax.numpy as jnp

from cvxopt_tpu.ops.sparse_kkt import (
    SparseELL, make_band_plan, assemble_band, kkt_chol2_banded,
)
from cvxopt_tpu import solvers
from cvxopt_tpu.cones import ConeDims


def _chain_lp(n, seed=0):
    """A banded LP: min c'x s.t. 0 <= x <= 1, chain coupling rows
    |x_i - x_{i+1}| <= 0.5.  G is bidiagonal-structured, S = G'DG
    tridiagonal-ish."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal(n) * 0.1
    rows, cols, vals, h = [], [], [], []
    r = 0
    for i in range(n):          # bounds
        rows += [r, r + 1]
        cols += [i, i]
        vals += [-1.0, 1.0]
        h += [0.0, 1.0]
        r += 2
    for i in range(n - 1):      # chain
        rows += [r, r, r + 1, r + 1]
        cols += [i, i + 1, i, i + 1]
        vals += [1.0, -1.0, -1.0, 1.0]
        h += [0.5, 0.5]
        r += 2
    G = sp.coo_matrix((vals, (rows, cols)), shape=(r, n)).tocsr()
    return c, G, np.asarray(h)


def test_ell_matvec():
    rng = np.random.default_rng(0)
    A = sp.random(13, 7, density=0.3, random_state=1, format="csr")
    E = SparseELL.from_scipy(A)
    x = rng.standard_normal(7)
    y = rng.standard_normal(13)
    np.testing.assert_allclose(np.asarray(E.matvec(jnp.asarray(x))),
                               A @ x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(E.rmatvec(jnp.asarray(y))),
                               A.T @ y, atol=1e-12)
    np.testing.assert_allclose(np.asarray(E.todense()), A.toarray(),
                               atol=1e-12)


def test_band_assembly_matches_dense():
    rng = np.random.default_rng(2)
    n = 20
    _, G, _ = _chain_lp(n, seed=2)
    plan = make_band_plan(G)
    w = rng.uniform(0.5, 2.0, G.shape[0])
    band = assemble_band(plan, jnp.asarray(w))
    S = (G.T @ sp.diags(w) @ G).toarray()
    Sp = S[np.ix_(plan.perm, plan.perm)]
    dense_from_band = np.zeros((n, n))
    for j in range(plan.kd + 1):
        d = np.asarray(band)[j, : n - j]
        dense_from_band += np.diag(d, -j)
        if j:
            dense_from_band += np.diag(d, j)
    np.testing.assert_allclose(dense_from_band, Sp, atol=1e-10)


def test_banded_lp_matches_dense_conelp():
    n = 40
    c, G, h = _chain_lp(n, seed=3)
    dims = ConeDims(l=G.shape[0])
    ref = solvers.conelp(c, G.toarray(), h)
    kkt = kkt_chol2_banded(G, dims)
    sol = solvers.conelp(c, G.toarray(), h, kktsolver=kkt)
    assert ref["status"] == "optimal"
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-6)
    # the plan really is banded: bandwidth far below n
    assert kkt.plan.kd <= 4


def test_banded_qp_with_equalities_matches_dense():
    n = 30
    c, G, h = _chain_lp(n, seed=4)
    rng = np.random.default_rng(5)
    # sparse tridiagonal P
    Pd = sp.diags([np.full(n - 1, 0.3), np.full(n, 2.0),
                   np.full(n - 1, 0.3)], [-1, 0, 1]).tocsr()
    A = np.ones((1, n))
    b = np.array([n / 2.0])
    dims = ConeDims(l=G.shape[0])
    ref = solvers.coneqp(Pd.toarray(), c, G.toarray(), h, A=A, b=b)
    kkt = kkt_chol2_banded(G, dims, A=A, P_sp=Pd)
    sol = solvers.coneqp(Pd.toarray(), c, G.toarray(), h, A=A, b=b,
                         kktsolver=kkt)
    assert ref["status"] == "optimal"
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-6)


def test_scaling_with_structure():
    """Factor cost scales with structure: assembly+factor at n and 4n
    differ by ~4x work, not 64x (O(n kd^2) vs O(n^3)).  Checked
    structurally: the band plan size is linear in n."""
    for n in (200, 800):
        _, G, _ = _chain_lp(n)
        plan = make_band_plan(G)
        assert plan.kd <= 4
        assert plan.scatter_idx.shape[0] <= G.shape[0] * 9


def test_lp_sparse_frontend_matches_dense():
    from cvxopt_tpu.ops.sparse_kkt import lp_sparse
    n = 50
    c, G, h = _chain_lp(n, seed=6)
    ref = solvers.lp(c, G.toarray(), h)
    sol = lp_sparse(c, G, h)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-6)


def test_lp_sparse_large_scales():
    """An LP with 1e5 variables and banded sparsity solves through the
    sparse path (dense G would be 4e10 entries).  Wall-clock sanity
    only — the real measurement lives in bench.py (BENCH_SPARSE)."""
    import time
    from cvxopt_tpu.ops.sparse_kkt import lp_sparse
    n = 100_000
    c, G, h = _chain_lp(n, seed=7)
    t0 = time.time()
    sol = lp_sparse(c, G, h, options={"maxiters": 30})
    dt = time.time() - t0
    assert sol["status"] == "optimal", sol["status"]
    assert sol["gap"] < 1e-6 * n       # abs gap scales with problem
    # a dense n=1e5 factor would be ~3e14 flops (hours); structured
    # path must complete in interactive time even on CPU CI
    assert dt < 600, f"sparse path too slow: {dt:.0f}s"


def test_spsolve_banded_backend():
    """cholmod-API symbolic/numeric/solve uses the banded backend for
    sparse inputs (cholmod.c:273-969 analogue, now genuinely sparse)."""
    from cvxopt_tpu.ops import spsolve
    rng = np.random.default_rng(8)
    n = 60
    d = rng.uniform(3, 4, n)
    e = rng.uniform(-1, 1, n - 1)
    f = rng.uniform(-0.5, 0.5, n - 2)
    S = sp.diags([f, e, d, e, f], [-2, -1, 0, 1, 2]).tocsr()
    symb = spsolve.symbolic(S)
    assert symb.banded and symb.kd <= 4
    F = spsolve.numeric(S, symb)
    b = rng.standard_normal(n)
    x = spsolve.solve(F, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(S.toarray(), b),
                               atol=1e-8)
    b2 = rng.standard_normal((n, 3))
    x2 = spsolve.solve(F, jnp.asarray(b2))
    np.testing.assert_allclose(np.asarray(x2),
                               np.linalg.solve(S.toarray(), b2),
                               atol=1e-8)
    # one-shot linsolve dispatches through the same path
    x3 = spsolve.linsolve(S, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x),
                               atol=1e-10)


def test_spsolve_options_semantics():
    """cholmod.options analogues (cholmod.c:84-140): supernodal=0
    forces the structured path, nmethods>=2 tries multiple orderings,
    dbound clamps the factor diagonal."""
    from cvxopt_tpu.ops import spsolve
    rng = np.random.default_rng(9)
    n = 40
    d = rng.uniform(3, 4, n)
    e = rng.uniform(-1, 1, n - 1)
    S = sp.diags([e, d, e], [-1, 0, 1]).tocsr()
    old = dict(spsolve.options)
    try:
        spsolve.options["supernodal"] = 0
        symb = spsolve.symbolic(S)
        assert symb.banded
        spsolve.options["nmethods"] = 2
        symb2 = spsolve.symbolic(S)
        assert symb2.kd <= symb.kd
        F = spsolve.numeric(S, symb2)
        b = rng.standard_normal(n)
        x = spsolve.solve(F, jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(S.toarray(), b),
                                   atol=1e-8)
        # dbound keeps a singular matrix factorizable (regularized)
        S2 = S.copy().tolil()
        S2[5, 5] = 0.0
        S2 = S2.tocsr()
        spsolve.options["dbound"] = 1e-8
        F2 = spsolve.numeric(S2, spsolve.symbolic(S2))
        assert not np.isnan(np.asarray(F2.L)).any()
    finally:
        spsolve.options.clear()
        spsolve.options.update(old)


def test_spmatrix_accessors():
    """spmatrix .I/.J/.V/.CCS analogues (sparse.c:3079-3087)."""
    import cvxopt_tpu as cvx
    from cvxopt_tpu.base import sp_I, sp_J, sp_V, sp_CCS
    X = cvx.spmatrix([1.0, 2.0, 3.0], [0, 2, 1], [1, 0, 1],
                     size=(3, 2))
    np.testing.assert_array_equal(np.asarray(sp_I(X)), [0, 2, 1])
    np.testing.assert_array_equal(np.asarray(sp_J(X)), [1, 0, 1])
    np.testing.assert_allclose(np.asarray(sp_V(X)), [1.0, 2.0, 3.0])
    colptr, rowind, vals = sp_CCS(X)
    np.testing.assert_array_equal(colptr, [0, 1, 3])
    np.testing.assert_array_equal(rowind, [2, 0, 1])
    np.testing.assert_allclose(vals, [2.0, 1.0, 3.0])
