"""Banded/tridiagonal LAPACK subset (ops/banded.py) — golden tests vs
scipy (reference: /root/reference/src/C/lapack.c:7341-7400 gb*/gt*/
pb*/pt*/tbtrs)."""

import numpy as np
import pytest
import scipy.linalg as sla

import jax.numpy as jnp
from cvxopt_tpu.ops import banded


def _spd_band(n, kd, seed=0):
    rng = np.random.default_rng(seed)
    AB = np.zeros((kd + 1, n))
    AB[0] = rng.uniform(2.0 + kd, 3.0 + kd, n)
    for j in range(1, kd + 1):
        AB[j, :n - j] = rng.uniform(-1, 1, n - j)
    return AB


def test_pbtrf_pbtrs_vs_scipy():
    for (n, kd) in [(12, 1), (20, 3), (33, 5)]:
        AB = _spd_band(n, kd, seed=n)
        B = np.random.default_rng(1).standard_normal((n, 2))
        LB = banded.pbtrf(jnp.asarray(AB))
        x = banded.pbtrs(LB, jnp.asarray(B))
        xs = sla.solveh_banded(AB, B, lower=True)
        np.testing.assert_allclose(np.asarray(x), xs, atol=1e-9)
        # factor matches scipy's cholesky_banded
        cb = sla.cholesky_banded(AB, lower=True)
        np.testing.assert_allclose(np.asarray(LB), cb, atol=1e-9)


def test_pbtrf_non_pd_nan():
    AB = _spd_band(10, 2, seed=3)
    AB[0, 5] = -1.0
    LB = banded.pbtrf(jnp.asarray(AB))
    assert np.isnan(np.asarray(LB)).any()


def test_pt_tridiag_vs_scipy():
    n = 25
    rng = np.random.default_rng(2)
    d = rng.uniform(2, 3, n)
    e = rng.uniform(-1, 1, n - 1)
    B = rng.standard_normal((n, 3))
    df, ef = banded.pttrf(jnp.asarray(d), jnp.asarray(e))
    x = banded.pttrs(df, ef, jnp.asarray(B))
    A = np.diag(d) + np.diag(e, -1) + np.diag(e, 1)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, B),
                               atol=1e-9)


def test_gtsv_vs_dense_with_pivoting():
    n = 30
    rng = np.random.default_rng(4)
    # make rows where pivoting matters: small diagonal entries
    d = rng.standard_normal(n) * 0.01
    dl = rng.standard_normal(n - 1) + 2.0
    du = rng.standard_normal(n - 1) + 2.0
    B = rng.standard_normal((n, 2))
    A = np.diag(d) + np.diag(dl, -1) + np.diag(du, 1)
    x = banded.gtsv(jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
                    jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, B),
                               atol=1e-8)
    # transpose solve via gttrf/gttrs
    fac = banded.gttrf(jnp.asarray(dl), jnp.asarray(d),
                       jnp.asarray(du))
    xt = banded.gttrs(fac, jnp.asarray(B), trans="T")
    np.testing.assert_allclose(np.asarray(xt), np.linalg.solve(A.T, B),
                               atol=1e-8)


def test_tbtrs():
    n, kd = 15, 3
    rng = np.random.default_rng(5)
    AB = np.zeros((kd + 1, n))
    AB[0] = rng.uniform(1, 2, n)
    for j in range(1, kd + 1):
        AB[j, :n - j] = rng.uniform(-1, 1, n - j)
    L = np.zeros((n, n))
    for j in range(kd + 1):
        L += np.diag(AB[j, :n - j], -j)
    b = rng.standard_normal(n)
    x = banded.tbtrs(jnp.asarray(AB), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x),
                               sla.solve_triangular(L, b, lower=True),
                               atol=1e-9)
    xt = banded.tbtrs(jnp.asarray(AB), jnp.asarray(b), trans="T")
    np.testing.assert_allclose(
        np.asarray(xt), sla.solve_triangular(L.T, b, lower=False),
        atol=1e-9)


def test_gbsv_vs_scipy():
    n, kl, ku = 18, 2, 1
    rng = np.random.default_rng(6)
    AB = rng.standard_normal((kl + ku + 1, n))
    AB[ku] += 4.0   # diagonal dominance
    B = rng.standard_normal(n)
    _, x = banded.gbsv(jnp.asarray(AB), kl, ku, jnp.asarray(B))
    xs = sla.solve_banded((kl, ku), AB, B)
    np.testing.assert_allclose(np.asarray(x), xs, atol=1e-9)


def test_exported_from_lapack():
    from cvxopt_tpu.ops import lapack
    for name in ("pbtrf", "pttrf", "gtsv", "tbtrs", "gbsv"):
        assert hasattr(lapack, name)


def test_pbtrf_blocked_matches_dense():
    """Block-panel banded Cholesky (the TPU path: n/cb dense panels
    instead of n scalar scan steps) vs dense solve."""
    import jax.numpy as jnp
    from cvxopt_tpu.ops import banded
    rng = np.random.default_rng(0)
    for n, kd, cb in ((50, 3, 8), (100, 5, 16), (37, 4, 8)):
        A = np.zeros((n, n))
        for j in range(kd + 1):
            d = rng.standard_normal(n - j) * 0.3
            A += np.diag(d, -j) + (np.diag(d, j) if j else 0)
        A += np.eye(n) * (kd + 2.0)
        AB = np.stack([np.pad(np.diagonal(A, -j), (0, j))
                       for j in range(kd + 1)])
        fac = banded.pbtrf_blocked(jnp.asarray(AB), cb=cb)
        b = rng.standard_normal(n)
        x = banded.pbtrs_blocked(fac, jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   atol=1e-10)
        B = rng.standard_normal((n, 3))
        X = banded.pbtrs_blocked(fac, jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(X),
                                   np.linalg.solve(A, B), atol=1e-10)


def test_sparse_lp_blocked_method():
    """lp_sparse through the blocked banded kktsolver gives the same
    answer as the scan path."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from cvxopt_tpu.ops.sparse_kkt import kkt_chol2_banded, _as_ops
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu import solvers
    n = 300
    rng = np.random.default_rng(1)
    c = rng.standard_normal(n) * 0.1
    rows, cols, vals, h = [], [], [], []
    r = 0
    for i in range(n):
        rows += [r, r + 1]
        cols += [i, i]
        vals += [-1.0, 1.0]
        h += [0.0, 1.0]
        r += 2
    for i in range(n - 1):
        rows += [r, r, r + 1, r + 1]
        cols += [i, i + 1, i, i + 1]
        vals += [1.0, -1.0, -1.0, 1.0]
        h += [0.5, 0.5]
        r += 2
    G = sp.coo_matrix((vals, (rows, cols)), shape=(r, n)).tocsr()
    Gop = _as_ops(G, jnp.float64)
    outs = []
    for method in ("scan", "blocked"):
        kkt = kkt_chol2_banded(G, ConeDims(l=r), method=method)
        sol = solvers.conelp(jnp.asarray(c), Gop,
                             jnp.asarray(np.asarray(h)),
                             dims=ConeDims(l=r), kktsolver=kkt,
                             options={"maxiters": 30})
        assert sol["status"] == "optimal"
        outs.append(np.asarray(sol["x"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_gbtrf_scan_matches_dense():
    """Scan-based pivoted banded LU vs dense solve (reference gbtrf/
    gbtrs, lapack.c)."""
    import jax.numpy as jnp
    from cvxopt_tpu.ops import banded
    rng = np.random.default_rng(0)
    for n, kl, ku in ((40, 2, 3), (100, 1, 1), (60, 4, 0), (50, 0, 2)):
        A = np.zeros((n, n))
        for d in range(-kl, ku + 1):
            A += np.diag(rng.standard_normal(n - abs(d)), d)
        A += np.diag(3.0 + rng.uniform(0, 1, n))   # keep kappa sane
        AB = np.zeros((kl + ku + 1, n))
        for jc in range(n):
            for i in range(max(0, jc - ku), min(n, jc + kl + 1)):
                AB[ku + i - jc, jc] = A[i, jc]
        b = rng.standard_normal(n)
        fac = banded.gbtrf_scan(jnp.asarray(AB), kl, ku)
        x = banded.gbtrs_scan(fac, jnp.asarray(b), kl, ku)
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(A, b), atol=1e-9)
        B = rng.standard_normal((n, 4))
        X = banded.gbtrs_scan(fac, jnp.asarray(B), kl, ku)
        np.testing.assert_allclose(np.asarray(X),
                                   np.linalg.solve(A, B), atol=1e-9)


def test_umfpack_banded_no_densify():
    """The umfpack API factors a large banded unsymmetric system
    through the scan LU (RCM + gbtrf_scan) — never densifying
    (reference umfpack.c:121-461)."""
    import scipy.sparse as sp
    from cvxopt_tpu.ops import spsolve
    n = 20_000                      # dense would be 3.2 GB
    rng = np.random.default_rng(0)
    main = 4.0 + rng.uniform(0, 1, n)
    lo = rng.standard_normal(n - 1)
    up = rng.standard_normal(n - 1)
    A = sp.diags([lo, main, up], [-1, 0, 1]).tocsr()
    b = rng.standard_normal(n)
    symb = spsolve.lu_symbolic(A)
    assert symb.banded
    F = spsolve.lu_numeric(A, symb)
    x = spsolve.lu_solve(F, b)
    assert np.abs(A @ np.asarray(x) - b).max() < 1e-9
    xt = spsolve.lu_solve(F, b, trans="T")
    assert np.abs(A.T @ np.asarray(xt) - b).max() < 1e-9
    # a scrambled pattern is recovered by the RCM analysis
    p = rng.permutation(n)
    As = A[p][:, p]
    x2 = spsolve.lu_linsolve(As, b)
    assert np.abs(As @ np.asarray(x2) - b).max() < 1e-9


def test_tbtrs_upper_storage():
    """tbtrs uplo='U' (LAPACK upper band storage): solve U x = b and
    U' x = b via the lower-storage transpose mapping."""
    rng = np.random.default_rng(1)
    n, kd = 30, 3
    A = rng.standard_normal((n, n))
    U = np.triu(A) - np.triu(A, kd + 1)
    np.fill_diagonal(U, np.sign(np.diag(U)) * (3 + np.abs(np.diag(U))))
    AB = np.zeros((kd + 1, n))
    for d in range(kd + 1):
        AB[kd - d, d:] = np.diagonal(U, d)
    b = rng.standard_normal(n)
    x = np.asarray(banded.tbtrs(jnp.asarray(AB), jnp.asarray(b),
                                uplo="U"))
    assert np.max(np.abs(U @ x - b)) < 1e-12
    xt = np.asarray(banded.tbtrs(jnp.asarray(AB), jnp.asarray(b),
                                 uplo="U", trans="T"))
    assert np.max(np.abs(U.T @ xt - b)) < 1e-12
    B = rng.standard_normal((n, 2))
    X = np.asarray(banded.tbtrs(jnp.asarray(AB), jnp.asarray(B),
                                uplo="U"))
    assert np.max(np.abs(U @ X - B)) < 1e-12
