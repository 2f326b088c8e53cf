"""cholmod.solve sys-code surface: the full CHOLMOD 0..8 table
(reference /root/reference/src/C/cholmod.c:460-479) round-tripped on
every factorization backend (dense, RCM+banded, blocksparse tile-map).

For the LL' factor P A P' = L L' the table is (D = I):
    0: A X = B      1: L L' X = B    2: L X = B   3: L' X = B
    4: L X = B      5: L' X = B      6: X = B
    7: P' X = B  (X = P B)           8: P X = B  (X = P' B)
"""

import numpy as np
import scipy.sparse as sp
import pytest

from cvxopt_tpu import cholmod, umfpack, amd


def _banded_spd(n=60, kd=3, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((n, n))
    for d in range(kd + 1):
        v = rng.standard_normal(n - d) * (0.3 if d else 1.0)
        A += np.diag(v, -d) + (np.diag(v, d) if d else 0)
    A = A @ A.T + n * np.eye(n)
    # random symmetric permutation hides the band from the natural order
    p = rng.permutation(n)
    return sp.csr_matrix(A[np.ix_(p, p)])


def _arrow_spd(n=256, head=8, seed=1):
    """Sparse arrow: diagonal + dense head rows/cols — RCM cannot
    band it, but the block fill is tiny, so the tile-map path wins."""
    rng = np.random.default_rng(seed)
    A = sp.lil_matrix((n, n))
    A.setdiag(rng.uniform(1.0, 2.0, n) + n)
    C = 0.3 * rng.standard_normal((head, n - head))
    A[:head, head:] = C
    A[head:, :head] = C.T
    return sp.csr_matrix(A)


def _dense_L_perm(F, n):
    """Reconstruct dense L (permuted coordinates) from any backend."""
    from cvxopt_tpu.ops import banded as bnd
    L = np.asarray(F.L) if not F.banded else None
    if F.banded:
        return np.asarray(bnd.band_to_dense(F.L)) * np.tri(n)
    if F.bsp is not None:
        from cvxopt_tpu.ops import blocksparse as bsp
        return np.asarray(bsp.factor_to_dense(F.bsp, F.L))[:n, :n]
    return L * np.tri(n)


def _check_all_sys(Asp, F):
    n = Asp.shape[0]
    rng = np.random.default_rng(42)
    b = rng.standard_normal(n)
    A = np.asarray(Asp.todense())
    perm = F.perm if F.perm is not None else (
        F.bsp.perm if F.bsp is not None else np.arange(n))
    perm = np.asarray(perm)
    inv = np.argsort(perm)

    x0 = np.asarray(cholmod.solve(F, b, sys=0))
    np.testing.assert_allclose(A @ x0, b, rtol=0, atol=1e-8 * n)

    try:
        L = _dense_L_perm(F, n)
        have_L = True
    except Exception:
        have_L = False

    x1 = np.asarray(cholmod.solve(F, b, sys=1))
    if have_L:
        np.testing.assert_allclose(L @ (L.T @ x1), b, atol=1e-8 * n)
    # consistency: sys1 == P (A^{-1} (P' b))
    np.testing.assert_allclose(x1, (np.linalg.solve(A, b[inv]))[perm],
                               atol=1e-8 * n)

    if have_L and F.bsp is None:
        x2 = np.asarray(cholmod.solve(F, b, sys=2))
        np.testing.assert_allclose(L @ x2, b, atol=1e-8 * n)
        x3 = np.asarray(cholmod.solve(F, b, sys=3))
        np.testing.assert_allclose(L.T @ x3, b, atol=1e-8 * n)
        x4 = np.asarray(cholmod.solve(F, b, sys=4))
        np.testing.assert_allclose(x4, x2, atol=1e-10 * n)
        x5 = np.asarray(cholmod.solve(F, b, sys=5))
        np.testing.assert_allclose(x5, x3, atol=1e-10 * n)
        # composition: sys4 then sys5 == sys1
        x45 = np.asarray(cholmod.solve(
            F, np.asarray(cholmod.solve(F, b, sys=4)), sys=5))
        np.testing.assert_allclose(x45, x1, atol=1e-8 * n)

    x6 = np.asarray(cholmod.solve(F, b, sys=6))
    np.testing.assert_allclose(x6, b)
    x7 = np.asarray(cholmod.solve(F, b, sys=7))
    np.testing.assert_allclose(x7, b[perm])
    x8 = np.asarray(cholmod.solve(F, b, sys=8))
    np.testing.assert_allclose(x8, b[inv])
    # P' P = I round trip
    np.testing.assert_allclose(
        np.asarray(cholmod.solve(
            F, np.asarray(cholmod.solve(F, b, sys=7)), sys=8)), b)


def test_sys_codes_banded_backend():
    Asp = _banded_spd()
    symb = cholmod.symbolic(Asp)
    assert symb.banded, "RCM should re-band this matrix"
    F = cholmod.numeric(Asp, symb)
    _check_all_sys(Asp, F)


def test_sys_codes_dense_backend():
    n = 40
    rng = np.random.default_rng(3)
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    symb = cholmod.symbolic(A)
    F = cholmod.numeric(A, symb)
    _check_all_sys(sp.csr_matrix(A), F)


def test_sys_codes_blocksparse_backend():
    Asp = _arrow_spd()
    symb = cholmod.symbolic(Asp)
    F = cholmod.numeric(Asp, symb)
    if F.bsp is None:
        pytest.skip("pattern did not take the blocksparse path")
    _check_all_sys(Asp, F)


def test_sys_out_of_range():
    n = 8
    A = np.eye(n) * 2
    F = cholmod.numeric(A, cholmod.symbolic(A))
    with pytest.raises(ValueError):
        cholmod.solve(F, np.ones(n), sys=9)


def test_namespace_modules():
    """cvxopt.cholmod/umfpack/amd import-name parity."""
    n = 30
    rng = np.random.default_rng(0)
    A = np.diag(rng.uniform(1, 2, n) + n)
    A[1, 0] = A[0, 1] = 0.5
    Asp = sp.csr_matrix(A)
    x = np.asarray(cholmod.linsolve(Asp, np.ones(n)))
    np.testing.assert_allclose(A @ x, np.ones(n), atol=1e-10)
    # umfpack on an unsymmetric matrix
    B = A.copy()
    B[2, 0] = 0.3
    Bsp = sp.csr_matrix(B)
    xb = np.asarray(umfpack.linsolve(Bsp, np.ones(n)))
    np.testing.assert_allclose(B @ xb, np.ones(n), atol=1e-10)
    Ft = umfpack.numeric(Bsp, umfpack.symbolic(Bsp))
    xt = np.asarray(umfpack.solve(Ft, np.ones(n), trans="T"))
    np.testing.assert_allclose(B.T @ xt, np.ones(n), atol=1e-10)
    p = amd.order(Asp)
    assert sorted(np.asarray(p).tolist()) == list(range(n))


def test_spsolve_dense_return_contract():
    """The documented divergence from the reference: cholmod.spsolve
    returns a DENSE solution for sparse B (the reference returns
    sparse, /root/reference/src/C/cholmod.c:583).  Assert the contract
    explicitly so the difference is a tested decision, not drift."""
    A = _banded_spd(n=24, kd=2, seed=5)
    F = cholmod.numeric(A, cholmod.symbolic(A))
    B = sp.csr_matrix(np.eye(24)[:, :3])
    X = cholmod.spsolve(F, B)
    X = np.asarray(X)
    assert not sp.issparse(X)             # dense by design
    np.testing.assert_allclose(A @ X, B.toarray(), atol=1e-8)
