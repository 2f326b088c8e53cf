"""Tests for the numeric kernel layer (ops.blas / ops.lapack /
ops.spsolve) and utilities (fft, rng, printing, base constructors) —
the cvxopt.blas/lapack/cholmod/umfpack/amd/fftw/gsl/printing API
surface (SURVEY.md §2.2-2.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cvxopt_tpu.ops import blas, lapack, spsolve
from cvxopt_tpu.utils import fft, rng, printing
from cvxopt_tpu import base


RNG = np.random.default_rng(0)


def randpsd(n, seed=0):
    r = np.random.default_rng(seed)
    F = r.standard_normal((n, n))
    return F @ F.T + n * np.eye(n)


# ---- blas ------------------------------------------------------------

def test_blas_level1():
    x = jnp.asarray(RNG.standard_normal(7))
    y = jnp.asarray(RNG.standard_normal(7))
    np.testing.assert_allclose(blas.dot(x, y), np.dot(x, y), rtol=1e-12)
    np.testing.assert_allclose(blas.nrm2(x), np.linalg.norm(x),
                               rtol=1e-12)
    np.testing.assert_allclose(blas.asum(x), np.abs(x).sum(),
                               rtol=1e-12)
    assert int(blas.iamax(x)) == int(np.argmax(np.abs(x)))
    np.testing.assert_allclose(blas.axpy(x, y, 2.0), 2 * x + y,
                               rtol=1e-12)


def test_blas_iamax_reference_case():
    """Mirrors tests/test_blas.py of the reference."""
    x = jnp.asarray([1.0, -2.0, 3.0, -4.0])
    assert int(blas.iamax(x)) == 3


def test_blas_level2():
    A = jnp.asarray(RNG.standard_normal((5, 4)))
    x4 = jnp.asarray(RNG.standard_normal(4))
    x5 = jnp.asarray(RNG.standard_normal(5))
    np.testing.assert_allclose(blas.gemv(A, x4), A @ x4, rtol=1e-12)
    np.testing.assert_allclose(blas.gemv(A, x5, trans="T"), A.T @ x5,
                               rtol=1e-12)
    S = jnp.asarray(randpsd(4))
    np.testing.assert_allclose(blas.symv(jnp.tril(S), x4), S @ x4,
                               rtol=1e-12)
    T = jnp.tril(jnp.asarray(RNG.standard_normal((4, 4)))) + 4 * \
        jnp.eye(4)
    np.testing.assert_allclose(blas.trmv(T, x4), T @ x4, rtol=1e-12)
    np.testing.assert_allclose(blas.trsv(T, T @ x4), x4, rtol=1e-9)
    np.testing.assert_allclose(blas.ger(x5, x4), np.outer(x5, x4),
                               rtol=1e-12)


def test_blas_level3():
    A = jnp.asarray(RNG.standard_normal((4, 3)))
    B = jnp.asarray(RNG.standard_normal((3, 5)))
    np.testing.assert_allclose(blas.gemm(A, B), A @ B, rtol=1e-12)
    np.testing.assert_allclose(blas.syrk(A), A @ A.T, rtol=1e-12)
    np.testing.assert_allclose(blas.syrk(A, trans="T"), A.T @ A,
                               rtol=1e-12)
    C = jnp.asarray(RNG.standard_normal((4, 3)))
    np.testing.assert_allclose(blas.syr2k(A, C),
                               A @ C.T + C @ A.T, rtol=1e-12)
    T = jnp.tril(jnp.asarray(RNG.standard_normal((4, 4)))) + \
        4 * jnp.eye(4)
    X = jnp.asarray(RNG.standard_normal((4, 5)))
    np.testing.assert_allclose(blas.trmm(T, X), T @ X, rtol=1e-12)
    np.testing.assert_allclose(blas.trsm(T, T @ X), X, rtol=1e-9)
    np.testing.assert_allclose(
        blas.trsm(T, X.T @ T, side="R"), X.T, rtol=1e-9)


# ---- lapack ----------------------------------------------------------

def test_lapack_cholesky():
    A = jnp.asarray(randpsd(6))
    B = jnp.asarray(RNG.standard_normal((6, 2)))
    L = lapack.potrf(A)
    np.testing.assert_allclose(L @ L.T, A, rtol=1e-9)
    X = lapack.potrs(L, B)
    np.testing.assert_allclose(A @ X, B, rtol=1e-8)
    Ainv = lapack.potri(L)
    np.testing.assert_allclose(A @ Ainv, np.eye(6), atol=1e-8)


def test_lapack_lu_sytrf():
    A = jnp.asarray(RNG.standard_normal((5, 5)))
    b = jnp.asarray(RNG.standard_normal(5))
    f, x = lapack.gesv(A, b)
    np.testing.assert_allclose(A @ x, b, rtol=1e-8, atol=1e-10)
    S = jnp.asarray(randpsd(5)) - 10 * jnp.eye(5)   # indefinite
    f = lapack.sytrf(jnp.tril(S))
    x = lapack.sytrs(f, b)
    np.testing.assert_allclose(S @ x, b, rtol=1e-8, atol=1e-10)


def test_lapack_qr_eig_svd():
    A = jnp.asarray(RNG.standard_normal((6, 4)))
    Q, R = lapack.geqrf(A)
    np.testing.assert_allclose(Q @ R, A, rtol=1e-9, atol=1e-10)
    x = lapack.gels(A, jnp.asarray(RNG.standard_normal(6)))
    assert x.shape == (4,)
    S = jnp.asarray(randpsd(5))
    w, V = lapack.syev(jnp.tril(S))
    np.testing.assert_allclose(V @ jnp.diag(w) @ V.T, S, rtol=1e-8)
    w2 = lapack.syevr(jnp.tril(S), jobz="N", il=1, iu=1)
    np.testing.assert_allclose(w2, w[:1], rtol=1e-10)
    U, sv, Vt = lapack.gesvd(A)
    np.testing.assert_allclose(U @ jnp.diag(sv) @ Vt, A, rtol=1e-8,
                               atol=1e-10)
    # generalized symmetric-definite
    B = jnp.asarray(randpsd(5, seed=7))
    w3, V3 = lapack.sygv(jnp.tril(S), jnp.tril(B))
    for i in range(5):
        np.testing.assert_allclose(S @ V3[:, i], w3[i] * (B @ V3[:, i]),
                                   rtol=1e-6, atol=1e-8)


def test_lapack_gees_identity():
    # gees is now implemented (host callback); trivial sanity here,
    # full coverage in test_gees_real_and_complex below
    S, w, V = lapack.gees(jnp.eye(3))
    assert np.allclose(np.asarray(w), 1.0)


# ---- spsolve (cholmod/umfpack/amd equivalents) -----------------------

def test_cholmod_like():
    import scipy.sparse as sp
    A = randpsd(8)
    A[np.abs(A) < 0.5] = 0.0
    A = A + 8 * np.eye(8)
    As = sp.csc_matrix(A)
    b = RNG.standard_normal(8)
    F = spsolve.numeric(jnp.asarray(A), spsolve.symbolic(A))
    x = spsolve.solve(F, jnp.asarray(b))
    np.testing.assert_allclose(A @ np.asarray(x), b, rtol=1e-8)
    x2 = spsolve.linsolve(As, jnp.asarray(b))
    np.testing.assert_allclose(A @ np.asarray(x2), b, rtol=1e-8)
    # sys=4/5 triangular subsolves compose to the full solve
    y = spsolve.solve(F, jnp.asarray(b), sys=4)
    x3 = spsolve.solve(F, y, sys=5)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x),
                               rtol=1e-8)


def test_umfpack_like():
    A = RNG.standard_normal((6, 6)) + 6 * np.eye(6)
    b = RNG.standard_normal(6)
    x = spsolve.lu_linsolve(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(A @ np.asarray(x), b, rtol=1e-8)
    F = spsolve.lu_numeric(jnp.asarray(A), spsolve.lu_symbolic(A))
    xt = spsolve.lu_solve(F, jnp.asarray(b), trans="T")
    np.testing.assert_allclose(A.T @ np.asarray(xt), b, rtol=1e-8)


def test_amd_order():
    A = np.eye(6)
    A[0, 5] = A[5, 0] = 1.0
    A[1, 2] = A[2, 1] = 1.0
    p = spsolve.amd_order(A)
    assert sorted(p.tolist()) == list(range(6))


# ---- fft -------------------------------------------------------------

def test_fft_roundtrips():
    x = jnp.asarray(RNG.standard_normal((8, 3)))
    np.testing.assert_allclose(np.asarray(fft.idft(fft.dft(x))).real,
                               np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fft.idctn(fft.dctn(x))),
                               np.asarray(x), atol=1e-8)
    y = fft.dct(x)
    import scipy.fft as sfft
    np.testing.assert_allclose(np.asarray(y),
                               sfft.dct(np.asarray(x), axis=0),
                               rtol=1e-8)
    z = fft.dst(x)
    np.testing.assert_allclose(np.asarray(z),
                               sfft.dst(np.asarray(x), type=1, axis=0),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fft.idst(fft.dst(x))),
                               np.asarray(x), atol=1e-8)


# ---- rng (gsl equivalent; mirrors tests/test_gsl.py) -----------------

def test_rng_seeding():
    rng.setseed(42)
    a = np.asarray(rng.normal(5, 2))
    u = np.asarray(rng.uniform(4, 1, a=2.0, b=3.0))
    rng.setseed(42)
    a2 = np.asarray(rng.normal(5, 2))
    np.testing.assert_allclose(a, a2)
    assert rng.getseed() == 42
    assert u.shape == (4,)
    assert (u >= 2.0).all() and (u < 3.0).all()


# ---- printing / base -------------------------------------------------

def test_printing():
    X = np.arange(6.0).reshape(2, 3)
    s = printing.matrix_str_default(X)
    assert "0.00e" in s.replace(" ", "")
    assert printing.matrix_repr(X) == "<2x3 matrix, tc='d'>"
    from cvxopt_tpu.base import spmatrix
    S = spmatrix([1.0, 2.0], [0, 1], [1, 0], size=(2, 2))
    t = printing.spmatrix_str_triplet(S)
    assert "(0,1)" in t


def test_base_constructors():
    from cvxopt_tpu.base import matrix, spmatrix, sparse, spdiag, mul, \
        div, emax
    # nested lists are columns (cvxopt semantics)
    A = matrix([[2., 1., -1., 0.], [1., 2., 0., -1.]])
    assert A.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(A)[:, 0], [2., 1., -1., 0.])
    B = matrix(3.0, (2, 2))
    np.testing.assert_allclose(np.asarray(B), 3.0 * np.ones((2, 2)))
    C = matrix(np.arange(6.0), (2, 3))      # column-major fill
    assert float(C[1, 0]) == 1.0 and float(C[0, 1]) == 2.0
    S = spmatrix([1., 2., 3.], [0, 1, 2], [0, 1, 2])
    np.testing.assert_allclose(np.asarray(S.todense()), np.diag(
        [1., 2., 3.]))
    D = spdiag([1., 2.])
    np.testing.assert_allclose(np.asarray(D.todense()),
                               np.diag([1., 2.]))
    Bl = sparse([[np.eye(2), np.zeros((1, 2))],
                 [np.zeros((2, 1)), np.ones((1, 1))]])
    assert Bl.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(mul([1., 2.], [3., 4.])),
                               [3., 8.])
    np.testing.assert_allclose(np.asarray(div([4.], [2.])), [2.])
    np.testing.assert_allclose(np.asarray(emax([1., 5.], [2., 3.])),
                               [2., 5.])


def test_native_mindeg_matches_python():
    """The native C minimum-degree ordering (cvxopt_tpu/native) agrees
    in semantics with the Python fallback: both produce valid
    permutations with comparable Cholesky fill."""
    import scipy.sparse as sp
    from cvxopt_tpu import native

    rng2 = np.random.default_rng(3)
    n = 40
    A = sp.random(n, n, density=0.08, random_state=7)
    A = ((A + A.T) != 0).tocsr()
    A = A + sp.eye(n)

    perm_c = native.mindeg_order(A.indptr.astype(np.int32),
                                 A.indices.astype(np.int32), n)
    if perm_c is None:
        pytest.skip("no C toolchain available")
    assert sorted(perm_c.tolist()) == list(range(n))

    # fill comparison: ordered factor should not be denser than natural
    D = np.asarray(A.todense(), dtype=float) + n * np.eye(n)

    def fill(perm):
        M = D[np.ix_(perm, perm)]
        L = np.linalg.cholesky(M)
        return (np.abs(L) > 1e-12).sum()

    natural = fill(np.arange(n))
    ordered = fill(np.asarray(perm_c))
    assert ordered <= natural * 1.1


def test_base_complex_elementwise():
    """Complex ('z' typecode) elementwise support in base
    (reference tests/test_basic.py complex semantics)."""
    z = base.matrix(np.array([1 + 2j, -1j]), (2, 1), tc="z")
    assert np.iscomplexobj(np.asarray(z))
    np.testing.assert_allclose(np.asarray(base.exp(z)),
                               np.exp(np.asarray(z)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(base.mul(z, z)),
                               np.asarray(z) ** 2, rtol=1e-12)
    # complex blas
    x = jnp.asarray(np.array([1 + 1j, 2 - 1j]))
    y = jnp.asarray(np.array([1j, 1.0]))
    np.testing.assert_allclose(complex(blas.dotu(x, y)),
                               np.sum(np.asarray(x) * np.asarray(y)),
                               rtol=1e-12)
    np.testing.assert_allclose(complex(blas.dot(x, y)),
                               np.vdot(np.asarray(x), np.asarray(y)),
                               rtol=1e-12)


def test_geqp3_pivoted_qr():
    """Column-pivoted QR (reference geqp3, lapack.c) vs scipy."""
    import numpy as np
    import scipy.linalg as sla
    import jax.numpy as jnp
    from cvxopt_tpu.ops import lapack

    rng = np.random.default_rng(0)
    for m, n in ((8, 6), (6, 8), (7, 7)):
        A = rng.standard_normal((m, n))
        # make columns have very different scales so pivoting matters
        A = A * np.logspace(0, 4, n)
        Q, R, piv = lapack.geqp3(jnp.asarray(A))
        Qn, Rn, pn = np.asarray(Q), np.asarray(R), np.asarray(piv)
        np.testing.assert_allclose(Qn @ Rn, A[:, pn], atol=1e-8)
        np.testing.assert_allclose(Qn.T @ Qn, np.eye(m), atol=1e-9)
        # R diagonal non-increasing in magnitude (the pivoting contract)
        d = np.abs(np.diag(Rn))
        assert np.all(d[:-1] >= d[1:] - 1e-9), d
        # matches scipy's pivot choice on well-separated scales
        _, _, ps = sla.qr(A, pivoting=True)
        np.testing.assert_array_equal(pn[:3], ps[:3])


def test_larfg_larfx():
    import numpy as np
    import jax.numpy as jnp
    from cvxopt_tpu.ops import lapack

    rng = np.random.default_rng(1)
    x = rng.standard_normal(6)
    v, tau, beta = lapack.larfg(jnp.asarray(x))
    y = np.asarray(larfx_apply := lapack.larfx(v, tau,
                                               jnp.asarray(x)[:, None]))
    np.testing.assert_allclose(y[0, 0], float(beta), atol=1e-10)
    np.testing.assert_allclose(y[1:, 0], 0.0, atol=1e-10)


def test_gees_real_and_complex():
    """Schur factorization (reference gees, lapack.c:6697) — host
    callback; real + complex + select ordering + jit."""
    from cvxopt_tpu.ops import lapack
    rng = np.random.default_rng(0)
    A = rng.standard_normal((8, 8))
    S, w, V = lapack.gees(jnp.asarray(A))
    S, w, V = np.asarray(S), np.asarray(w), np.asarray(V)
    assert np.abs(V @ S @ V.T - A).max() < 1e-12
    assert np.abs(V.T @ V - np.eye(8)).max() < 1e-12
    wr = np.sort_complex(np.linalg.eigvals(A))
    assert np.abs(np.sort_complex(w) - wr).max() < 1e-10
    _, _, _, sdim = lapack.gees(jnp.asarray(A),
                                select=lambda s: s.real < 0)
    assert int(sdim) == int((wr.real < 0).sum())
    Az = A + 1j * rng.standard_normal((8, 8))
    Sz, wz, Vz = lapack.gees(jnp.asarray(Az))
    Sz, Vz = np.asarray(Sz), np.asarray(Vz)
    assert np.abs(Vz @ Sz @ Vz.conj().T - Az).max() < 1e-12
    assert np.abs(np.tril(Sz, -1)).max() == 0.0
    import jax
    f = jax.jit(lambda a: lapack.gees(a)[1])
    got = np.sort_complex(np.asarray(f(jnp.asarray(A))))
    assert np.abs(got - wr).max() < 1e-10


def test_gges_generalized_schur():
    """Generalized Schur / QZ (reference gges, lapack.c:7341)."""
    from cvxopt_tpu.ops import lapack
    rng = np.random.default_rng(1)
    A = rng.standard_normal((6, 6))
    B = rng.standard_normal((6, 6)) + 4 * np.eye(6)
    S, T, al, be, Q, Z = lapack.gges(jnp.asarray(A), jnp.asarray(B))
    S, T, Q, Z = map(np.asarray, (S, T, Q, Z))
    assert np.abs(Q @ S @ Z.T - A).max() < 1e-12
    assert np.abs(Q @ T @ Z.T - B).max() < 1e-12
    gen = np.sort_complex(np.asarray(al) / np.asarray(be))
    ref = np.sort_complex(np.linalg.eigvals(np.linalg.solve(B, A)))
    assert np.abs(gen - ref).max() < 1e-10


def test_fft_all_dct_dst_types_vs_scipy():
    """Full FFTW type family (REDFT00/10/01/11, RODFT00/10/01/11 =
    DCT/DST types 1-4, reference fftw.c:1214-1225) against scipy.fft
    in the same unnormalized convention, incl. inverses and axis
    handling."""
    import scipy.fft as sfft
    rng_ = np.random.default_rng(0)
    x = rng_.standard_normal(17)
    X2 = rng_.standard_normal((9, 4))
    for t in (1, 2, 3, 4):
        np.testing.assert_allclose(
            np.asarray(fft.dct(x, type=t)), sfft.dct(x, type=t),
            atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(fft.dst(x, type=t)), sfft.dst(x, type=t),
            atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(fft.idct(x, type=t)),
            sfft.idct(x, type=t, norm=None), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(fft.idst(x, type=t)),
            sfft.idst(x, type=t, norm=None), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(fft.dst(X2, type=2, axis=1)),
        sfft.dst(X2, type=2, axis=1), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(fft.dct(X2, type=3, axis=1)),
        sfft.dct(X2, type=3, axis=1), atol=1e-10)


def test_lapack_long_tail_sytri_unmqr_ormlq():
    # sytri: symmetric-indefinite inverse from the sytrf handle
    # (reference lapack.c:7341)
    S = np.asarray(randpsd(5)) - 10 * np.eye(5)     # indefinite
    f = lapack.sytrf(jnp.tril(jnp.asarray(S)))
    Si = np.asarray(lapack.sytri(f))
    np.testing.assert_allclose(S @ Si, np.eye(5), atol=1e-9)
    # complex QR multipliers unmqr/ungqr (== ormqr/orgqr, dtype-generic)
    rng_ = np.random.default_rng(3)
    Az = jnp.asarray(rng_.standard_normal((6, 4)) +
                     1j * rng_.standard_normal((6, 4)))
    qr_ = lapack.geqrf(Az)
    Q = lapack.ungqr(qr_)
    np.testing.assert_allclose(np.asarray(Q.conj().T @ Q), np.eye(4),
                               atol=1e-12)
    C = jnp.asarray(rng_.standard_normal((6, 3)) +
                    1j * rng_.standard_normal((6, 3)))
    np.testing.assert_allclose(np.asarray(lapack.unmqr(qr_, C, trans="C")),
                               np.asarray(Q.conj().T @ C), atol=1e-12)
    # ormlq: multiply by the LQ factor's Q
    Ar = jnp.asarray(rng_.standard_normal((3, 5)))
    L, Qlq = lapack.gelqf(Ar)
    np.testing.assert_allclose(np.asarray(L @ Qlq), np.asarray(Ar),
                               atol=1e-12)
    Cr = jnp.asarray(rng_.standard_normal((2, 5)))
    np.testing.assert_allclose(
        np.asarray(lapack.ormlq((L, Qlq), Cr, trans="T", side="R")),
        np.asarray(Cr) @ np.asarray(Qlq).T, atol=1e-12)
