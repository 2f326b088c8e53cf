"""Complex ('z' typecode) substrate support — mirrors the reference's
complex construction/arithmetic semantics
(/root/reference/tests/test_basic.py, src/C/dense.c:514-603,
1404-1419)."""

import numpy as np
import jax.numpy as jnp

import cvxopt_tpu as cvx


def test_matrix_z_nested_preserved():
    A = cvx.matrix([[1 + 2j, 3 - 1j], [0.5j, 2.0]], tc="z")
    assert A.dtype == jnp.complex128
    # nested lists are columns
    np.testing.assert_allclose(np.asarray(A),
                               np.array([[1 + 2j, 0.5j],
                                         [3 - 1j, 2.0]]))


def test_matrix_z_scalar_and_flat():
    A = cvx.matrix(1 + 1j, size=(2, 2))
    assert np.asarray(A).dtype == np.complex128
    np.testing.assert_allclose(np.asarray(A), np.full((2, 2), 1 + 1j))
    B = cvx.matrix([1j, 2j, 3j, 4j], size=(2, 2))
    np.testing.assert_allclose(np.asarray(B),
                               np.array([[1j, 3j], [2j, 4j]]))  # F-order


def test_matrix_d_to_z_promotion():
    A = cvx.matrix([1.0, 2.0], tc="z")
    assert A.dtype == jnp.complex128
    np.testing.assert_allclose(np.asarray(A).ravel(), [1.0, 2.0])


def test_spmatrix_z():
    S = cvx.spmatrix([1 + 1j, 2 - 1j], [0, 1], [1, 0], size=(2, 2),
                     tc="z")
    D = np.asarray(S.todense())
    assert D.dtype == np.complex128
    np.testing.assert_allclose(D, np.array([[0, 1 + 1j],
                                            [2 - 1j, 0]]))


def test_ctrans_real_imag():
    A = cvx.matrix([[1 + 2j], [3 - 4j]], tc="z")   # (1, 2)? columns
    Ad = np.asarray(A)
    np.testing.assert_allclose(np.asarray(cvx.ctrans(A)),
                               Ad.conj().T)
    np.testing.assert_allclose(np.asarray(cvx.trans(A)), Ad.T)
    np.testing.assert_allclose(np.asarray(cvx.real(A)), Ad.real)
    np.testing.assert_allclose(np.asarray(cvx.imag(A)), Ad.imag)


def test_complex_arithmetic_and_mul():
    A = cvx.matrix([[1 + 1j, 2], [3, 4 - 2j]], tc="z")
    B = cvx.mul(A, A)
    np.testing.assert_allclose(np.asarray(B),
                               np.asarray(A) * np.asarray(A))
    C = A @ cvx.ctrans(A)
    np.testing.assert_allclose(np.asarray(C),
                               np.asarray(A) @ np.asarray(A).conj().T)


def test_blas_complex_paths():
    from cvxopt_tpu.ops import blas
    rng = np.random.default_rng(0)
    n = 5
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = A + A.conj().T
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(blas.dotu(jnp.asarray(x), jnp.asarray(y))),
        np.sum(x * y), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(blas.dot(jnp.asarray(x), jnp.asarray(y))),
        np.sum(np.conj(x) * y), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(blas.hemv(jnp.asarray(H), jnp.asarray(x))),
        H @ x, atol=1e-12)
    K = np.asarray(blas.herk(jnp.asarray(A)))
    np.testing.assert_allclose(np.tril(K), np.tril(A @ A.conj().T),
                               atol=1e-12)


def test_lapack_complex_heev():
    from cvxopt_tpu.ops import lapack
    rng = np.random.default_rng(1)
    n = 6
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = A + A.conj().T
    w, V = lapack.heev(jnp.asarray(H))
    np.testing.assert_allclose(
        np.asarray(V) @ np.diag(np.asarray(w)) @
        np.asarray(V).conj().T, H, atol=1e-8)
