"""Mixed sparse/dense base-level linear algebra (reference base.c
axpy/gemv/gemm/syrk with sparse operands, sparse.c sp_d* kernels)."""

import numpy as np
import jax.numpy as jnp

import cvxopt_tpu as cvx
from cvxopt_tpu import base


def _sp(seed, m, n, d=0.3):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((m, n)) * (rng.random((m, n)) < d)
    I, J = np.nonzero(M)
    return M, cvx.spmatrix(M[I, J], I, J, size=(m, n))


def test_axpy_gemv_mixed():
    rng = np.random.default_rng(0)
    M, S = _sp(1, 6, 4)
    D = rng.standard_normal((6, 4))
    np.testing.assert_allclose(np.asarray(base.axpy(S, D, alpha=2.0)),
                               D + 2.0 * M, atol=1e-12)
    x = rng.standard_normal(4)
    y = rng.standard_normal(6)
    np.testing.assert_allclose(np.asarray(base.gemv(S, x)), M @ x,
                               atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(base.gemv(S, y, trans="T", alpha=0.5)),
        0.5 * M.T @ y, atol=1e-12)


def test_gemm_syrk_mixed():
    rng = np.random.default_rng(2)
    M, S = _sp(3, 5, 7)
    D = rng.standard_normal((7, 3))
    np.testing.assert_allclose(np.asarray(base.gemm(S, D)), M @ D,
                               atol=1e-12)
    N, T = _sp(4, 5, 7)
    out = base.gemm(S, T, transB="T")
    out = out.todense() if hasattr(out, "todense") else out
    np.testing.assert_allclose(np.asarray(out), M @ N.T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(base.syrk(S)), M @ M.T,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(base.syrk(S, trans="T")),
                               M.T @ M, atol=1e-12)


def test_symv():
    rng = np.random.default_rng(5)
    A = rng.standard_normal((5, 5))
    x = rng.standard_normal(5)
    S = np.tril(A) + np.tril(A, -1).T
    np.testing.assert_allclose(np.asarray(base.symv(A, x)), S @ x,
                               atol=1e-12)


def test_sparse_block_assembly_no_densify():
    """base.sparse assembles mixed sparse/dense blocks in triplet form
    (base.c:979) — a large sparse block matrix keeps O(nnz) storage."""
    import scipy.sparse as sp
    from cvxopt_tpu import base
    n = 5000
    D = sp.diags(np.arange(1.0, n + 1))          # 5k x 5k, nnz=5k
    Icol = base.spmatrix(np.ones(n), np.arange(n), np.zeros(n),
                         size=(n, 1))
    M = base.sparse([[D], [Icol]])               # (5000, 5001)
    assert M.shape == (n, n + 1)
    assert M.nse == 2 * n                        # no densification
    got = np.asarray(M.todense()[:3, :3])
    assert np.allclose(got, np.diag([1.0, 2.0, 3.0]))


def test_matrix_file_io_roundtrip():
    """matrix/spmatrix tofile/fromfile (dense.c:1106, sparse.c tofile):
    column-major raw-byte round-trips incl. complex."""
    import io
    from cvxopt_tpu import base
    M = np.arange(6.0).reshape(2, 3)
    buf = io.BytesIO()
    base.matrix_tofile(M, buf)
    buf.seek(0)
    np.testing.assert_allclose(
        np.asarray(base.matrix_fromfile(buf, (2, 3))), M)
    Mz = M + 1j * M
    buf = io.BytesIO()
    base.matrix_tofile(Mz, buf)
    buf.seek(0)
    np.testing.assert_allclose(
        np.asarray(base.matrix_fromfile(buf, (2, 3), tc="z")), Mz)
    S = base.spmatrix([1.0, 2.0, 3.5], [0, 2, 1], [1, 0, 2],
                      size=(3, 3))
    buf = io.BytesIO()
    base.spmatrix_tofile(S, buf)
    buf.seek(0)
    S2 = base.spmatrix_fromfile(buf, 3, (3, 3))
    np.testing.assert_allclose(np.asarray(S2.todense()),
                               np.asarray(S.todense()))
