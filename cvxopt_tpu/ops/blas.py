"""cvxopt.blas equivalents (reference: src/C/blas.c:3840-3873).

Pure functional versions of the 34 BLAS wrappers.  Differences from the
reference, by design (arrays, not mutable matrix objects):

  - every function RETURNS its result instead of writing into an
    output argument;
  - the strided-view kwargs (offset*/ld*/inc*/n/m) are gone — slice
    the arrays instead;
  - everything broadcasts over leading batch axes and runs under
    jit/vmap; matmuls land on the MXU.

Banded (gb/sb/hb/tb) routines take LAPACK band storage `(kl, ku)` /
`k` and a band matrix of shape (kl+ku+1, n) etc., matching the
reference's calling convention at the data level.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "swap", "scal", "copy", "axpy", "dot", "dotu", "nrm2", "asum",
    "iamax", "gemv", "gbmv", "symv", "hemv", "sbmv", "hbmv", "trmv",
    "tbmv", "trsv", "tbsv", "ger", "geru", "syr", "her", "syr2",
    "her2", "gemm", "symm", "hemm", "syrk", "herk", "syr2k", "her2k",
    "trmm", "trsm",
]


# ---- level 1 ---------------------------------------------------------

def swap(x, y):
    return y, x


def scal(alpha, x):
    return alpha * x


def copy(x):
    return jnp.asarray(x)


def axpy(x, y, alpha=1.0):
    return alpha * x + y


def dot(x, y):
    return jnp.sum(jnp.conjugate(x) * y, axis=-1)


def dotu(x, y):
    return jnp.sum(x * y, axis=-1)


def nrm2(x):
    return jnp.linalg.norm(x, axis=-1)


def asum(x):
    return jnp.sum(jnp.abs(x.real) + jnp.abs(x.imag), axis=-1) \
        if jnp.iscomplexobj(x) else jnp.sum(jnp.abs(x), axis=-1)


def iamax(x):
    a = jnp.abs(x.real) + jnp.abs(x.imag) if jnp.iscomplexobj(x) \
        else jnp.abs(x)
    return jnp.argmax(a, axis=-1)


# ---- band storage helpers -------------------------------------------

def _band_to_dense(Ab, n, kl, ku):
    """LAPACK general band storage (kl+ku+1, n) -> dense (n, n)."""
    Ab = jnp.asarray(Ab)
    out = jnp.zeros((n, n), dtype=Ab.dtype)
    for d in range(-kl, ku + 1):
        row = ku - d
        diag = jnp.diagonal(jnp.zeros((n, n)), offset=d).shape[0]
        vals = Ab[row, max(d, 0):max(d, 0) + diag]
        out = out + jnp.diag(vals, k=d)
    return out


def _symband_to_dense(Ab, n, k, uplo="L"):
    Ab = jnp.asarray(Ab)
    out = jnp.zeros((n, n), dtype=Ab.dtype)
    for d in range(k + 1):
        if uplo == "L":
            vals = Ab[d, :n - d]
        else:
            vals = Ab[k - d, d:]
        out = out + jnp.diag(vals, k=-d)
        if d:
            out = out + jnp.diag(jnp.conjugate(vals)
                                 if jnp.iscomplexobj(Ab) else vals, k=d)
    return out


# ---- level 2 ---------------------------------------------------------

def _apply_trans(A, trans):
    if trans == "N":
        return A
    if trans == "T":
        return jnp.swapaxes(A, -1, -2)
    return jnp.conjugate(jnp.swapaxes(A, -1, -2))


def gemv(A, x, y=None, trans="N", alpha=1.0, beta=0.0):
    r = alpha * jnp.einsum("...ij,...j->...i", _apply_trans(A, trans), x)
    return r if y is None else r + beta * y


def gbmv(Ab, m, n, kl, ku, x, y=None, trans="N", alpha=1.0, beta=0.0):
    A = _band_to_dense(Ab, max(m, n), kl, ku)[:m, :n]
    return gemv(A, x, y, trans=trans, alpha=alpha, beta=beta)


def symv(A, x, y=None, alpha=1.0, beta=0.0, uplo="L"):
    A = _sym_from(A, uplo)
    return gemv(A, x, y, alpha=alpha, beta=beta)


def hemv(A, x, y=None, alpha=1.0, beta=0.0, uplo="L"):
    A = _herm_from(A, uplo)
    return gemv(A, x, y, alpha=alpha, beta=beta)


def sbmv(Ab, n, k, x, y=None, alpha=1.0, beta=0.0, uplo="L"):
    A = _symband_to_dense(Ab, n, k, uplo)
    return gemv(A, x, y, alpha=alpha, beta=beta)


hbmv = sbmv


def _sym_from(A, uplo="L"):
    if uplo == "L":
        L = jnp.tril(A)
        return L + jnp.swapaxes(jnp.tril(A, -1), -1, -2)
    U = jnp.triu(A)
    return U + jnp.swapaxes(jnp.triu(A, 1), -1, -2)


def _herm_from(A, uplo="L"):
    if uplo == "L":
        L = jnp.tril(A)
        return L + jnp.conjugate(jnp.swapaxes(jnp.tril(A, -1), -1, -2))
    U = jnp.triu(A)
    return U + jnp.conjugate(jnp.swapaxes(jnp.triu(A, 1), -1, -2))


def _tri_from(A, uplo="L", diag="N"):
    T = jnp.tril(A) if uplo == "L" else jnp.triu(A)
    if diag == "U":
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        T = T - jnp.diagonal(T, axis1=-2, axis2=-1)[..., None] * 0
        idx = jnp.arange(A.shape[-1])
        T = T.at[..., idx, idx].set(1.0)
    return T


def trmv(A, x, uplo="L", trans="N", diag="N"):
    T = _tri_from(A, uplo, diag)
    return gemv(T, x, trans=trans)


def tbmv(Ab, n, k, x, uplo="L", trans="N", diag="N"):
    A = _symband_to_dense(Ab, n, k, uplo)
    T = _tri_from(A, uplo, diag)
    return gemv(T, x, trans=trans)


def trsv(A, b, uplo="L", trans="N", diag="N"):
    import jax.scipy.linalg as jsl
    T = _tri_from(A, uplo, diag)
    T = _apply_trans(T, trans)
    lower = (uplo == "L") != (trans != "N")
    return jsl.solve_triangular(T, b, lower=lower)


def tbsv(Ab, n, k, b, uplo="L", trans="N", diag="N"):
    A = _symband_to_dense(Ab, n, k, uplo)
    return trsv(A, b, uplo=uplo, trans=trans, diag=diag)


def ger(x, y, A=None, alpha=1.0):
    r = alpha * jnp.einsum("...i,...j->...ij", x, jnp.conjugate(y))
    return r if A is None else A + r


def geru(x, y, A=None, alpha=1.0):
    r = alpha * jnp.einsum("...i,...j->...ij", x, y)
    return r if A is None else A + r


def syr(x, A=None, alpha=1.0):
    r = alpha * jnp.einsum("...i,...j->...ij", x, x)
    return r if A is None else A + r


def her(x, A=None, alpha=1.0):
    r = alpha * jnp.einsum("...i,...j->...ij", x, jnp.conjugate(x))
    return r if A is None else A + r


def syr2(x, y, A=None, alpha=1.0):
    r = alpha * (jnp.einsum("...i,...j->...ij", x, y)
                 + jnp.einsum("...i,...j->...ij", y, x))
    return r if A is None else A + r


def her2(x, y, A=None, alpha=1.0):
    xy = jnp.einsum("...i,...j->...ij", x, jnp.conjugate(y))
    r = alpha * xy + jnp.conjugate(alpha) * \
        jnp.conjugate(jnp.swapaxes(xy, -1, -2))
    return r if A is None else A + r


# ---- level 3 ---------------------------------------------------------

def gemm(A, B, C=None, transA="N", transB="N", alpha=1.0, beta=0.0):
    r = alpha * (_apply_trans(A, transA) @ _apply_trans(B, transB))
    return r if C is None else r + beta * C


def symm(A, B, C=None, side="L", uplo="L", alpha=1.0, beta=0.0):
    S = _sym_from(A, uplo)
    r = alpha * (S @ B if side == "L" else B @ S)
    return r if C is None else r + beta * C


def hemm(A, B, C=None, side="L", uplo="L", alpha=1.0, beta=0.0):
    S = _herm_from(A, uplo)
    r = alpha * (S @ B if side == "L" else B @ S)
    return r if C is None else r + beta * C


def syrk(A, C=None, trans="N", alpha=1.0, beta=0.0):
    At = A if trans == "N" else jnp.swapaxes(A, -1, -2)
    r = alpha * (At @ jnp.swapaxes(At, -1, -2))
    return r if C is None else r + beta * C


def herk(A, C=None, trans="N", alpha=1.0, beta=0.0):
    At = A if trans == "N" else jnp.conjugate(jnp.swapaxes(A, -1, -2))
    r = alpha * (At @ jnp.conjugate(jnp.swapaxes(At, -1, -2)))
    return r if C is None else r + beta * C


def syr2k(A, B, C=None, trans="N", alpha=1.0, beta=0.0):
    if trans == "N":
        r = A @ jnp.swapaxes(B, -1, -2) + B @ jnp.swapaxes(A, -1, -2)
    else:
        r = jnp.swapaxes(A, -1, -2) @ B + jnp.swapaxes(B, -1, -2) @ A
    r = alpha * r
    return r if C is None else r + beta * C


def her2k(A, B, C=None, trans="N", alpha=1.0, beta=0.0):
    Ah = jnp.conjugate(jnp.swapaxes(A, -1, -2))
    Bh = jnp.conjugate(jnp.swapaxes(B, -1, -2))
    if trans == "N":
        r = alpha * (A @ Bh) + jnp.conjugate(alpha) * (B @ Ah)
    else:
        r = alpha * (Ah @ B) + jnp.conjugate(alpha) * (Bh @ A)
    return r if C is None else r + beta * C


def trmm(A, B, side="L", uplo="L", transA="N", diag="N", alpha=1.0):
    T = _apply_trans(_tri_from(A, uplo, diag), transA)
    return alpha * (T @ B if side == "L" else B @ T)


def trsm(A, B, side="L", uplo="L", transA="N", diag="N", alpha=1.0):
    import jax.scipy.linalg as jsl
    T = _tri_from(A, uplo, diag)
    lower = (uplo == "L")
    if side == "L":
        return jsl.solve_triangular(_apply_trans(T, transA), alpha * B,
                                    lower=lower != (transA != "N"))
    # B T^{-1} = (T^{-T} B')'
    X = jsl.solve_triangular(
        _apply_trans(T, "T" if transA == "N" else "N"),
        alpha * jnp.swapaxes(B, -1, -2),
        lower=lower != (transA == "N"))
    return jnp.swapaxes(X, -1, -2)
