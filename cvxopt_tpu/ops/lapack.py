"""cvxopt.lapack equivalents (reference: src/C/lapack.c:7341-7400).

Pure functional versions of the LAPACK wrappers the reference exposes,
restricted to the subset with XLA support plus the routines the solver
layer actually uses (SURVEY.md §2.2).  All functions are batched over
leading axes and jit/vmap-compatible.

Notable mappings:
  potrf/potrs/posv/potri  -> Cholesky (jnp.linalg.cholesky + solves)
  getrf/getrs/gesv/getri  -> LU (jax.scipy.linalg)   [f32/f64-on-CPU;
                             f64 LU is not implemented on TPU]
  sytrf/sytrs/sysv        -> symmetric-indefinite solves via LU of the
                             full matrix (Bunch-Kaufman is not exposed
                             by XLA; same solution, ~2x flops)
  geqrf/orgqr/ormqr/gels  -> QR (jnp.linalg.qr / lstsq)
  syev/syevd/syevr/syevx  -> jnp.linalg.eigh
  gesvd/gesdd             -> jnp.linalg.svd
  trtrs/trtri             -> triangular solves / inverse
  gees/gges               -> not implemented on TPU (no XLA Schur);
                             raises NotImplementedError
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from cvxopt_tpu.ops.banded import (          # noqa: F401
    pbtrf, pbtrs, pbsv, pttrf, pttrs, ptsv,
    gtsv, gttrf, gttrs, tbtrs, gbsv, gbtrf, gbtrs,
)

__all__ = [
    "potrf", "potrs", "posv", "potri", "getrf", "getrs", "gesv",
    "getri", "sytrf", "sytrs", "sysv", "trtrs", "trtri", "geqrf",
    "orgqr", "ormqr", "gels", "gelqf", "geqp3", "larfg", "larfx",
    "syev", "syevd",
    "syevr", "syevx", "heev", "heevd", "sygv", "hegv", "gesvd",
    "gesdd", "gees", "gges", "lacpy",
    # banded / tridiagonal (ops/banded.py)
    "pbtrf", "pbtrs", "pbsv", "pttrf", "pttrs", "ptsv",
    "gtsv", "gttrf", "gttrs", "tbtrs", "gbsv", "gbtrf", "gbtrs",
]


# ---- Cholesky --------------------------------------------------------

def potrf(A, uplo="L"):
    """Cholesky factor (lower).  NaN rows signal a non-PD matrix (the
    jit-compatible analogue of the reference's ArithmeticError)."""
    L = jnp.linalg.cholesky(_symmetrize(A, uplo))
    return L


def potrs(L, B, uplo="L"):
    y = jsl.solve_triangular(L, B, lower=True)
    return jsl.solve_triangular(jnp.conjugate(
        jnp.swapaxes(L, -1, -2)), y, lower=False)


def posv(A, B, uplo="L"):
    L = potrf(A, uplo)
    return L, potrs(L, B)


def potri(L, uplo="L"):
    n = L.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype),
                           L.shape[:-2] + (n, n))
    return potrs(L, eye)


def _symmetrize(A, uplo="L"):
    if uplo == "L":
        T = jnp.tril(A)
        return T + jnp.conjugate(jnp.swapaxes(jnp.tril(A, -1), -1, -2))
    T = jnp.triu(A)
    return T + jnp.conjugate(jnp.swapaxes(jnp.triu(A, 1), -1, -2))


# ---- LU --------------------------------------------------------------

def getrf(A):
    return jsl.lu_factor(A)


def getrs(lu_piv, B, trans="N"):
    t = {"N": 0, "T": 1, "C": 2}[trans]
    return jsl.lu_solve(lu_piv, B, trans=t)


def gesv(A, B):
    lu_piv = getrf(A)
    return lu_piv, getrs(lu_piv, B)


def getri(lu_piv):
    n = lu_piv[0].shape[-1]
    eye = jnp.eye(n, dtype=lu_piv[0].dtype)
    return getrs(lu_piv, eye)


# ---- symmetric indefinite -------------------------------------------

def sytrf(A, uplo="L"):
    """Factorization handle for sytrs; implemented as LU of the
    symmetrized matrix (XLA exposes no Bunch-Kaufman)."""
    return getrf(_symmetrize(A, uplo))


def sytrs(f, B, uplo="L"):
    return getrs(f, B)


def sysv(A, B, uplo="L"):
    f = sytrf(A, uplo)
    return f, sytrs(f, B)


hetrf, hetrs, hesv = sytrf, sytrs, sysv


# ---- triangular ------------------------------------------------------

def trtrs(A, B, uplo="L", trans="N", diag="N"):
    T = jnp.tril(A) if uplo == "L" else jnp.triu(A)
    if diag == "U":
        idx = jnp.arange(A.shape[-1])
        T = T.at[..., idx, idx].set(1.0)
    if trans != "N":
        T = jnp.conjugate(jnp.swapaxes(T, -1, -2)) if trans == "C" \
            else jnp.swapaxes(T, -1, -2)
        return jsl.solve_triangular(T, B, lower=(uplo != "L"))
    return jsl.solve_triangular(T, B, lower=(uplo == "L"))


def trtri(A, uplo="L", diag="N"):
    n = A.shape[-1]
    return trtrs(A, jnp.eye(n, dtype=A.dtype), uplo=uplo, diag=diag)


# ---- QR / least squares ---------------------------------------------

def geqrf(A):
    """Returns (Q, R) — XLA's QR replaces the Householder (tau, v)
    encoding; use with `ormqr`/`orgqr` below."""
    return jnp.linalg.qr(A, mode="reduced")


def orgqr(qr_):
    Q, _ = qr_
    return Q

def ormqr(qr_, C, trans="N", side="L"):
    Q, _ = qr_
    Qt = jnp.conjugate(jnp.swapaxes(Q, -1, -2))
    if side == "L":
        return (Q if trans == "N" else Qt) @ C
    return C @ (Q if trans == "N" else Qt)


def gels(A, B):
    x, *_ = jnp.linalg.lstsq(A, B)
    return x


def gelqf(A):
    Q, R = jnp.linalg.qr(jnp.swapaxes(A, -1, -2), mode="reduced")
    return jnp.swapaxes(R, -1, -2), jnp.swapaxes(Q, -1, -2)


def larfg(x):
    """Generate a Householder reflector (reference larfg, lapack.c):
    given x, return (v, tau, beta) with (I - tau v v') x = beta e_1
    and v[0] = 1."""
    alpha = x[0]
    xnorm = jnp.linalg.norm(x[1:])
    beta = -jnp.sign(jnp.where(alpha == 0, 1.0, alpha)) * jnp.sqrt(
        alpha * alpha + xnorm * xnorm)
    safe = jnp.abs(beta) > 0
    tau = jnp.where(safe, (beta - alpha) / jnp.where(safe, beta, 1.0),
                    0.0)
    scale = jnp.where(safe, alpha - beta, 1.0)
    v = jnp.concatenate([jnp.ones((1,), x.dtype), x[1:] / scale])
    return v, tau, jnp.where(safe, beta, alpha)


def larfx(v, tau, C, side="L"):
    """Apply the reflector I - tau v v' (reference larfx)."""
    if side == "L":
        return C - tau * jnp.outer(v, v @ C)
    return C - tau * jnp.outer(C @ v, v)


def geqp3(A):
    """Column-pivoted QR (reference geqp3, lapack.c): returns
    (Q, R, jpvt) with A[:, jpvt] = Q @ R and R's diagonal
    non-increasing in magnitude.  XLA exposes no pivoted QR; this is a
    fori_loop of Householder steps with trailing-norm pivot selection
    — O(m n^2), fine for the moderate sizes geqp3 is used at."""
    import jax
    m, n = A.shape
    k = min(m, n)
    Q0 = jnp.eye(m, dtype=A.dtype)
    piv0 = jnp.arange(n)
    rowi = jnp.arange(m)

    def body(j, carry):
        Aj, Qj, piv = carry
        # pivot: trailing column with the largest remaining norm
        colmask = jnp.arange(n) >= j
        norms = jnp.linalg.norm(
            jnp.where(rowi[:, None] >= j, Aj, 0.0), axis=0)
        p = jnp.argmax(jnp.where(colmask, norms, -1.0))
        # swap columns j <-> p (and the permutation record)
        cj, cp = Aj[:, j], Aj[:, p]
        Aj = Aj.at[:, j].set(cp).at[:, p].set(cj)
        pj, pp = piv[j], piv[p]
        piv = piv.at[j].set(pp).at[p].set(pj)
        # Householder on rows j: of column j (masked full-width)
        x = jnp.where(rowi >= j, Aj[:, j], 0.0)
        alpha = Aj[j, j]
        xnorm = jnp.linalg.norm(jnp.where(rowi > j, x, 0.0))
        beta = -jnp.sign(jnp.where(alpha == 0, 1.0, alpha)) * \
            jnp.sqrt(alpha * alpha + xnorm * xnorm)
        safe = jnp.abs(beta) > 1e-300
        tau = jnp.where(safe, (beta - alpha)
                        / jnp.where(safe, beta, 1.0), 0.0)
        scale = jnp.where(safe & (jnp.abs(alpha - beta) > 0),
                          alpha - beta, 1.0)
        v = jnp.where(rowi > j, x / scale, 0.0).at[j].set(1.0)
        v = jnp.where(rowi >= j, v, 0.0)
        Aj = Aj - tau * jnp.outer(v, v @ Aj)
        Qj = Qj - tau * jnp.outer(Qj @ v, v)
        return Aj, Qj, piv

    R, Q, piv = jax.lax.fori_loop(0, k, body, (A, Q0, piv0))
    return Q, jnp.triu(R), piv


# ---- eigenvalues / SVD ----------------------------------------------

def syev(A, uplo="L", jobz="V"):
    S = _symmetrize(A, uplo)
    if jobz == "V":
        w, V = jnp.linalg.eigh(S)
        return w, V
    return jnp.linalg.eigvalsh(S)


syevd = syev
heev = syev
heevd = syev


def syevr(A, uplo="L", jobz="V", il=None, iu=None):
    """Subset selection (range='I') returns the il..iu-th eigenvalues
    (1-based, ascending) after a full eigh — XLA has no subset
    algorithm; slicing keeps the reference semantics."""
    out = syev(A, uplo, jobz)
    if il is None:
        return out
    sl = slice(il - 1, iu)
    if jobz == "V":
        w, V = out
        return w[..., sl], V[..., :, sl]
    return out[..., sl]


syevx = syevr


def sygv(A, B, uplo="L"):
    """Generalized symmetric-definite eigenproblem A v = w B v via
    Cholesky reduction (itype=1)."""
    L = jnp.linalg.cholesky(_symmetrize(B, uplo))
    Li = trtri(L)
    C = Li @ _symmetrize(A, uplo) @ jnp.conjugate(
        jnp.swapaxes(Li, -1, -2))
    w, Y = jnp.linalg.eigh(C)
    V = jnp.conjugate(jnp.swapaxes(Li, -1, -2)) @ Y
    return w, V


hegv = sygv


def gesvd(A, jobu="S", jobvt="S"):
    full = (jobu == "A") or (jobvt == "A")
    return jnp.linalg.svd(A, full_matrices=full)


gesdd = gesvd


def gees(A, *args, **kwargs):
    raise NotImplementedError("Schur decomposition (gees) has no XLA "
                              "lowering on TPU")


def gges(A, *args, **kwargs):
    raise NotImplementedError("generalized Schur (gges) has no XLA "
                              "lowering on TPU")


def lacpy(A, uplo=None):
    if uplo == "L":
        return jnp.tril(A)
    if uplo == "U":
        return jnp.triu(A)
    return jnp.asarray(A)
