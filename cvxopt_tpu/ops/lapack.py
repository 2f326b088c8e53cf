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
    "orgqr", "ormqr", "sytri", "hetri", "ungqr", "unmqr", "ormlq",
    "unmlq", "gels", "gelqf", "geqp3", "larfg", "larfx",
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


def sytri(f, uplo="L"):
    """Inverse from a sytrf handle (reference lapack.c:7341 sytri).
    The handle is the LU of the symmetrized matrix, so the inverse is
    getri of it; the result is symmetric up to roundoff."""
    return getri(f)


hetri = sytri


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


# complex QR multipliers: XLA's qr is dtype-generic, so the unitary
# ('un*') entry points are the same routines as the orthogonal ones
# (reference keeps separate C paths, lapack.c:7341-7400)
ungqr, unmqr = orgqr, ormqr


def ormlq(lq_, C, trans="N", side="L"):
    """Multiply by the Q of a gelqf handle (L, Q) — reference ormlq
    (lapack.c:7341-7400).  Q here is stored explicitly (k x n)."""
    _, Q = lq_
    Qt = jnp.conjugate(jnp.swapaxes(Q, -1, -2))
    if side == "L":
        return (Q if trans == "N" else Qt) @ C
    return C @ (Q if trans == "N" else Qt)


unmlq = ormlq


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


def gees(A, select=None):
    """Schur factorization A = V S V' (reference gees,
    lapack.c:6697): returns (S, w, V[, sdim]) — the (real or complex)
    Schur form, the eigenvalues, the Schur vectors, and, when
    ``select`` is given, the count of selected eigenvalues (ordered
    first, as in the reference's select semantics).

    The QR iteration is inherently sequential with data-dependent
    deflation — host-shaped work with no XLA lowering on any backend —
    so this runs as a host callback (scipy wraps the same LAPACK
    dhsqr/zhsqr the reference calls); jit/TPU callers pay one
    host round-trip, exactly like the reference's CPU LAPACK call."""
    import numpy as np
    import scipy.linalg as sla
    import jax

    A = jnp.asarray(A)
    cplx = jnp.iscomplexobj(A)
    out_dtype = A.dtype
    w_dtype = jnp.complex128 if out_dtype in (jnp.float64,
                                              jnp.complex128) \
        else jnp.complex64

    def _schur(a):
        a = np.asarray(a)
        output = "complex" if np.iscomplexobj(a) else "real"
        if select is None:
            S, V = sla.schur(a, output=output)
            sdim = np.int32(0)
        else:
            if output == "real":
                sel = lambda wr, wi: bool(select(complex(wr, wi))
                                          or select(complex(wr, -wi)))
            else:
                sel = lambda s: bool(select(complex(s)))
            S, V, sdim = sla.schur(a, output=output, sort=sel)
            sdim = np.int32(sdim)
        w = sla.eigvals(S) if output == "real" else np.diag(S)
        return (S.astype(a.dtype), w.astype(np.dtype(w_dtype)),
                V.astype(a.dtype), sdim)

    n = A.shape[-1]
    shapes = (jax.ShapeDtypeStruct(A.shape, out_dtype),
              jax.ShapeDtypeStruct(A.shape[:-2] + (n,), w_dtype),
              jax.ShapeDtypeStruct(A.shape, out_dtype),
              jax.ShapeDtypeStruct(A.shape[:-2], jnp.int32))
    S, w, V, sdim = jax.pure_callback(_schur, shapes, A,
                                      vmap_method="sequential")
    if select is None:
        return S, w, V
    return S, w, V, sdim


def gges(A, B, select=None):
    """Generalized Schur factorization (A, B) = (V S W', V T W')
    (reference gges, lapack.c:7341): returns (S, T, a, b, Vl, Vr
    [, sdim]) with generalized eigenvalues a/b.  Host callback — see
    `gees` for rationale."""
    import numpy as np
    import scipy.linalg as sla
    import jax

    A = jnp.asarray(A)
    B = jnp.asarray(B)
    out_dtype = jnp.result_type(A.dtype, B.dtype)
    w_dtype = jnp.complex128 if out_dtype in (jnp.float64,
                                              jnp.complex128) \
        else jnp.complex64

    def _qz(a, b):
        a, b = np.asarray(a), np.asarray(b)
        output = "complex" if (np.iscomplexobj(a)
                               or np.iscomplexobj(b)) else "real"
        if select is None:
            S, T, al, be, Q, Z = sla.ordqz(a, b, output=output)
            sdim = np.int32(0)
        else:
            def sel(alpha, beta):
                with np.errstate(divide="ignore", invalid="ignore"):
                    return np.asarray(
                        [bool(select(complex(x) / complex(y)))
                         if y != 0 else False
                         for x, y in zip(np.atleast_1d(alpha),
                                         np.atleast_1d(beta))])
            S, T, al, be, Q, Z = sla.ordqz(a, b, sort=sel,
                                           output=output)
            sdim = np.int32(sel(al, be).sum())
        return (S.astype(np.dtype(out_dtype)),
                T.astype(np.dtype(out_dtype)),
                al.astype(np.dtype(w_dtype)),
                be.astype(np.dtype(w_dtype)),
                Q.astype(np.dtype(out_dtype)),
                Z.astype(np.dtype(out_dtype)), sdim)

    n = A.shape[-1]
    mat = jax.ShapeDtypeStruct(A.shape, out_dtype)
    vec = jax.ShapeDtypeStruct(A.shape[:-2] + (n,), w_dtype)
    shapes = (mat, mat, vec, vec, mat, mat,
              jax.ShapeDtypeStruct(A.shape[:-2], jnp.int32))
    S, T, al, be, Q, Z, sdim = jax.pure_callback(
        _qz, shapes, A, B, vmap_method="sequential")
    if select is None:
        return S, T, al, be, Q, Z
    return S, T, al, be, Q, Z, sdim


def lacpy(A, uplo=None):
    if uplo == "L":
        return jnp.tril(A)
    if uplo == "U":
        return jnp.triu(A)
    return jnp.asarray(A)
