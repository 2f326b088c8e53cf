"""KKT factor-solve strategies for the conic IPM solvers.

TPU-native equivalents of the reference's five KKT strategies
(/root/reference/src/python/misc.py:1055-1698).  Each strategy is a
factory

    factor = kkt_xxx(G, dims, A, mnl=0, ...)
    solve  = factor(W [, H, Df])          # once per IPM iteration
    ux, uy, Wuz = solve(bx, by, bz)       # several times per iteration

solving the 3x3 system (misc.py:1069-1071)

    [ H    A'   GG'   ] [ ux ]   [ bx ]
    [ A    0    0     ] [ uy ] = [ by ]        GG = [Df; G]
    [ GG   0   -W'W   ] [ uz ]   [ bz ]

and returning (ux, uy, W*uz).  All functions are pure (no in-place
mutation) and jit/vmap-compatible; `dims` is static.

Strategies:
  kkt_lu    dense factorization of the full 3x3 with packed 's' rows —
            the universal fallback (reference kkt_ldl, misc.py:1055;
            LAPACK sytrf is replaced by LU with partial pivoting, which
            XLA provides batched on the MXU; supports `kktreg` static
            regularization, misc.py:1096-1098).
  kkt_chol  QR of A' to eliminate equalities + dense Cholesky of the
            reduced condensed system (reference kkt_chol, misc.py:1213)
            — the fast path, default when 'q'/'s' cones are present.
  kkt_chol2 normal-equations Cholesky of S = H + GG'W^{-1}W^{-T}GG plus
            a Schur complement for A (reference kkt_chol2, misc.py:1352,
            generalized from 'l'-only to all cones via dense math).

Singularity is reported through NaNs (Cholesky of a non-PD matrix
returns NaN rows in XLA); the solver loops detect non-finite iterates
and exit with status 'unknown' — the jit-compatible analogue of the
reference's ArithmeticError handling (coneprog.py:1078-1109).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from cvxopt_tpu.cones import ConeDims, pack, unpack, pack_matrix_cols
from cvxopt_tpu.scaling import scale, scale_rows

DEFAULT_SOLVERS = ("ldl", "ldl2", "qr", "chol", "chol2")


def _stack_gg(G, Df):
    """GG = [Df; G] (misc.py:1066)."""
    if Df is None:
        return G
    return jnp.concatenate([Df, G], axis=0)


def kkt_lu(G, dims: ConeDims, A, mnl: int = 0, kktreg: Optional[float] = None):
    """Dense factorization of the full 3x3 KKT system with packed cone
    rows (reference kkt_ldl, misc.py:1055-1125).

    Uses LU with partial pivoting (batched on TPU via XLA) instead of
    Bunch-Kaufman LDL; with optional static regularization ``kktreg``
    (+reg on the (1,1) block diagonal, -reg on the (2,2)/(3,3) blocks)
    the system is quasidefinite and the factorization is stable.
    """
    p, n = A.shape
    pdim = dims.cdim_packed
    ldK = n + p + pdim

    def factor(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        # Gs = W^{-T} GG, packed columns  (misc.py:1090-1094)
        Gs = scale_rows(GG, W, dims, trans="T", inverse="I")
        Gp = pack_matrix_cols(Gs, dims)                  # (pdim, n)
        K = jnp.zeros((ldK, ldK), dtype=G.dtype)
        if H is not None:
            K = K.at[:n, :n].set(H)
        K = K.at[n:n + p, :n].set(A)
        K = K.at[:n, n:n + p].set(A.T)
        K = K.at[n + p:, :n].set(Gp)
        K = K.at[:n, n + p:].set(Gp.T)
        diag = jnp.arange(n + p, ldK)
        K = K.at[diag, diag].set(-1.0)
        if kktreg is not None:
            d1 = jnp.arange(n)
            K = K.at[d1, d1].add(kktreg)
            d2 = jnp.arange(n, ldK)
            K = K.at[d2, d2].add(-kktreg)
        lu, piv = jsl.lu_factor(K)

        def solve(bx, by, bz):
            zs = scale(bz, W, dims, trans="T", inverse="I")
            u = jnp.concatenate([bx, by, pack(zs, dims)])
            u = jsl.lu_solve((lu, piv), u)
            return u[:n], u[n:n + p], unpack(u[n + p:], dims)

        return solve

    return factor


def kkt_chol(G, dims: ConeDims, A, mnl: int = 0):
    """QR of A' to eliminate equality constraints, then dense Cholesky
    of Q2'(H + GG'W^{-1}W^{-T}GG)Q2 (reference kkt_chol,
    misc.py:1213-1350).  The coneqp/cpl default for 'q'/'s' cones
    (coneprog.py:1805-1809)."""
    p, n = A.shape
    if p:
        Q, R = jnp.linalg.qr(A.T, mode="complete")       # A' = Q [R; 0]
        Q1, Q2 = Q[:, :p], Q[:, p:]
        R = R[:p, :]
    else:
        Q1 = jnp.zeros((n, 0), dtype=G.dtype)
        Q2 = jnp.eye(n, dtype=G.dtype)
        R = jnp.zeros((0, 0), dtype=G.dtype)

    def factor(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        Gs = scale_rows(GG, W, dims, trans="T", inverse="I")
        S = Gs.T @ Gs
        if H is not None:
            S = S + H
        K = Q2.T @ S @ Q2                                # (n-p, n-p)
        L = jnp.linalg.cholesky(K)

        def solve(bx, by, bz):
            # rhs r = bx + GG' W^{-1} W^{-T} bz
            zs = scale(bz, W, dims, trans="T", inverse="I")
            r = bx + Gs.T @ zs
            if p:
                # v1 from A ux = by:  R' v1 = by
                v1 = jsl.solve_triangular(R.T, by, lower=True)
                rhs2 = Q2.T @ (r - S @ (Q1 @ v1))
            else:
                v1 = by
                rhs2 = Q2.T @ r
            w = jsl.solve_triangular(L, rhs2, lower=True)
            v2 = jsl.solve_triangular(L.T, w, lower=False)
            ux = Q2 @ v2 + (Q1 @ v1 if p else 0.0)
            if p:
                uy = jsl.solve_triangular(
                    R, Q1.T @ (r - S @ ux), lower=False)
            else:
                uy = by
            # W uz = W^{-T} (GG ux - bz)
            Wuz = scale(GG @ ux - bz, W, dims, trans="T", inverse="I")
            return ux, uy, Wuz

        return solve

    return factor


def kkt_chol2(G, dims: ConeDims, A, mnl: int = 0,
              explicit_inverse: bool = False, factor_dtype=None):
    """Normal-equations Cholesky: S = H + GG'W^{-1}W^{-T}GG factored
    directly, equalities handled by a Schur complement K = A S^{-1} A'
    (reference kkt_chol2, misc.py:1352-1568, generalized from 'l'-only
    to all cones using dense batched math — the sparse CHOLMOD path has
    a block-sparse TPU analogue planned in ops/).

    With ``explicit_inverse=True`` ('chol2_inv'), the factor step forms
    S^{-1} explicitly (one triangular solve with n right-hand sides —
    MXU-efficient) so every per-iteration solve is a single batched
    matmul instead of two sequential 1-RHS triangular solves.  On TPU
    this is the fast path: batched 1-RHS triangular solves run at ~3
    GFLOP/s (inherently sequential), while the one-off n-RHS inverse
    and the matmul applications run near MXU rates.  Accuracy is
    comparable (error ~eps*kappa(S) either way); prefer the default for
    f64 CPU runs at 1e-7 tolerances."""
    p, n = A.shape

    def factor(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        Gs = scale_rows(GG, W, dims, trans="T", inverse="I")
        io_dtype = Gs.dtype
        if factor_dtype is not None:
            # mixed precision: factor in factor_dtype (f32 on TPU, where
            # f64 linear algebra is emulated); the solvers' f64
            # iterative refinement recovers full accuracy
            Gs = Gs.astype(factor_dtype)
        S = Gs.T @ Gs
        if H is not None:
            S = S + H.astype(S.dtype)
        Ls = jnp.linalg.cholesky(S)

        if explicit_inverse:
            Linv = jsl.solve_triangular(
                Ls, jnp.eye(n, dtype=Ls.dtype), lower=True)
            Sinv_mat = Linv.T @ Linv

            def Sinv(v):
                return Sinv_mat @ v
        else:
            def Sinv(v):
                w = jsl.solve_triangular(Ls, v, lower=True)
                return jsl.solve_triangular(Ls.T, w, lower=False)

        if p:
            SiAT = Sinv(A.astype(S.dtype).T)             # (n, p)
            K = A.astype(S.dtype) @ SiAT
            Lk = jnp.linalg.cholesky(K)

        def solve(bx, by, bz):
            zs = scale(bz, W, dims, trans="T", inverse="I")
            r = (bx + Gs.astype(io_dtype).T @ zs).astype(S.dtype)
            t = Sinv(r)
            if p:
                rhs = A.astype(S.dtype) @ t - by.astype(S.dtype)
                w = jsl.solve_triangular(Lk, rhs, lower=True)
                uy = jsl.solve_triangular(Lk.T, w, lower=False)
                # linearity: S^{-1}(r - A'uy) = t - (S^{-1}A') uy
                ux = t - SiAT @ uy
            else:
                uy = by.astype(S.dtype)
                ux = t
            ux = ux.astype(io_dtype)
            uy = uy.astype(io_dtype)
            Wuz = scale(GG @ ux - bz, W, dims, trans="T", inverse="I")
            return ux, uy, Wuz

        return solve

    return factor


def kkt_qr(G, dims: ConeDims, A, mnl: int = 0):
    """Zero-(1,1)-block KKT solve by two QR factorizations (reference
    kkt_qr, misc.py:1570-1697) — the conelp default for 'q'/'s' cones
    (coneprog.py:458-462): QR of A' eliminates the equalities, then a
    QR of W^{-T}G·Q2 (packed columns) solves the reduced system without
    forming normal equations (no condition-number squaring)."""
    p, n = A.shape
    if p:
        Q, RA = jnp.linalg.qr(A.T, mode="complete")      # A' = Q [R1; 0]
        Q1, Q2 = Q[:, :p], Q[:, p:]
        R1 = RA[:p, :]
    else:
        Q1 = jnp.zeros((n, 0), dtype=G.dtype)
        Q2 = jnp.eye(n, dtype=G.dtype)
        R1 = jnp.zeros((0, 0), dtype=G.dtype)

    def factor(W, H=None, Df=None):
        if H is not None:
            raise ValueError("kkt_qr requires a zero (1,1) block "
                             "(conelp only)")
        GG = _stack_gg(G, Df)
        Gs = pack_matrix_cols(
            scale_rows(GG, W, dims, trans="T", inverse="I"), dims)
        Gs1 = Gs @ Q1                                    # (pdim, p)
        Q3, R3 = jnp.linalg.qr(Gs @ Q2, mode="reduced")  # (pdim, n-p)

        def solve(bx, by, bz):
            bzp = pack(scale(bz, W, dims, trans="T", inverse="I"), dims)
            if p:
                v1 = jsl.solve_triangular(R1.T, by, lower=True)
                w = bzp - Gs1 @ v1
            else:
                v1 = by
                w = bzp
            vv2 = jsl.solve_triangular(R3.T, Q2.T @ bx, lower=True)
            u = Q3.T @ w + vv2
            Wz = Q3 @ u - w
            if p:
                uy = jsl.solve_triangular(
                    R1, Q1.T @ bx - Gs1.T @ Wz, lower=False)
            else:
                uy = by
            ux = Q2 @ jsl.solve_triangular(R3, u, lower=False)
            if p:
                ux = ux + Q1 @ v1
            return ux, uy, unpack(Wz, dims)

        return solve

    return factor


def get_kktsolver(name: str, G, dims: ConeDims, A, mnl: int = 0,
                  kktreg: Optional[float] = None, factor_dtype=None):
    """Map reference kktsolver names (coneprog.py:463) to strategies.

    'ldl'/'ldl2' map to the full-system dense factorization `kkt_lu`;
    'qr', 'chol', 'chol2' map to their direct equivalents.
    """
    if name in ("ldl", "ldl2"):
        return kkt_lu(G, dims, A, mnl=mnl, kktreg=kktreg)
    if name == "qr":
        return kkt_qr(G, dims, A, mnl=mnl)
    if name == "chol":
        return kkt_chol(G, dims, A, mnl=mnl)
    if name == "chol2":
        return kkt_chol2(G, dims, A, mnl=mnl,
                         factor_dtype=factor_dtype)
    if name == "chol2_inv":
        return kkt_chol2(G, dims, A, mnl=mnl, explicit_inverse=True,
                         factor_dtype=factor_dtype)
    raise ValueError(f"'{name}' is not a valid value for kktsolver")
