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

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from cvxopt_tpu.cones import ConeDims, pack, unpack, pack_matrix_cols
from cvxopt_tpu.scaling import scale, scale_rows, scale_w2inv
from cvxopt_tpu.ops.matvec import mv, mvt

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


def kkt_ldl2(G, dims: ConeDims, A, mnl: int = 0,
             kktreg: Optional[float] = None, factor_dtype=None):
    """Condensed 2x2 factorization (reference kkt_ldl2, misc.py:1128):
    eliminate uz from the 3x3 system to get

        [ H + GG' W^{-1} W^{-T} GG   A' ] [ ux ]   [ bx + GG'W^{-1}W^{-T}bz ]
        [ A                          0  ] [ uy ] = [ by                     ]

    of order n+p (much smaller than the full 3x3 when the cone
    dimension is large), factored with LU partial pivoting (XLA's
    batched replacement for Bunch-Kaufman LDL; see kkt_lu).  Unlike
    kkt_chol2 this does not require S to be positive definite —
    only the saddle system to be nonsingular.  Supports ``kktreg``
    static regularization (+reg/-reg like misc.py:1096-1098).
    """
    p, n = A.shape

    def factor(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        io_dtype = GG.dtype
        if factor_dtype is not None:
            Wf = jax.tree_util.tree_map(
                lambda u: u.astype(factor_dtype), W)
            Gs = scale_rows(GG.astype(factor_dtype), Wf, dims,
                            trans="T", inverse="I")
        else:
            Gs = scale_rows(GG, W, dims, trans="T", inverse="I")
        S = Gs.T @ Gs
        if H is not None:
            S = S + H.astype(S.dtype)
        K = jnp.zeros((n + p, n + p), dtype=S.dtype)
        K = K.at[:n, :n].set(S)
        K = K.at[n:, :n].set(A.astype(S.dtype))
        K = K.at[:n, n:].set(A.T.astype(S.dtype))
        if kktreg is not None:
            d1 = jnp.arange(n)
            K = K.at[d1, d1].add(kktreg)
            d2 = jnp.arange(n, n + p)
            K = K.at[d2, d2].add(-kktreg)
        lu, piv = jsl.lu_factor(K)

        def solve(bx, by, bz):
            zs = scale_w2inv(bz, W, dims)
            r = (bx + mvt(GG, zs)).astype(S.dtype)
            u = jnp.concatenate([r, by.astype(S.dtype)])
            u = jsl.lu_solve((lu, piv), u)
            ux = u[:n].astype(io_dtype)
            uy = u[n:].astype(io_dtype)
            Wuz = scale(mv(GG, ux) - bz, W, dims, trans="T", inverse="I")
            return ux, uy, Wuz

        return solve

    return factor


def kkt_chol(G, dims: ConeDims, A, mnl: int = 0,
             explicit_inverse: bool = False, factor_dtype=None):
    """QR of A' to eliminate equality constraints, then dense Cholesky
    of Q2'(H + GG'W^{-1}W^{-T}GG)Q2 (reference kkt_chol,
    misc.py:1213-1350).  The coneqp/cpl default for 'q'/'s' cones
    (coneprog.py:1805-1809).

    With ``explicit_inverse=True`` ('chol_inv'), the reduced-system
    inverse K^{-1} (and R^{-1} for the equality block, which is fixed
    across iterations) is formed once per factor with MXU-efficient
    n-RHS triangular solves, turning every per-iteration solve into
    batched matmuls — on TPU, batched 1-RHS triangular solves are
    sequential-bound (~3 GFLOP/s) while matmuls run at MXU rates.
    ``factor_dtype`` factors in reduced precision (f32 on TPU) while
    the solver's f64 iterative refinement recovers full accuracy."""
    if factor_dtype == "adaptive":
        factor_dtype = "float32"     # adaptive mode lives in kkt_chol2
    p, n = A.shape
    if p:
        Q, R = jnp.linalg.qr(A.T, mode="complete")       # A' = Q [R; 0]
        Q1, Q2 = Q[:, :p], Q[:, p:]
        R = R[:p, :]
        Rinv = (jsl.solve_triangular(R, jnp.eye(p, dtype=G.dtype),
                                     lower=False)
                if explicit_inverse else None)
    else:
        Q1 = jnp.zeros((n, 0), dtype=G.dtype)
        Q2 = jnp.eye(n, dtype=G.dtype)
        R = jnp.zeros((0, 0), dtype=G.dtype)
        Rinv = None

    def factor(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        io_dtype = GG.dtype
        if factor_dtype is not None:
            # cast before scaling (see kkt_chol2.factor)
            Wf = jax.tree_util.tree_map(
                lambda u: u.astype(factor_dtype), W)
            Gs = scale_rows(GG.astype(factor_dtype), Wf, dims,
                            trans="T", inverse="I")
        else:
            Gs = scale_rows(GG, W, dims, trans="T", inverse="I")
        S = Gs.T @ Gs
        if H is not None:
            S = S + H.astype(S.dtype)
        Q1f, Q2f = Q1.astype(S.dtype), Q2.astype(S.dtype)
        K = Q2f.T @ S @ Q2f                              # (n-p, n-p)
        if factor_dtype is not None:
            # Jacobi equilibration before the reduced-precision factor
            # (see kkt_chol2 for rationale)
            deq = jax.lax.rsqrt(jnp.maximum(
                jnp.diag(K), jnp.asarray(1e-30, K.dtype)))
            K = K * deq[:, None] * deq[None, :]
        else:
            deq = None

        if explicit_inverse:
            # block-recursive SPD inverse (see kkt_chol2 / blockinv.py)
            from cvxopt_tpu.ops.blockinv import spd_inverse
            Kinv_mat = spd_inverse(K)
            if deq is not None:
                Kinv_mat = deq[:, None] * Kinv_mat * deq[None, :]

            def Kinv(v):
                return Kinv_mat @ v
        else:
            L = jnp.linalg.cholesky(K)

            def Kinv(v):
                if deq is not None:
                    v = deq * v if v.ndim == 1 else deq[:, None] * v
                w = jsl.solve_triangular(L, v, lower=True)
                w = jsl.solve_triangular(L.T, w, lower=False)
                if deq is not None:
                    w = deq * w if w.ndim == 1 else deq[:, None] * w
                return w

        def solve(bx, by, bz):
            # rhs r = bx + GG' W^{-1} W^{-T} bz via the unscaled GG
            # (shared across vmapped batches; see kkt_chol2.solve)
            zs = scale_w2inv(bz, W, dims)
            r = (bx + mvt(GG, zs)).astype(S.dtype)
            byf = by.astype(S.dtype)
            if p:
                # v1 from A ux = by:  R' v1 = by
                if explicit_inverse:
                    v1 = Rinv.astype(S.dtype).T @ byf
                else:
                    v1 = jsl.solve_triangular(
                        R.astype(S.dtype).T, byf, lower=True)
                rhs2 = Q2f.T @ (r - S @ (Q1f @ v1))
            else:
                v1 = byf
                rhs2 = Q2f.T @ r
            v2 = Kinv(rhs2)
            ux = Q2f @ v2 + (Q1f @ v1 if p else 0.0)
            if p:
                ry = Q1f.T @ (r - S @ ux)
                if explicit_inverse:
                    uy = Rinv.astype(S.dtype) @ ry
                else:
                    uy = jsl.solve_triangular(
                        R.astype(S.dtype), ry, lower=False)
            else:
                uy = byf
            ux = ux.astype(io_dtype)
            uy = uy.astype(io_dtype)
            # W uz = W^{-T} (GG ux - bz)
            Wuz = scale(mv(GG, ux) - bz, W, dims, trans="T", inverse="I")
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
    f64 CPU runs at 1e-7 tolerances.

    ``factor_dtype='adaptive'`` (single-problem TPU f64 mode): factor
    in equilibrated f32 every iteration, then verify with one probe
    solve whose residual is evaluated in f64; only when the f32
    factor's error contraction is too weak for iterative refinement
    (near convergence, kappa_eq(S) ~ 1/eps_f32) does a `lax.cond`
    branch compute the f64 factorization.  Early IPM iterations run at
    f32 speed, the last few at emulated-f64 speed, and the 1e-7
    contract holds on problems where a fixed f32 factor diverges
    (docs/performance.md).  Not for vmapped batches: under vmap both
    cond branches execute for the whole batch."""
    p, n = A.shape
    adaptive = factor_dtype == "adaptive"

    def factor_adaptive(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        io_dtype = GG.dtype
        # f32 FAST PATH FIRST (r05): cast before scaling, exactly as
        # the plain f32 factor — the f64 row scaling and the f64
        # Gram/probe matvecs previously ran unconditionally and cost
        # 167 ms/factor at mcsdp m=200 where the pure-f32 factor is
        # 15.6 ms (scripts/tpu_sdp_iter_budget.py); all f64 work now
        # lives inside the need64 cond branch.
        W32 = jax.tree_util.tree_map(
            lambda u: u.astype(jnp.float32), W)
        Gs32 = scale_rows(GG.astype(jnp.float32), W32, dims,
                          trans="T", inverse="I")
        S32 = Gs32.T @ Gs32
        if H is not None:
            S32 = S32 + H.astype(jnp.float32)
        deq = jax.lax.rsqrt(jnp.maximum(
            jnp.diag(S32), jnp.asarray(1e-30, jnp.float32)))
        Se = S32 * deq[:, None] * deq[None, :]
        Ls32 = jnp.linalg.cholesky(Se)
        deq64 = deq.astype(io_dtype)

        def solve32(v):
            v32 = (deq64 * v if v.ndim == 1
                   else deq64[:, None] * v).astype(jnp.float32)
            w = jsl.solve_triangular(Ls32, v32, lower=True)
            w = jsl.solve_triangular(Ls32.T, w, lower=False)
            w = w.astype(io_dtype)
            return deq64 * w if w.ndim == 1 else deq64[:, None] * w

        # probe: one f32 solve, residual in f64 ARITHMETIC against the
        # f32-valued Gram matrix (decision-only: the ~1e-7 operator
        # quantization is far below the 1e-6 threshold's margin)
        Sp64 = S32.astype(io_dtype)
        r0 = jnp.ones((n,), io_dtype) / float(n) ** 0.5
        t0 = solve32(r0)
        relres = jnp.linalg.norm(mv(Sp64, t0) - r0) \
            / jnp.linalg.norm(r0)
        # the refinement contraction of the composite KKT solve is
        # amplified beyond this single-probe residual by the equality
        # Schur complement (kappa(K)) and the cone scaling, so the
        # threshold carries a wide safety margin below eps_f32*kappa=1
        # NaN-safe: an f32 factor of a (in f32) non-PD S yields NaN,
        # which must select the f64 branch, so test the negation
        need64 = ~(relres <= 1e-6)

        # f64 branch: the platform's emulated-f64 cholesky is only
        # f32-GRADE and goes NaN at the kappa(S) ~ 1/mu^2 ~ 1e12 the
        # final IPM iterations reach (measured: mcsdp m=200 exits
        # 'singular' at iteration 11 on TPU while converging on CPU).
        # Factor through the accurate eigh instead (f32 seed + Jacobi
        # polish in the f64-ACCURATE op set, ops/jacobi.py): the
        # eigenvalue error ~1e-14*||S|| gives a solve contraction of
        # ~||S||eps/w_min per round, so a few internal refinement
        # rounds (f64 matmuls) reach f64-class residuals even at
        # kappa ~ 1e12.  Non-PD S surfaces as w <= 0 -> NaN inverse,
        # preserving the solvers' NaN singularity contract.
        # The branch returns the f64 Gram matrix S too: the per-solve
        # refinement only needs S @ v (an (n, n) mv), never the
        # (cdim, n) scaled G.
        from cvxopt_tpu.ops.jacobi import eigh_accurate

        def eig64():
            Gs = scale_rows(GG, W, dims, trans="T", inverse="I")
            S = Gs.T @ Gs
            if H is not None:
                S = S + H
            w, V = eigh_accurate(S)
            winv = jnp.where(w > 0, 1.0 / jnp.where(w > 0, w, 1.0),
                             jnp.nan)
            return winv, V, S

        winv64, V64, S64 = jax.lax.cond(
            need64, eig64,
            lambda: (jnp.zeros((n,), io_dtype),
                     jnp.zeros((n, n), io_dtype),
                     jnp.zeros((n, n), io_dtype)))

        def Sinv(v):
            def app64(u):
                t = mvt(V64, u) if u.ndim == 1 else V64.T @ u
                t = winv64 * t if u.ndim == 1 else winv64[:, None] * t
                return mv(V64, t) if u.ndim == 1 else V64 @ t

            def S64mv(u):
                return mv(S64, u) if u.ndim == 1 else S64 @ u

            def s64(u):
                x = app64(u)
                # internal refinement: residuals in accurate f64
                # matmuls; 3 rounds at ~1e-2 contraction reach ~1e-8
                for _ in range(3):
                    x = x + app64(u - S64mv(x))
                return x

            return jax.lax.cond(need64, s64, solve32, v)

        if p:
            SiAT = Sinv(A.T)
            K = A @ SiAT
            Lk = jnp.linalg.cholesky(K)

        def solve(bx, by, bz):
            zs = scale(bz, W, dims, trans="T", inverse="I")
            r = bx + mvt(GG, zs)
            t = Sinv(r)
            if p:
                rhs = A @ t - by
                w = jsl.solve_triangular(Lk, rhs, lower=True)
                uy = jsl.solve_triangular(Lk.T, w, lower=False)
                ux = t - SiAT @ uy
            else:
                uy = by
                ux = t
            Wuz = scale(mv(GG, ux) - bz, W, dims, trans="T", inverse="I")
            return ux, uy, Wuz

        return solve

    if adaptive:
        return factor_adaptive

    def factor(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        io_dtype = GG.dtype
        if factor_dtype is not None:
            # mixed precision: factor in factor_dtype (f32 on TPU,
            # where f64 linear algebra is emulated); the solvers' f64
            # iterative refinement recovers full accuracy.  Cast BEFORE
            # scaling so the batched scaled matrix only ever exists in
            # f32 — under vmap a per-instance f64 Gs is the dominant
            # memory and bandwidth cost (B x (cdim, n) x 8 bytes)
            Wf = jax.tree_util.tree_map(
                lambda u: u.astype(factor_dtype), W)
            Gs = scale_rows(GG.astype(factor_dtype), Wf, dims,
                            trans="T", inverse="I")
        else:
            Gs = scale_rows(GG, W, dims, trans="T", inverse="I")
        S = Gs.T @ Gs
        if H is not None:
            S = S + H.astype(S.dtype)
        if factor_dtype is not None:
            # Jacobi equilibration: near convergence kappa(S) grows like
            # 1/mu^2 and exceeds 1/eps_f32, purely through row/column
            # scaling from the NT weights — van-der-Sluis scaling
            # S_e = D S D, D = diag(S)^{-1/2} removes it, keeping the
            # f32 factor inside refinement's convergence region
            deq = jax.lax.rsqrt(jnp.maximum(
                jnp.diag(S), jnp.asarray(1e-30, S.dtype)))
            S = S * deq[:, None] * deq[None, :]
        else:
            deq = None

        if explicit_inverse:
            # block-recursive SPD inverse: batched-matmul-shaped on
            # TPU (the XLA chol + n-RHS triangular solve pair is
            # sequential-op-bound; see ops/blockinv.py).  NaN on
            # non-PD input, like cholesky.
            from cvxopt_tpu.ops.blockinv import spd_inverse
            Sinv_mat = spd_inverse(S)
            if deq is not None:
                Sinv_mat = deq[:, None] * Sinv_mat * deq[None, :]

            def Sinv(v):
                return Sinv_mat @ v
        else:
            Ls = jnp.linalg.cholesky(S)

            def Sinv(v):
                if deq is not None:
                    v = deq * v if v.ndim == 1 else deq[:, None] * v
                w = jsl.solve_triangular(Ls, v, lower=True)
                w = jsl.solve_triangular(Ls.T, w, lower=False)
                if deq is not None:
                    w = deq * w if w.ndim == 1 else deq[:, None] * w
                return w

        if p:
            SiAT = Sinv(A.astype(S.dtype).T)             # (n, p)
            K = A.astype(S.dtype) @ SiAT
            Lk = jnp.linalg.cholesky(K)

        def solve(bx, by, bz):
            # r = bx + GG' W^{-1} W^{-T} bz, computed through the
            # UNSCALED GG (Gs' (W^{-T}bz) == GG' (W^{-1}W^{-T}bz)): GG
            # is shared across a vmapped batch while Gs is per-instance
            zs = scale_w2inv(bz, W, dims)
            r = (bx + mvt(GG, zs)).astype(S.dtype)
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
            Wuz = scale(mv(GG, ux) - bz, W, dims, trans="T", inverse="I")
            return ux, uy, Wuz

        return solve

    return factor


class PFactor:
    """A precomputed square-root factor of the (1,1) block: Rt'Rt = P.

    `kkt_cholqr` recomputes this factor (an eigh) on every call when
    handed a raw matrix; solver loops hoist the eigh out of the
    iteration by passing ``PFactor(psqrt_factor(P))`` instead — the
    (1,1) block is constant across coneqp iterations
    (coneprog.py:1980-1981 passes the same P to every factor call)."""

    def __init__(self, Rt):
        self.Rt = Rt


def psqrt_factor(P, dtype=None) -> "PFactor":
    """PSD square-root factor Rt with Rt'Rt = P.

    Default (dtype=None): via eigh (PSD-safe: negative eigenvalues
    from roundoff are clamped to zero) — full working precision.

    ``dtype`` set (the reduced-precision cholqr path): via Cholesky of
    P + jitter in that dtype.  The factor only ever enters the
    reduced-precision QR stack, so a preconditioner-grade Rt is
    enough; the f64 refinement measures residuals against the TRUE P.
    This matters enormously on the emulated-f64 TPU backend: the
    batched eigh_accurate psqrt measured 7.47 s at (512, 64, 64) f64
    where the f32 Cholesky is 38 ms (r05, scripts/tpu_socp_bisect.py)
    — it was the entire fixed cost that held the SOCP bench at 2.4x.
    Jitter is relative (3e-7 max diag, retried at 1e-3 for lanes where
    the first Cholesky fails), so PSD-up-to-roundoff inputs are safe;
    an indefinite P still NaNs and lands in the rescue detectors."""
    if dtype is not None:
        Pf = P.astype(dtype)
        n = P.shape[-1]
        eye = jnp.eye(n, dtype=Pf.dtype)
        dmax = jnp.max(jnp.abs(
            jnp.diagonal(Pf, axis1=-2, axis2=-1)), axis=-1)
        tiny = jnp.asarray(1e-25, Pf.dtype)

        def try_(eps):
            shift = (eps * dmax + tiny)[..., None, None] * eye
            L = jnp.linalg.cholesky(Pf + shift)
            return jnp.swapaxes(L, -1, -2)

        R1, R2 = try_(3e-7), try_(1e-3)
        bad = ~jnp.isfinite(jnp.sum(R1, axis=(-2, -1),
                                    keepdims=True))
        return PFactor(jnp.where(bad, R2, R1))
    from cvxopt_tpu.ops.jacobi import eigh_accurate
    w, U = eigh_accurate(P)
    Rt = jnp.sqrt(jnp.maximum(w, 0.0))[..., :, None] \
        * jnp.swapaxes(U, -1, -2)
    return PFactor(Rt)


def kkt_cholqr(G, dims: ConeDims, A, mnl: int = 0,
               explicit_inverse: bool = False, factor_dtype=None):
    """Condition-halving QR strategy for coneqp: factor the condensed
    SPD matrix S = H + GG'W^{-1}W^{-T}GG WITHOUT forming it.

    With Rp'Rp = H (computed once — see `PFactor`) and the stacked
    matrix M = [W^{-T}GG; Rp], S = M'M exactly; a QR factorization of
    M·Q2 (Q2 from the once-per-problem QR of A', as in kkt_chol) gives
    R with R'R = Q2'SQ2 and kappa(R) = sqrt(kappa(S)).  Near
    convergence the NT-scaled Gram matrix has kappa(S) ~ 1/mu^2 —
    beyond 1/eps_f32 at 1e-7 tolerances, and NOT repairable by diagonal
    equilibration when 'q'/'s' blocks make the ill-conditioning
    anisotropic within a block — but kappa(R) ~ 1/mu stays within f32
    range, so a reduced-precision factor plus f64 iterative refinement
    reaches the full 1e-7 contract on SOC/SDP problems where an f32
    Cholesky of S diverges.  This is the same no-normal-equations
    principle as the reference's kkt_qr (misc.py:1570, conelp's 'q'/'s'
    default), extended to the nonzero-(1,1)-block coneqp system.

    ``explicit_inverse=True`` ('cholqr_inv') forms R^{-1} once per
    factor so per-iteration solves are matmuls (TPU fast path); the
    explicit-inverse application error ~eps*kappa(R) = eps*sqrt(
    kappa(S)) stays refinement-recoverable even in f32 — unlike
    'chol2_inv', whose eps*kappa(S) error makes it rescue-only on
    cones (see `robust_name`)."""
    p, n = A.shape
    if p:
        Q, RA = jnp.linalg.qr(A.T, mode="complete")      # A' = Q [R1; 0]
        Q1, Q2 = Q[:, :p], Q[:, p:]
        R1 = RA[:p, :]
        R1inv = (jsl.solve_triangular(R1, jnp.eye(p, dtype=G.dtype),
                                      lower=False)
                 if explicit_inverse else None)
    else:
        Q1 = jnp.zeros((n, 0), dtype=G.dtype)
        Q2 = jnp.eye(n, dtype=G.dtype)
        R1 = jnp.zeros((0, 0), dtype=G.dtype)
        R1inv = None

    def factor(W, H=None, Df=None):
        GG = _stack_gg(G, Df)
        io_dtype = GG.dtype
        fdt = factor_dtype if factor_dtype is not None else io_dtype
        Wf = jax.tree_util.tree_map(lambda u: u.astype(fdt), W)
        Gs = scale_rows(GG.astype(fdt), Wf, dims, trans="T",
                        inverse="I")
        if H is None:
            M = Gs
        else:
            Rp = H.Rt if isinstance(H, PFactor) \
                else psqrt_factor(H, dtype=factor_dtype).Rt
            M = jnp.concatenate([Gs, Rp.astype(fdt)], axis=0)
        Q1f, Q2f = Q1.astype(fdt), Q2.astype(fdt)
        M2 = M @ Q2f                                     # (cdim+n, n-p)
        # column equilibration (van-der-Sluis on S's diagonal):
        # ||M2[:,j]||^2 = (Q2'SQ2)_jj
        deq = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(M2 * M2, axis=0), jnp.asarray(1e-30, fdt)))
        R = jnp.linalg.qr(M2 * deq[None, :], mode="r")

        if explicit_inverse:
            Rinv = jsl.solve_triangular(
                R, jnp.eye(n - p, dtype=R.dtype), lower=False)

            def Kinv(v):
                v = deq * v if v.ndim == 1 else deq[:, None] * v
                w = Rinv @ (Rinv.T @ v)
                return deq * w if w.ndim == 1 else deq[:, None] * w
        else:
            def Kinv(v):
                v = deq * v if v.ndim == 1 else deq[:, None] * v
                w = jsl.solve_triangular(R.T, v, lower=True)
                w = jsl.solve_triangular(R, w, lower=False)
                return deq * w if w.ndim == 1 else deq[:, None] * w

        def Smv(v):
            return M.T @ (M @ v)

        def solve(bx, by, bz):
            # r = bx + GG' W^{-1} W^{-T} bz via the unscaled GG
            # (shared across vmapped batches; see kkt_chol2.solve)
            zs = scale_w2inv(bz, W, dims)
            r = (bx + mvt(GG, zs)).astype(fdt)
            byf = by.astype(fdt)
            if p:
                if explicit_inverse:
                    v1 = R1inv.astype(fdt).T @ byf
                else:
                    v1 = jsl.solve_triangular(
                        R1.astype(fdt).T, byf, lower=True)
                rhs2 = Q2f.T @ (r - Smv(Q1f @ v1))
            else:
                v1 = byf
                rhs2 = Q2f.T @ r
            v2 = Kinv(rhs2)
            ux = Q2f @ v2 + (Q1f @ v1 if p else 0.0)
            if p:
                ry = Q1f.T @ (r - Smv(ux))
                if explicit_inverse:
                    uy = R1inv.astype(fdt) @ ry
                else:
                    uy = jsl.solve_triangular(
                        R1.astype(fdt), ry, lower=False)
            else:
                uy = byf
            ux = ux.astype(io_dtype)
            uy = uy.astype(io_dtype)
            Wuz = scale(mv(GG, ux) - bz, W, dims, trans="T", inverse="I")
            return ux, uy, Wuz

        return solve

    return factor


def kkt_qr(G, dims: ConeDims, A, mnl: int = 0,
           explicit_inverse: bool = False, factor_dtype=None):
    """Zero-(1,1)-block KKT solve by two QR factorizations (reference
    kkt_qr, misc.py:1570-1697) — the conelp default for 'q'/'s' cones
    (coneprog.py:458-462): QR of A' eliminates the equalities, then a
    QR of W^{-T}G·Q2 (packed columns) solves the reduced system without
    forming normal equations (no condition-number squaring).

    ``explicit_inverse=True`` ('qr_inv') forms R3^{-1} (and R1^{-1},
    fixed across iterations) once per factor so the per-iteration
    solves are batched matmuls instead of sequential 1-RHS triangular
    solves — the TPU fast path (see kkt_chol2 notes).  ``factor_dtype``
    runs the QR and solves in reduced precision; conelp's f64
    iterative refinement recovers accuracy."""
    if factor_dtype == "adaptive":
        factor_dtype = "float32"     # adaptive mode lives in kkt_chol2
    p, n = A.shape
    if p:
        Q, RA = jnp.linalg.qr(A.T, mode="complete")      # A' = Q [R1; 0]
        Q1, Q2 = Q[:, :p], Q[:, p:]
        R1 = RA[:p, :]
        R1inv = (jsl.solve_triangular(R1, jnp.eye(p, dtype=G.dtype),
                                      lower=False)
                 if explicit_inverse else None)
    else:
        Q1 = jnp.zeros((n, 0), dtype=G.dtype)
        Q2 = jnp.eye(n, dtype=G.dtype)
        R1 = jnp.zeros((0, 0), dtype=G.dtype)
        R1inv = None

    def factor(W, H=None, Df=None):
        if H is not None:
            raise ValueError("kkt_qr requires a zero (1,1) block "
                             "(conelp only)")
        GG = _stack_gg(G, Df)
        io_dtype = GG.dtype
        if factor_dtype is not None:
            # cast before scaling (see kkt_chol2.factor)
            Wf = jax.tree_util.tree_map(
                lambda u: u.astype(factor_dtype), W)
            Gs = pack_matrix_cols(
                scale_rows(GG.astype(factor_dtype), Wf, dims,
                           trans="T", inverse="I"), dims)
        else:
            Gs = pack_matrix_cols(
                scale_rows(GG, W, dims, trans="T", inverse="I"), dims)
        Q1f, Q2f = Q1.astype(Gs.dtype), Q2.astype(Gs.dtype)
        Gs1 = Gs @ Q1f                                   # (pdim, p)
        Q3, R3 = jnp.linalg.qr(Gs @ Q2f, mode="reduced")  # (pdim, n-p)

        if explicit_inverse:
            R3inv = jsl.solve_triangular(
                R3, jnp.eye(n - p, dtype=R3.dtype), lower=False)
            R1f = R1inv.astype(Gs.dtype) if p else None

            def solve_R3T(v):
                return R3inv.T @ v

            def solve_R3(v):
                return R3inv @ v

            def solve_R1T(v):
                return R1f.T @ v

            def solve_R1(v):
                return R1f @ v
        else:
            R1c = R1.astype(Gs.dtype)

            def solve_R3T(v):
                return jsl.solve_triangular(R3.T, v, lower=True)

            def solve_R3(v):
                return jsl.solve_triangular(R3, v, lower=False)

            def solve_R1T(v):
                return jsl.solve_triangular(R1c.T, v, lower=True)

            def solve_R1(v):
                return jsl.solve_triangular(R1c, v, lower=False)

        def solve(bx, by, bz):
            bzp = pack(scale(bz, W, dims, trans="T", inverse="I"),
                       dims).astype(Gs.dtype)
            bxf = bx.astype(Gs.dtype)
            if p:
                v1 = solve_R1T(by.astype(Gs.dtype))
                w = bzp - Gs1 @ v1
            else:
                v1 = by.astype(Gs.dtype)
                w = bzp
            vv2 = solve_R3T(Q2f.T @ bxf)
            u = Q3.T @ w + vv2
            Wz = Q3 @ u - w
            if p:
                uy = solve_R1(Q1f.T @ bxf - Gs1.T @ Wz)
            else:
                uy = by.astype(Gs.dtype)
            ux = Q2f @ solve_R3(u)
            if p:
                ux = ux + Q1f @ v1
            return (ux.astype(io_dtype), uy.astype(io_dtype),
                    unpack(Wz.astype(io_dtype), dims))

        return solve

    return factor


def robust_name(name: str) -> str:
    """The non-explicit-inverse variant of a kktsolver name.

    Explicit-inverse factors ('*_inv') have solve error ~eps*kappa(S);
    with 'q'/'s' cones kappa(S) grows like 1/mu^2 and exceeds even
    1/eps_f64 near convergence (measured: f64 chol2_inv diverges on
    SOC QPs at 1e-7 where chol2 converges).  f64 rescue phases and
    cone-aware f64 fallbacks therefore always factor with the
    triangular-solve variants."""
    return {"chol2_inv": "chol2", "chol_inv": "chol",
            "qr_inv": "qr", "cholqr_inv": "cholqr"}.get(name, name)


def wrap_P(name, P, factor_dtype=None):
    """Hoist `psqrt_factor` out of the solver iteration for the cholqr
    strategies: the (1,1) block is constant across coneqp iterations,
    so it runs once per problem, not once per factor call.  When the
    factor itself is reduced-precision, the psqrt is too (see
    psqrt_factor — the 197x TPU fix)."""
    if isinstance(name, str) and "cholqr" in name and P is not None \
            and not callable(P) and hasattr(P, "ndim"):
        return psqrt_factor(P, dtype=factor_dtype)
    return P


def resolve_factor_dtype(factor_dtype):
    """Resolve the `options['factor_dtype']` setting.

    'auto' (the front-end default): when running f64 on a TPU backend
    — where f64 linear algebra is emulated (slow) and LU has no f64
    lowering at all — resolve to 'rescue': factor in equilibrated f32
    (plus f64 iterative refinement, which recovers f64-class KKT
    residuals, measured ~5e-14; docs/performance.md), with a
    per-instance stall detector that hands instances the f32 factor
    cannot finish to a second solve phase using full-f64 factors.  The
    second phase executes zero iterations when every instance
    converges in phase 1, so clean (vmapped) batches run at
    mixed-precision speed while degenerate problems still meet the
    1e-7 contract.  On CPU, or without x64, 'auto' resolves to None
    (factor in the working dtype).  Explicit 'none'/False disable;
    'float32' forces single-phase mixed precision (no rescue);
    'rescue' forces the two-phase mode; anything else passes through.
    """
    if factor_dtype in ("none", False):
        return None
    if factor_dtype == "auto":
        import jax
        if jax.config.jax_enable_x64 and \
                jax.devices()[0].platform != "cpu":
            return "rescue"
        return None
    return factor_dtype


def get_kktsolver(name: str, G, dims: ConeDims, A, mnl: int = 0,
                  kktreg: Optional[float] = None, factor_dtype=None):
    """Map reference kktsolver names (coneprog.py:463) to strategies.

    'ldl' maps to the full-3x3 dense factorization `kkt_lu`; 'ldl2' to
    the condensed 2x2 `kkt_ldl2`; 'qr', 'chol', 'chol2' to their
    direct equivalents.
    """
    if name == "ldl":
        return kkt_lu(G, dims, A, mnl=mnl, kktreg=kktreg)
    if name == "ldl2":
        return kkt_ldl2(G, dims, A, mnl=mnl, kktreg=kktreg,
                        factor_dtype=factor_dtype)
    if name == "qr":
        return kkt_qr(G, dims, A, mnl=mnl, factor_dtype=factor_dtype)
    if name == "qr_inv":
        return kkt_qr(G, dims, A, mnl=mnl, explicit_inverse=True,
                      factor_dtype=factor_dtype)
    if name == "chol":
        return kkt_chol(G, dims, A, mnl=mnl, factor_dtype=factor_dtype)
    if name == "chol_inv":
        return kkt_chol(G, dims, A, mnl=mnl, explicit_inverse=True,
                        factor_dtype=factor_dtype)
    if name == "cholqr":
        return kkt_cholqr(G, dims, A, mnl=mnl,
                          factor_dtype=factor_dtype)
    if name == "cholqr_inv":
        return kkt_cholqr(G, dims, A, mnl=mnl, explicit_inverse=True,
                          factor_dtype=factor_dtype)
    if name == "chol2":
        return kkt_chol2(G, dims, A, mnl=mnl,
                         factor_dtype=factor_dtype)
    if name == "chol2_inv":
        return kkt_chol2(G, dims, A, mnl=mnl, explicit_inverse=True,
                         factor_dtype=factor_dtype)
    raise ValueError(f"'{name}' is not a valid value for kktsolver")
