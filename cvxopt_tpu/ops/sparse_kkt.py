"""Sparse KKT path: fixed-pattern banded assembly + scan Cholesky.

The reference's big-LP workhorse is kkt_chol2 with a CHOLMOD-backed
sparse Cholesky and fixed-sparsity re-assembly via `partial=True` syrk
(/root/reference/src/python/misc.py:1431-1487,
/root/reference/src/C/base.c:398-489, /root/reference/src/C/cholmod.c).
TPUs have no supernodal gather path; the TPU-native equivalent built
here:

  1. ORDERING (host, setup time): reverse Cuthill-McKee on the static
     pattern of S = P + G'G reduces it to a banded matrix of bandwidth
     w — the fill-reducing-ordering analogue of AMD, chosen because a
     *band* is the sparsity structure TPUs can factor at scan speed.
  2. FIXED-PATTERN NUMERIC ASSEMBLY (device, per IPM iteration): the
     scatter indices of every Gram-pair contribution G[k,i]*G[k,j]
     into band storage are precomputed ONCE from the pattern (the
     `partial=True` analogue); each factor step is one fused
     multiply + scatter-add of static shape.
  3. FACTOR/SOLVE (device): scan-based banded Cholesky
     (ops/banded.pbtrf/pbtrs) — O(n w^2) factor, O(n w) solves —
     instead of O(n^3) dense.

`kkt_chol2_banded` packages this as a conelp/coneqp-compatible custom
kktsolver for 'l'-cone problems (the reference's kkt_chol2 is likewise
'l'-only, coneprog.py:458-462), with equalities handled by a dense
Schur complement on A (p is small in the target problems).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from cvxopt_tpu.ops import banded


# ---------------------------------------------------------------------
# ELL sparse storage (static row-padded) — device matvecs
# ---------------------------------------------------------------------

@dataclass
class SparseELL:
    """Row-padded (ELLPACK) sparse matrix: per row up to r column
    indices + values; padding uses col index 0 with value 0."""
    vals: jnp.ndarray          # (m, r)
    cols: jnp.ndarray          # (m, r) int32
    shape: tuple

    @staticmethod
    def from_scipy(A) -> "SparseELL":
        A = sp.csr_matrix(A)
        m, n = A.shape
        r = max(int(np.diff(A.indptr).max()), 1) if A.nnz else 1
        vals = np.zeros((m, r))
        cols = np.zeros((m, r), np.int32)
        for i in range(m):
            s, e = A.indptr[i], A.indptr[i + 1]
            vals[i, : e - s] = A.data[s:e]
            cols[i, : e - s] = A.indices[s:e]
        return SparseELL(jnp.asarray(vals), jnp.asarray(cols),
                         (m, n))

    def matvec(self, x):
        """G @ x: gathers only."""
        return jnp.sum(self.vals * x[self.cols], axis=1)

    def rmatvec(self, y):
        """G' @ y: one scatter-add."""
        n = self.shape[1]
        contrib = self.vals * y[:, None]
        return jnp.zeros((n,), contrib.dtype).at[
            self.cols.reshape(-1)].add(contrib.reshape(-1))

    def todense(self):
        m, n = self.shape
        D = jnp.zeros((m, n), self.vals.dtype)
        rows = jnp.arange(m)[:, None] * jnp.ones_like(self.cols)
        return D.at[rows.reshape(-1), self.cols.reshape(-1)].add(
            self.vals.reshape(-1))


# ---------------------------------------------------------------------
# Setup: ordering + static scatter plan
# ---------------------------------------------------------------------

def rcm_order(pattern) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of a symmetric pattern (the
    bandwidth-minimizing analogue of cvxopt.amd.order)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    S = sp.csr_matrix(pattern)
    S = ((S + S.T) != 0).astype(np.int8)
    return np.asarray(reverse_cuthill_mckee(S, symmetric_mode=True),
                      dtype=np.int64)


def band_width_of(pattern, perm) -> int:
    S = sp.coo_matrix(pattern)
    pos = np.argsort(perm)
    return int(np.abs(pos[S.row] - pos[S.col]).max()) if S.nnz else 0


@dataclass
class BandPlan:
    """Static plan for assembling the band of S = P + G' diag(w) G
    under a fill-reducing permutation (the `partial=True` analogue:
    indices computed once, values re-scattered every iteration)."""
    perm: np.ndarray            # new -> old column order
    kd: int                     # bandwidth of permuted S
    n: int
    G: SparseELL                # original column indexing (matvecs)
    scatter_idx: jnp.ndarray    # (m*r*r,) flat band index (or OOB)
    pairs_i: jnp.ndarray        # value gather plans
    Pband: Optional[jnp.ndarray] = None   # static band of P (permuted)
    dtype: object = jnp.float64


def make_band_plan(G_sp, P_sp=None, dtype=jnp.float64,
                   extra_pattern=None) -> BandPlan:
    """Host-side symbolic setup.  G_sp: (m, n) scipy sparse; P_sp:
    optional (n, n) scipy sparse symmetric."""
    G_sp = sp.csr_matrix(G_sp)
    m, n = G_sp.shape
    Gpat = sp.csr_matrix(
        (np.ones_like(G_sp.data), G_sp.indices, G_sp.indptr),
        shape=G_sp.shape)
    Spat = (Gpat.T @ Gpat)
    if P_sp is not None:
        Spat = Spat + sp.csr_matrix(P_sp)
    if extra_pattern is not None:
        Spat = Spat + sp.csr_matrix(extra_pattern)
    perm = rcm_order(Spat != 0)
    kd = band_width_of(Spat != 0, perm)
    pos = np.argsort(perm)                  # old col -> banded position

    ell = SparseELL.from_scipy(G_sp)
    r = ell.vals.shape[1]
    cols = np.asarray(ell.cols)             # (m, r) original ids
    valid = np.asarray(ell.vals) != 0
    # pad rows with zero-value entries still scatter 0 — keep valid
    # mask anyway to drop (i, j) pairs with any pad member
    p_i = pos[cols]                         # (m, r) banded positions
    pi = p_i[:, :, None] * np.ones((1, 1, r), int)
    pj = p_i[:, None, :] * np.ones((1, r, 1), int)
    vi = valid[:, :, None] & valid[:, None, :]
    lower = pi >= pj                        # emit each pair once
    d = pi - pj
    c = pj
    flat = d * n + c
    oob = (kd + 1) * n                      # dropped by mode='drop'
    flat = np.where(vi & lower, flat, oob)
    plan = BandPlan(
        perm=perm, kd=kd, n=n, G=ell,
        scatter_idx=jnp.asarray(flat.reshape(-1), jnp.int32),
        pairs_i=jnp.asarray(0),             # unused; values from ell
        dtype=dtype)
    if P_sp is not None:
        Pd = sp.csr_matrix(P_sp).toarray()[np.ix_(perm, perm)]
        plan.Pband = jnp.asarray(
            np.stack([np.pad(np.diagonal(Pd, -j), (0, j))
                      for j in range(kd + 1)]), dtype)
    return plan


def assemble_band(plan: BandPlan, wrow):
    """Device-side numeric assembly: band of
    P + G' diag(wrow) G under the plan's permutation.  wrow: (m,)."""
    v = plan.G.vals                          # (m, r)
    contrib = (wrow[:, None, None] * v[:, :, None] * v[:, None, :])
    band = jnp.zeros(((plan.kd + 1) * plan.n,), contrib.dtype).at[
        plan.scatter_idx].add(contrib.reshape(-1), mode="drop")
    band = band.reshape(plan.kd + 1, plan.n)
    if plan.Pband is not None:
        band = band + plan.Pband.astype(band.dtype)
    return band


# ---------------------------------------------------------------------
# The sparse-aware kkt_chol2 (conelp/coneqp custom kktsolver)
# ---------------------------------------------------------------------

def kkt_chol2_banded(G_sp, dims, A=None, P_sp=None,
                     dtype=jnp.float64, method="auto",
                     factor_dtype=None, cb=None):
    """Custom kktsolver exploiting sparsity of G (and optionally P) for
    'l'-cone problems: factor cost O(n kd^2) instead of O(n^3).

    Usage:
        kkt = kkt_chol2_banded(G_scipy, dims, A=A_dense[, P_sp=...])
        solvers.conelp(c, G_dense, h, kktsolver=kkt)  (or coneqp)

    The returned callable follows the reference kktsolver contract
    (W) -> solve(bx, by, bz) -> (ux, uy, W uz) (misc.py:1069-1071);
    for coneqp pass the P term via P_sp at build time (the factor
    then matches factor(W, P)).

    ``method``: 'scan' runs the per-row `banded.pbtrf` recurrence (n
    sequential steps — fine on CPU); 'blocked' runs the block-panel
    `banded.pbtrf_blocked` (n/cb dense-MXU panels — the TPU path);
    'auto' picks by backend.  ``factor_dtype`` (e.g. jnp.float32)
    factors a Jacobi-equilibrated band in reduced precision — pair
    with solver-level iterative refinement (options['refinement']) on
    TPU, where f64 is emulated."""
    if getattr(dims, "q", ()) or getattr(dims, "s", ()):
        raise ValueError("kkt_chol2_banded supports 'l' cones only "
                         "(like the reference's sparse kkt_chol2)")
    plan = make_band_plan(G_sp, P_sp=P_sp, dtype=dtype)
    n = plan.n
    kd = plan.kd
    perm = jnp.asarray(plan.perm)
    inv = jnp.asarray(np.argsort(plan.perm))
    G = plan.G
    if method == "auto":
        method = "blocked" if jax.default_backend() != "cpu" \
            else "scan"
    if cb is None:
        cb = max(128, -(-kd // 8) * 8)
    if A is not None and getattr(A, "shape", (0,))[0]:
        A = jnp.asarray(A, dtype) if not hasattr(A, "todense") \
            else jnp.asarray(np.asarray(A.todense()), dtype)
        p = A.shape[0]
        Aperm = A[:, perm]
    else:
        p = 0

    def kktsolver(W):
        di = W["di"]
        wrow = di * di                       # W^{-2} row weights
        band = assemble_band(plan, wrow.astype(dtype))
        if factor_dtype is not None:
            # Jacobi (van-der-Sluis) equilibration of the band:
            # Se = Dq S Dq, Dq = diag(S)^{-1/2} — band[j, i] holds
            # A[i+j, i], so it scales by deq[i+j]*deq[i]
            deq = jax.lax.rsqrt(jnp.maximum(
                band[0], jnp.asarray(1e-300, band.dtype)))
            jj = np.arange(kd + 1)[:, None]
            ii = np.arange(n)[None, :]
            ipj = np.minimum(ii + jj, n - 1)
            bandF = (band * deq[ipj] * deq[None, :]).astype(
                factor_dtype)
        else:
            deq = None
            bandF = band
        if method == "blocked":
            fac = banded.pbtrf_blocked(bandF, cb=cb)
            solve_band = lambda v: banded.pbtrs_blocked(fac, v)
        else:
            LB = banded.pbtrf(bandF)
            solve_band = lambda v: banded.pbtrs(LB, v)

        def Sinv(v):                         # v in ORIGINAL indexing
            vp = v[perm] if v.ndim == 1 else v[perm, :]
            if deq is not None:
                vp = (deq * vp if vp.ndim == 1
                      else deq[:, None] * vp).astype(bandF.dtype)
            t = solve_band(vp)
            if deq is not None:
                t = t.astype(band.dtype)
                t = deq * t if t.ndim == 1 else deq[:, None] * t
            return t[inv] if t.ndim == 1 else t[inv, :]

        if p:
            rhs = Aperm.T                             # (n, p) permuted
            if deq is not None:
                rhs = (deq[:, None] * rhs).astype(bandF.dtype)
            SiAT = solve_band(rhs)
            if deq is not None:
                SiAT = deq[:, None] * SiAT.astype(band.dtype)
            K = Aperm @ SiAT
            Lk = jnp.linalg.cholesky(K)

        def solve(bx, by, bz):
            zs = di * (di * bz)              # W^{-1} W^{-T} bz ('l')
            r = bx + G.rmatvec(zs)
            t = Sinv(r)
            if p:
                rhs = A @ t - by
                w2 = jsl.solve_triangular(Lk, rhs, lower=True)
                uy = jsl.solve_triangular(Lk.T, w2, lower=False)
                ux = t - Sinv(A.T @ uy)
            else:
                uy = by
                ux = t
            Wuz = di * (G.matvec(ux) - bz)
            return ux, uy, Wuz

        return solve

    kktsolver.plan = plan                    # introspection/tests
    return kktsolver


# ---------------------------------------------------------------------
# Sparse front-ends: large LPs/QPs without ever densifying G
# ---------------------------------------------------------------------

def _as_ops(G_sp, dtype):
    from cvxopt_tpu.linops import LinearOperator
    ell = SparseELL.from_scipy(G_sp)
    ell = SparseELL(ell.vals.astype(dtype), ell.cols, ell.shape)
    return LinearOperator(mv=ell.matvec, rmv=ell.rmatvec,
                          shape=ell.shape)


def _pick_sparse_kkt(G_sp, dims, A, P_sp, dtype, method="auto"):
    """Pattern-routed sparse kktsolver: banded when RCM can band the
    Gram pattern (O(n kd^2)), tile-map blocksparse otherwise
    (arrow/grid-fill patterns) — mirrors spsolve.symbolic's routing.
    `method` forwards to the banded factor ('scan'/'blocked'/'auto';
    pass explicitly when jax.default_device overrides the backend —
    jax.default_backend() does not see that override)."""
    Gpat = sp.csr_matrix(
        (np.ones_like(sp.csr_matrix(G_sp).data),
         sp.csr_matrix(G_sp).indices, sp.csr_matrix(G_sp).indptr),
        shape=G_sp.shape)
    Spat = Gpat.T @ Gpat
    if P_sp is not None:
        Spat = Spat + sp.csr_matrix(P_sp)
    n = Spat.shape[0]
    perm = rcm_order(Spat != 0)
    kd = band_width_of(Spat != 0, perm)
    if (kd + 1) * 4 < n:
        return kkt_chol2_banded(G_sp, dims, A=A, P_sp=P_sp,
                                dtype=dtype, method=method)
    from cvxopt_tpu.ops.blocksparse import kkt_chol2_blocksparse
    return kkt_chol2_blocksparse(G_sp, dims, A=A, P_sp=P_sp,
                                 dtype=dtype)


def lp_sparse(c, G_sp, h, A=None, b=None, options=None,
              method="auto"):
    """Solve a (large) sparse 'l'-cone LP end to end without
    densifying G: operator-form G (ELL matvecs) + the pattern-routed
    fixed-pattern kktsolver (banded or tile-map).  The sparse analogue
    of solvers.lp(..., solver=None) for problems where dense G would
    not fit (reference counterpart: conelp via CHOLMOD kkt_chol2)."""
    from cvxopt_tpu import solvers
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G_sp = sp.csr_matrix(G_sp)
    m, n = G_sp.shape
    from cvxopt_tpu.cones import ConeDims
    dims = ConeDims(l=m)
    kkt = _pick_sparse_kkt(G_sp, dims, A, None, dtype, method=method)
    Gop = _as_ops(G_sp, dtype)
    return solvers.conelp(jnp.asarray(c, dtype), Gop,
                          jnp.asarray(h, dtype), dims=dims,
                          A=(None if A is None else
                             jnp.asarray(A, dtype)),
                          b=(None if b is None else
                             jnp.asarray(b, dtype)),
                          kktsolver=kkt, options=options)


def qp_sparse(P_sp, q, G_sp, h, A=None, b=None, options=None):
    """Sparse-QP analogue of lp_sparse (coneqp + pattern-routed
    kktsolver; P enters the symbolic pattern)."""
    from cvxopt_tpu import solvers
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G_sp = sp.csr_matrix(G_sp)
    P_sp = sp.csr_matrix(P_sp)
    from cvxopt_tpu.cones import ConeDims
    dims = ConeDims(l=G_sp.shape[0])
    kkt = _pick_sparse_kkt(G_sp, dims, A, P_sp, dtype)
    Gop = _as_ops(G_sp, dtype)
    Pop = _as_ops(P_sp, dtype)
    return solvers.coneqp(Pop, jnp.asarray(q, dtype), Gop,
                          jnp.asarray(h, dtype), dims=dims,
                          A=(None if A is None else
                             jnp.asarray(A, dtype)),
                          b=(None if b is None else
                             jnp.asarray(b, dtype)),
                          kktsolver=kkt, options=options)
